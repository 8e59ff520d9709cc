"""Small numeric + setup helpers shared across the framework."""
from __future__ import annotations

import os
import random

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Clamped logit; identical to the reference (utils/utils.py:61-74)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def logits_to_scores(logits: jnp.ndarray) -> jnp.ndarray:
    """Class scores are plain sigmoids (reference: models/utils.py:171-172)."""
    return jax.nn.sigmoid(logits)


def pos_to_pos_embed(pos: jnp.ndarray, num_pos_feats: int = 64,
                     temperature: float = 10000.0,
                     scale: float = 2 * np.pi) -> jnp.ndarray:
    """Sine/cosine embedding of (normalized) coordinates.

    pos: (..., M) -> (..., M * num_pos_feats), matching the interleaved
    sin/cos layout of the reference (models/utils.py:78-85): for each input
    coordinate, feature ``2i`` is ``sin(pos / T^(2i/F))`` and feature ``2i+1``
    is ``cos(pos / T^(2i/F))``.
    """
    pos = pos * scale
    dim_i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_i = temperature ** (2.0 * jnp.floor(dim_i / 2.0) / num_pos_feats)
    pe = pos[..., None] / dim_i                       # (..., M, F)
    pe = jnp.stack([jnp.sin(pe[..., 0::2]), jnp.cos(pe[..., 1::2])], axis=-1)
    return pe.reshape(*pe.shape[:-3], -1)             # flatten last 3 dims


def set_seed(seed: int, rank: int = 0) -> int:
    """Rank-offset host-side seeding (reference: utils/utils.py:37-49).

    JAX device RNG is handled explicitly via jax.random keys; this seeds the
    host-side generators used by the data pipeline."""
    seed = seed + rank
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
