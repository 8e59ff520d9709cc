"""Shared building-block layers.

Flax counterparts of the reference's small blocks with identical math:
``MLP`` (models/mlp.py), the residual+LayerNorm ``FFN`` (models/ffn.py), and a
torch-``nn.MultiheadAttention``-compatible attention layer.  LayerNorm eps is
1e-5 everywhere to match torch defaults.  All matmuls run in the module's
``dtype`` (bfloat16 by default) with float32 parameters and float32 LayerNorm.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MLP(nn.Module):
    """Linear stack with ReLU between layers, none after the last
    (reference: models/mlp.py)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class FFN(nn.Module):
    """Self-contained residual FFN block: linear-relu-dropout-linear +
    residual + LayerNorm (reference: models/ffn.py)."""
    d_ffn: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = x.shape[-1]
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)


class MultiheadAttention(nn.Module):
    """Dot-product attention with torch ``nn.MultiheadAttention`` semantics.

    - separate q/k/v Dense projections named q_proj/k_proj/v_proj (torch's
      joint in_proj is split on checkpoint conversion,
      checkpoint/torch_convert.py),
    - ``key_padding_mask`` True = ignore that key,
    - output projection, scaling by ``1/sqrt(head_dim)``.

    Used for decoder self-attention (deformable_decoder.py:200-205) and the
    query updater's memory attention (query_updater.py:45).

    TWIN CONTRACT: ``windowed_encoder._AttnParams`` declares a byte-exact
    twin of this module's param tree (four Dense projections with the
    names above) for the fused window-attention kernel.  Any change to the
    projection structure here must be mirrored there — cross-checked by
    tests/test_window_attn.py checkpoint-compat parity.
    """
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 attn_mask: Optional[jnp.ndarray] = None,
                 attn_bias: Optional[jnp.ndarray] = None):
        d_model = q.shape[-1]
        assert d_model % self.num_heads == 0
        head_dim = d_model // self.num_heads

        q_p = nn.Dense(d_model, dtype=self.dtype, name="q_proj")(q)
        k_p = nn.Dense(d_model, dtype=self.dtype, name="k_proj")(k)
        v_p = nn.Dense(d_model, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q_p), split(k_p), split(v_p)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(head_dim, jnp.float32)).astype(qh.dtype)
        if attn_bias is not None:
            # additive per-head bias (H, Lq, Lk), broadcast over batch —
            # e.g. the windowed encoder's relative position bias
            logits = logits + attn_bias[None].astype(logits.dtype)
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        if attn_mask is not None:
            # boolean (B, Lq, Lk) or (Lq, Lk), True = disallow this pair
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None]
            logits = jnp.where(attn_mask[:, None, :, :], neg, logits)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(d_model, dtype=self.dtype, name="out_proj")(out)
