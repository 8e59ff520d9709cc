"""Padded image batches — the fixed-shape replacement for NestedTensor.

The reference pads each batch to the max H,W rounded up to a multiple of 32
and tracks validity with boolean masks (True = padding), see
``/root/reference/utils/nested_tensor.py:41-59``.  We keep the same mask
convention but round the padded extent up to *size buckets* so that XLA
compiles a small, bounded set of step functions instead of one per image
shape.  Images are NHWC (TPU-friendly), float32/bfloat16, already normalized.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PaddedFrames:
    images: jnp.ndarray   # (B, H, W, 3)
    mask: jnp.ndarray     # (B, H, W) bool, True = padding (reference convention)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_hw(h: int, w: int, multiple: int = 128) -> tuple[int, int]:
    """Round (h, w) up to a bucket. ``multiple`` trades recompiles for padding
    waste; 128 keeps at most a handful of buckets per training run while the
    streaming-eval path always lands in one fixed bucket (800/1536 resize)."""
    return round_up(h, multiple), round_up(w, multiple)


def pad_images_to_frames(images: Sequence[np.ndarray],
                         bucket_multiple: int = 128,
                         dtype=np.float32) -> PaddedFrames:
    """Pad a list of HWC numpy images to a common bucketed shape.

    Host-side (numpy) so it can run in data-loader workers; the device only
    ever sees fixed shapes.  Equivalent role to
    ``tensor_list_to_nested_tensor`` (nested_tensor.py:41-59).
    """
    hs = [im.shape[0] for im in images]
    ws = [im.shape[1] for im in images]
    H, W = bucket_hw(max(hs), max(ws), bucket_multiple)
    b = len(images)
    out = np.zeros((b, H, W, 3), dtype=dtype)
    mask = np.ones((b, H, W), dtype=bool)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        out[i, :h, :w] = im
        mask[i, :h, :w] = False
    return PaddedFrames(images=jnp.asarray(out), mask=jnp.asarray(mask))
