"""TPU-native encoder: windowed dense attention + cross-level fusion.

The reference encoder is multi-scale deformable self-attention — per-token
random-access gathers that have no efficient exact TPU mapping (PERF_NOTES.md:
~54 ms/layer at 800x1536 against <5 ms for dense window attention).  This
module is the TPU-first alternative for from-scratch training: same
inputs/outputs as the deformable ``Encoder`` so the rest of the model is
unchanged, but the computation is MXU-shaped:

- per level: non-overlapping WxW window self-attention (Swin-style), with the
  window grid shifted by W/2 on alternating layers so information crosses
  window boundaries,
- per layer: top-down cross-level fusion (coarser level upsampled, 1x1-mixed
  and added) so every level sees the global context that deformable
  attention's cross-level sampling provided,
- the shared FFN, residuals and norms mirror the deformable encoder layer.

This changes the architecture (it is NOT checkpoint-compatible with the
reference); select it with ``ENCODER_TYPE: windowed``.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import MultiheadAttention


def _window_partition(x: jnp.ndarray, mask: jnp.ndarray, win: int,
                      shift: int):
    """(B, H, W, C) -> (B*nW, win*win, C) with a key-padding mask.

    Pads H/W up to multiples of ``win`` (padding tokens masked) and applies a
    cyclic shift for shifted-window layers."""
    b, h, w, c = x.shape
    ph = (-h) % win
    pw = (-w) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    m = jnp.pad(mask, ((0, 0), (0, ph), (0, pw)), constant_values=True)
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        m = jnp.roll(m, (-shift, -shift), axis=(1, 2))
    hh, ww = x.shape[1], x.shape[2]
    x = x.reshape(b, hh // win, win, ww // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
    m = m.reshape(b, hh // win, win, ww // win, win)
    m = m.transpose(0, 1, 3, 2, 4).reshape(-1, win * win)
    return x, m, (hh, ww)


def _shift_window_disallow(hh: int, ww: int, win: int, shift: int
                           ) -> np.ndarray:
    """Swin-style cross-boundary mask for shifted windows.

    After the cyclic roll by ``-shift``, the edge windows mix tokens that came
    from opposite image borders; those pairs must not attend (Swin's
    ``img_mask`` trick).  In rolled-frame coordinates each axis splits into
    three bands — [0, n-win), [n-win, n-shift), [n-shift, n) — and two rolled
    positions are spatially contiguous iff their band ids match on both axes.

    Returns a static (nW, win*win, win*win) bool array, True = disallow.
    """
    def bands(n: int) -> np.ndarray:
        c = np.arange(n)
        return np.where(c < n - win, 0, np.where(c < n - shift, 1, 2))

    ids = bands(hh)[:, None] * 3 + bands(ww)[None, :]          # (hh, ww)
    ids = ids.reshape(hh // win, win, ww // win, win)
    ids = ids.transpose(0, 2, 1, 3).reshape(-1, win * win)     # (nW, win^2)
    return ids[:, :, None] != ids[:, None, :]


def _window_merge(xw: jnp.ndarray, hw_pad: Tuple[int, int], b: int, h: int,
                  w: int, win: int, shift: int) -> jnp.ndarray:
    hh, ww = hw_pad
    c = xw.shape[-1]
    x = xw.reshape(b, hh // win, ww // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x[:, :h, :w]


class WindowedEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_heads: int
    window: int = 8
    shifted: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray], masks: List[jnp.ndarray],
                 poss: List[jnp.ndarray], deterministic: bool = True):
        """levels: per-level (B, H_l, W_l, C); masks: (B, H_l, W_l) True=pad."""
        attn = MultiheadAttention(self.n_heads, self.dropout,
                                  dtype=self.dtype, name="win_attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        lin1 = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        fuse = nn.Dense(self.d_model, dtype=self.dtype, name="topdown_mix")

        out = []
        shift = self.window // 2 if self.shifted else 0
        for x, m, pos in zip(levels, masks, poss):
            b, h, w, _ = x.shape
            q = x + pos.astype(x.dtype)
            qw, mw, hw_pad = _window_partition(q, m, self.window, shift)
            xw, _, _ = _window_partition(x, m, self.window, shift)
            # disallow = padded keys, plus (on shifted layers) Swin-style
            # cross-boundary pairs wrapped together by the cyclic roll
            disallow = jnp.broadcast_to(mw[:, None, :],
                                        (mw.shape[0],) + (mw.shape[1],) * 2)
            if shift:
                region = jnp.asarray(_shift_window_disallow(
                    hw_pad[0], hw_pad[1], self.window, shift))
                disallow = disallow | jnp.tile(region, (b, 1, 1))
            # rows with no allowed key (padding queries; outputs never read)
            # would NaN the softmax — open one dummy key for them
            dead_row = jnp.all(disallow, axis=2, keepdims=True)
            disallow = disallow & ~dead_row
            aw = attn(qw, qw, xw, attn_mask=disallow,
                      deterministic=deterministic)
            y = _window_merge(aw, hw_pad, b, h, w, self.window, shift)
            x = norm1(x + nn.Dropout(self.dropout,
                                     deterministic=deterministic)(y))
            f = lin2(nn.Dropout(self.dropout, deterministic=deterministic)(
                nn.relu(lin1(x))))
            x = norm2(x + nn.Dropout(self.dropout,
                                     deterministic=deterministic)(f))
            out.append(x)

        # top-down cross-level fusion: level l += mix(upsample(level l+1))
        fused = list(out)
        for i in range(len(fused) - 2, -1, -1):
            up = jax.image.resize(fused[i + 1],
                                  fused[i].shape[:1] + fused[i].shape[1:3]
                                  + fused[i + 1].shape[-1:], method="nearest")
            fused[i] = fused[i] + fuse(up.astype(self.dtype))
        return fused


class WindowedEncoder(nn.Module):
    """Drop-in replacement for the deformable ``Encoder`` (same signature)."""
    num_layers: int
    d_model: int
    d_ffn: int
    n_heads: int
    window: int = 8
    dropout: float = 0.0
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos, padding_mask,
                 deterministic: bool = True):
        del valid_ratios
        b = src.shape[0]
        c = src.shape[-1]
        # un-flatten into per-level maps
        levels, masks, poss = [], [], []
        start = 0
        for (h, w) in spatial_shapes:
            sl = slice(start, start + h * w)
            levels.append(src[:, sl].reshape(b, h, w, c))
            masks.append(padding_mask[:, sl].reshape(b, h, w))
            poss.append(pos[:, sl].reshape(b, h, w, c))
            start += h * w

        layer_cls = WindowedEncoderLayer
        if self.use_checkpoint:
            layer_cls = nn.remat(WindowedEncoderLayer, static_argnums=(4,))
        for i in range(self.num_layers):
            levels = layer_cls(self.d_model, self.d_ffn, self.n_heads,
                               self.window, shifted=(i % 2 == 1),
                               dropout=self.dropout, dtype=self.dtype,
                               name=f"layer_{i}")(
                levels, masks, poss, deterministic)
        return jnp.concatenate(
            [lv.reshape(b, -1, c) for lv in levels], axis=1)
