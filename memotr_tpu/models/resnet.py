"""ResNet-50 backbone with frozen BatchNorm, in Flax (NHWC).

Capability-equivalent of the reference backbone
(``/root/reference/models/backbone.py:55-98``): torchvision-style ResNet-50
(v1.5 — stride on the 3x3 conv of each bottleneck) returning layer2/3/4
feature maps at strides 8/16/32.  BatchNorm statistics and affine parameters
are *frozen* (``FrozenBatchNorm2d``, backbone.py:16-52): they live in a
separate ``frozen`` variable collection that the optimizer never touches, and
the layer is a pure per-channel affine — which XLA folds into the surrounding
convolutions.

Weights come from the PyTorch->JAX converter
(``memotr_tpu/checkpoint/torch_convert.py``); there is no torchvision in this
environment, so training from scratch uses He-init + (optionally) trainable
GroupNorm instead — but the default matches the reference exactly.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Per-channel affine with frozen statistics (backbone.py:16-52)."""
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.variable("frozen", "weight",
                               lambda: jnp.ones((self.features,), jnp.float32))
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        mean = self.variable("frozen", "running_mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("frozen", "running_var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        scale = weight.value * jax.lax.rsqrt(var.value + self.eps)
        shift = bias.value - mean.value * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with residual; expansion 4 (torchvision v1.5)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Conv1Stem(nn.Module):
    """The ResNet stem conv (7x7, stride 2, pad 3, no bias) computed via
    space-to-depth: the input is rearranged into 2x2 blocks ((B, H, W, 3) ->
    (B, H/2, W/2, 12)) and the 7x7 stride-2 kernel is scattered into an
    equivalent 4x4 stride-1 kernel over the 12 phase-channels — the MLPerf
    TPU ResNet trick.  Bit-equivalent taps, identical parameter tree to
    ``nn.Conv(64, (7,7), name="conv1")`` so checkpoints and the torch
    converter are unchanged.

    Measured on v5e at 800x1536 this is ~0.6 ms SLOWER than the plain conv
    (4.86 vs 4.29 ms whole-backbone; PERF_NOTES.md) — XLA:TPU's conv
    emitter already space-to-depth-transforms low-channel stems internally,
    and the manual rearrange only adds reshape traffic.  Kept as a tested,
    exact option (``ResNet50(s2d_stem=True)``) and a recorded negative
    result; default off.
    """
    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features), jnp.float32)
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # gather w[a, b] into (ku, kv, phase): tap offset d = a - 3 lands at
        # phase p = d mod 2, block offset (d - p)/2 in {-2..1}; the one
        # (ku, p) combo with no tap (d = -4) reads a zero pad row (index 7)
        import numpy as np
        idx = np.full((4, 2), 7)
        for a in range(7):
            d = a - 3
            idx[(d - d % 2) // 2 + 2, d % 2] = a
        kpad = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = kpad[idx[:, :, None, None], idx[None, None]]  # (ku,p,kv,q,c,F)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c, self.features).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            y.astype(self.dtype), k4, window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet50(nn.Module):
    """Returns (layer2, layer3, layer4) NHWC features, strides (8, 16, 32)."""
    dtype: Dtype = jnp.float32
    strides: Sequence[int] = (8, 16, 32)
    num_channels: Sequence[int] = (512, 1024, 2048)
    s2d_stem: bool = False  # space-to-depth stem (exact but slower on v5e
    #                         — XLA already transforms the stem; Conv1Stem)

    @nn.compact
    def __call__(self, x):
        if self.s2d_stem:
            x = Conv1Stem(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def stage(x, planes, blocks, stride, name):
            x = Bottleneck(planes, stride=stride, downsample=True,
                           dtype=self.dtype, name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = Bottleneck(planes, dtype=self.dtype, name=f"{name}_{i}")(x)
            return x

        x = stage(x, 64, 3, 1, "layer1")
        c3 = stage(x, 128, 4, 2, "layer2")
        c4 = stage(c3, 256, 6, 2, "layer3")
        c5 = stage(c4, 512, 3, 2, "layer4")
        return c3, c4, c5
