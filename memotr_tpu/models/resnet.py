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


class ResNet50(nn.Module):
    """Returns (layer2, layer3, layer4) NHWC features, strides (8, 16, 32)."""
    dtype: Dtype = jnp.float32
    strides: Sequence[int] = (8, 16, 32)
    num_channels: Sequence[int] = (512, 1024, 2048)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
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
