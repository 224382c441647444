"""ResNet + DCN-deconv stereo backbone ('resdcn' family).

Re-design of the reference's alternative stereo backbone
(/root/reference/src/lib/models/networks/stereo_resnet_dcn.py): a standard
ResNet trunk to 1/32, three upsampling stages of (deformable 3x3 conv ->
BN -> ReLU -> bilinear-initialised transpose conv -> BN -> ReLU) with
filters (256, 128, 64) back to 1/4 (:210-247), and CenterNet heads where
the keypoint heads read left features only and the rest read the stereo
concat (:275-283).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .dla import (BN_EPS, BN_MOMENTUM, BilinearUp, ConvBN, DeformBlock,
                  conv_init)
from .stereo_net import _bias_const

RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class ResBasic(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype)(
            out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype)(x, train)
        return nn.relu(out + residual)


class ResBottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.features, 1, dtype=self.dtype)(x, train)
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(
            out, train)
        out = ConvBN(self.features * 4, 1, relu=False, dtype=self.dtype)(
            out, train)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            residual = ConvBN(self.features * 4, 1, self.stride, relu=False,
                              dtype=self.dtype)(x, train)
        return nn.relu(out + residual)


class ResNetTrunk(nn.Module):
    num_layers: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, blocks = RESNET_SPEC[self.num_layers]
        Block = ResBasic if kind == "basic" else ResBottleneck
        x = ConvBN(64, 7, 2, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, (feat, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = Block(feat, stride, dtype=self.dtype)(x, train)
        return x


class DeconvStage(nn.Module):
    """DCN 3x3 + BN + ReLU + bilinear-init transpose conv x2 + BN + ReLU
    (stereo_resnet_dcn.py:216-247)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DeformBlock(self.features, dtype=self.dtype)(x, train)
        x = BilinearUp(2, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class StereoResNet(nn.Module):
    heads: Dict[str, int]
    num_layers: int = 18
    head_conv: int = 64
    dtype: Any = jnp.float32

    LEFT_ONLY = ("bored_offset", "kept_offset", "kept_type")

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 use_cost_volume: bool = False, target=None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        left = batch["input"].astype(self.dtype)
        right = batch["input_right"].astype(self.dtype)
        B = left.shape[0]
        both = jnp.concatenate([left, right], axis=0)

        trunk = ResNetTrunk(self.num_layers, dtype=self.dtype, name="trunk")
        x = trunk(both, train)
        for feat in (256, 128, 64):
            x = DeconvStage(feat, dtype=self.dtype)(x, train)

        f_left, f_right = x[:B], x[B:]
        f_stereo = jnp.concatenate([f_left, f_right], axis=-1)

        out = {}
        for name, ch in self.heads.items():
            src = f_left if name in self.LEFT_ONLY else f_stereo
            y = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=True,
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f"{name}_conv")(src)
            y = nn.relu(y)
            bias = _bias_const(-2.19) if name == "hm" \
                else nn.initializers.zeros
            out[name] = nn.Conv(ch, (1, 1), use_bias=True,
                                kernel_init=conv_init, bias_init=bias,
                                dtype=self.dtype,
                                name=f"{name}_out")(y).astype(jnp.float32)
        return out
