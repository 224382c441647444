"""Monocular legacy CenterNet backbones ('res' and 'dlav0' families).

Parity with the reference factory entries
(/root/reference/src/lib/models/model.py:16-21): `msra_resnet.py` (ResNet +
plain bilinear-init deconv stages) and `dlav0.py` (vanilla DLA with a
convolutional upsampling pyramid).  Both are SINGLE-IMAGE pose nets — in the
reference they are incompatible with the stereo trainer's batch-dict call
(SURVEY.md §2 item 14) and kept only for factory completeness; same here.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from .dla import DLA, BilinearUp, BN_EPS, BN_MOMENTUM, ConvBN, conv_init
from .resnet_dcn import ResNetTrunk
from .stereo_net import _bias_const


class _Heads(nn.Module):
    heads: Dict[str, int]
    head_conv: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = {}
        for name, ch in self.heads.items():
            y = x
            if self.head_conv > 0:
                y = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=True,
                            kernel_init=conv_init, dtype=self.dtype,
                            name=f"{name}_conv")(y)
                y = nn.relu(y)
            bias = _bias_const(-2.19) if name == "hm" \
                else nn.initializers.zeros
            out[name] = nn.Conv(ch, (1, 1), use_bias=True,
                                kernel_init=conv_init, bias_init=bias,
                                dtype=self.dtype,
                                name=f"{name}_out")(y).astype(jnp.float32)
        return out


class MonoResNet(nn.Module):
    """msra_resnet analogue: ResNet trunk + 3 plain deconv stages."""
    heads: Dict[str, int]
    num_layers: int = 18
    head_conv: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ResNetTrunk(self.num_layers, dtype=self.dtype, name="trunk")(
            x, train)
        for feat in (256, 256, 256):
            x = ConvBN(feat, 3, 1, dtype=self.dtype)(x, train)
            x = BilinearUp(2, dtype=self.dtype)(x)
        return _Heads(self.heads, self.head_conv, dtype=self.dtype)(x)


class MonoDLA(nn.Module):
    """dlav0 analogue: DLA-34 trunk + convolutional upsampling pyramid down
    to 1/4 resolution."""
    heads: Dict[str, int]
    head_conv: int = 256
    down_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import numpy as np
        x = x.astype(self.dtype)
        feats = DLA(dtype=self.dtype, name="base")(x, train)
        first = int(np.log2(self.down_ratio))
        # iterative refine: project each coarser level to 64ch, upsample,
        # fuse with the next finer level
        y = ConvBN(64, 1, dtype=self.dtype)(feats[-1], train)
        for lvl in range(len(feats) - 2, first - 1, -1):
            y = BilinearUp(2, dtype=self.dtype)(y)
            skip = ConvBN(64, 1, dtype=self.dtype)(feats[lvl], train)
            y = ConvBN(64, 3, dtype=self.dtype)(y + skip, train)
        return _Heads(self.heads, self.head_conv, dtype=self.dtype)(y)
