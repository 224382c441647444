"""DLASeg-style stereo model: heads directly on the aggregated DLA features
with no cost volume (reference: /root/reference/src/lib/models/networks/
stereo_dla_dcn.py:427-498 — an alternative kept out of the reference's
factory, model.py:12).  `hm` and `kept_type` read left features only; all
other heads read the stereo channel-concat."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from .dla import FeatureExtractor
from .stereo_net import Head


class StereoDLASeg(nn.Module):
    heads: Dict[str, int]
    down_ratio: int = 4
    dtype: Any = jnp.float32

    LEFT_ONLY = ("hm", "kept_type")

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 use_cost_volume: bool = False, target=None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        left = batch["input"].astype(self.dtype)
        right = batch["input_right"].astype(self.dtype)
        B = left.shape[0]
        both = jnp.concatenate([left, right], axis=0)
        feats = FeatureExtractor(down_ratio=self.down_ratio,
                                 dtype=self.dtype,
                                 name="feature_extraction")(both, train)
        f_left, f_right = feats[:B], feats[B:]
        f_stereo = jnp.concatenate([f_left, f_right], axis=-1)

        out = {}
        for name, ch in self.heads.items():
            left_only = name in self.LEFT_ONLY
            out[name] = Head(ch, deep=(name == "kept_type"),
                             hm=(name == "hm"), dtype=self.dtype,
                             name=name)(f_left if left_only else f_stereo)
        return out
