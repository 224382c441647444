"""SIDE's flagship stereo network, TPU-native.

Architecture per the reference's active model
(/root/reference/src/lib/models/networks/stereo_network_old.py:261-396):
a shared DLA-34 feature extractor runs on the left and right image, the
`kept_type` head reads left features only through a deep 256-channel conv
stack, every other head reads the channel-concatenated stereo features, and
an object-conditioned cost volume regresses per-instance depth.

TPU-first re-design:
* both views go through the backbone as ONE batch of 2B images (the
  reference calls it twice, :340-341) — bigger MXU batches, one set of BN
  stats;
* RoIs come from fixed-K decode / GT slots with a validity mask instead of
  dynamic boolean compaction;
* the 16-iteration RoIAlign loop and per-image Python scatter
  (:365-383) are a single batched gather program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import decode as dec
from .cost_volume import CostVolumeNet, build_cost_volume, proposal_shift
from .dla import (BN_EPS, BN_MOMENTUM, FeatureExtractor,
                  FoldedBatchNorm, conv_init)


def _bias_const(v):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, v, dtype)
    return init


class Head(nn.Module):
    """Output head (stereo_network_old.py:283-313): the left-only deep stack
    (5 x conv3x3-256) or the stereo shallow stack (conv3x3-256 + 1x1)."""
    out: int
    deep: bool = False
    hm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_mid = 5 if self.deep else 1
        for i in range(n_mid):
            x = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype)(x)
            x = nn.relu(x)
        bias_init = _bias_const(-2.19) if self.hm else nn.initializers.zeros
        x = nn.Conv(self.out, (1, 1), use_bias=True, kernel_init=conv_init,
                    bias_init=bias_init, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class StereoNet(nn.Module):
    """heads: dict name -> channels; K: fixed RoI slots per image."""
    heads: Dict[str, int]
    roi_size: int = 16
    max_objs: int = 50
    topk: int = 100
    down_ratio: int = 4
    input_w: int = 1280
    wh_scale: float = 1.0
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialise the backbone to trade FLOPs for HBM
    # inference-only cap on cost-volume proposals: decode emits slots in
    # DESCENDING score order and post-processing keeps only rows above
    # peak_thresh (0.2 — rarely more than ~10/frame on KITTI), so running
    # the 3D-CNN on the top cv_topk slots and falling back to disparity
    # depth for the tail changes nothing unless >cv_topk detections
    # survive the threshold.  0 = all topk slots (exact reference parity).
    # ~3x cheaper cost-volume segment at K=100 (tools/cv_bench.py).
    cv_topk: int = 32

    LEFT_ONLY = ("kept_type",)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 use_cost_volume: bool = True,
                 target: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        left = batch["input"].astype(self.dtype)
        right = batch["input_right"].astype(self.dtype)
        B = left.shape[0]

        # one backbone pass over both views (2B batch)
        both = jnp.concatenate([left, right], axis=0)
        fe_cls = nn.remat(FeatureExtractor, static_argnums=(2,)) \
            if self.remat else FeatureExtractor
        feats = fe_cls(down_ratio=self.down_ratio, dtype=self.dtype,
                       name="feature_extraction")(both, train)
        f_left, f_right = feats[:B], feats[B:]
        f_stereo = jnp.concatenate([f_left, f_right], axis=-1)

        out: Dict[str, jnp.ndarray] = {}
        for name, ch in self.heads.items():
            deep = name in self.LEFT_ONLY
            src = f_left if deep else f_stereo
            out[name] = Head(ch, deep=deep, hm=(name == "hm"),
                             dtype=self.dtype, name=name)(src)

        if use_cost_volume:
            feat_w = self.input_w // self.down_ratio

            # 1x1 reduce to 32 channels (stereo_network_old.py:273-277)
            def reduce(x):
                y = nn.Conv(32, (1, 1), use_bias=False,
                            kernel_init=conv_init, dtype=self.dtype,
                            name="feaReduce")(x)
                y = FoldedBatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="feaReduce_bn")(y)
                return nn.relu(y)

            red = reduce(feats)
            red_left, red_right = red[:B], red[B:]

            if target is not None:
                bbox, bbox_right, valid = target
                kcv = bbox.shape[1]            # train: all GT slots
            else:
                bbox, bbox_right, valid = dec.bbox_decode(
                    out["hm"], out["wh"] * self.wh_scale, out["reg"],
                    K=self.topk)
                kcv = (min(self.cv_topk, self.topk) if self.cv_topk > 0
                       else self.topk)

            K = bbox.shape[1]
            rois_l, rois_r, depth_bin = proposal_shift(
                bbox[:, :kcv], bbox_right[:, :kcv],
                batch["fb"].reshape(B), self.roi_size, feat_w)
            cost = build_cost_volume(red_left, red_right, rois_l, rois_r,
                                     self.roi_size)
            disp, logits = CostVolumeNet(32, dtype=self.dtype,
                                         name="depth_estimator")(
                cost, depth_bin.reshape(B * kcv, self.roi_size), train)
            depth_cv = disp.reshape(B, kcv, 1)
            if kcv < K:
                # disparity fallback for the low-score tail (these rows
                # are discarded above peak_thresh anyway; see cv_topk)
                cl = (bbox[..., 0] + bbox[..., 2]) / 2
                cr = (bbox_right[..., 0] + bbox_right[..., 2]) / 2
                disp_full = (cl - cr) * self.down_ratio
                d_disp = batch["fb"].reshape(B, 1) / jnp.where(
                    jnp.abs(disp_full) < 1e-3, 1e-3, disp_full)
                depth = jnp.concatenate(
                    [depth_cv, d_disp[:, kcv:, None]], axis=1)
            else:
                depth = depth_cv
            # invalid slots report depth 0 (reference zero-fills, :363)
            depth = depth * valid[..., None].astype(depth.dtype)
            out["depth"] = depth
            # depth-bin distribution for the auxiliary soft-target CE
            # (training only; see ops/losses.depth_bin_ce)
            out["depth_logits"] = logits.reshape(B, kcv, self.roi_size)
            out["depth_bin"] = depth_bin

        return out


def init_stereo_net(model, rng, input_h: int, input_w: int,
                    max_objs: int = 50):
    """Initialise variables with a minimal fake batch (works for both the
    cost-volume and the voxel depth variants)."""
    B = 1
    p2 = jnp.asarray([[[700.0, 0, input_w / 2, 40.0],
                       [0, 700.0, input_h / 2, 0.0],
                       [0, 0, 1, 0]]], jnp.float32)
    p3 = p2.at[:, 0, 3].add(-380.0)
    batch = {
        "input": jnp.zeros((B, input_h, input_w, 3), jnp.float32),
        "input_right": jnp.zeros((B, input_h, input_w, 3), jnp.float32),
        "fb": jnp.full((B,), 380.0, jnp.float32),
        "p2": p2, "p3": p3,
        "trans": jnp.tile(jnp.asarray([[[0.25, 0, 0], [0, 0.25, 0]]],
                                      jnp.float32), (B, 1, 1)),
        "trans_inv": jnp.tile(jnp.asarray([[[4.0, 0, 0], [0, 4.0, 0]]],
                                          jnp.float32), (B, 1, 1)),
    }
    K = max_objs
    target = (jnp.zeros((B, K, 4)), jnp.zeros((B, K, 4)),
              jnp.zeros((B, K), bool))
    return model.init(rng, batch, use_cost_volume=True, target=target,
                      train=False)
