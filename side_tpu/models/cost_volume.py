"""Object-conditioned stereo cost volume and instance-depth estimator.

TPU re-design of the reference's cost-volume path
(/root/reference/src/lib/models/networks/stereo_network_old.py:34-244):

* `proposal_shift` (reference get_proposal_shift, :34-133): builds D=16
  depth hypotheses per object from a box-size prior, converts each to a
  disparity shift of the left/right RoIs.  The reference loops over images
  and depth bins in Python with host round-trips; here everything is one
  (B, K, D) tensor program.
* `build_cost_volume`: RoIAligns both views for all B*K*D shifted RoIs at
  once (reference loops RoIAlign 16x, :371-376) and stacks
  (left, right, left-right) into a (N, D, R, R, 96) NDHWC volume.
* `CostVolumeNet` (reference cost_volume, :135-244): stereo-correlation
  gate, 3D convs, structure-aware 2D attention over the height-collapsed
  volume, classification + soft-argmin expectation over the depth bins.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.roi_align import pool_interp_matrix, roi_align
from .dla import BN_EPS, BN_MOMENTUM, FoldedBatchNorm, msra_init

DEPTH_MAX = 87.0


def proposal_shift(bbox: jnp.ndarray, bbox_right: jnp.ndarray,
                   fb: jnp.ndarray, num_bins: int, feat_w: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Depth-hypothesis RoI shifts (stereo_network_old.py:34-133), batched.

    bbox, bbox_right: (B, K, 4) at feature resolution; fb: (B,).
    Returns (rois_left, rois_right, depth_bin):
        rois_*   (B, K, D, 4)
        depth_bin(B, K, D) metric depth per hypothesis (descending from 87m)
    """
    B, K, _ = bbox.shape
    D = num_bins
    rate = jnp.arange(D, dtype=jnp.float32) / (D - 1)          # (D,)

    xmin = jnp.minimum(bbox[..., 0], bbox_right[..., 0])
    ymin = jnp.minimum(bbox[..., 1], bbox_right[..., 1])
    xmax = jnp.maximum(bbox[..., 2], bbox_right[..., 2])
    ymax = jnp.maximum(bbox[..., 3], bbox_right[..., 3])

    width = jnp.maximum(xmax - xmin, 1e-3)
    depth_min = jnp.clip(fb[:, None] / (width * 0.9 * 4.0), 1.0, DEPTH_MAX)
    depth_bin = DEPTH_MAX - (DEPTH_MAX - depth_min[..., None]) * rate  # (B,K,D)
    disp_bin = fb[:, None, None] / depth_bin / 8.0

    xmin_l = jnp.minimum(xmin[..., None] + disp_bin, feat_w - 1.0)
    xmax_l = jnp.minimum(xmax[..., None] + disp_bin, feat_w - 1.0)
    xmin_r = jnp.maximum(xmin[..., None] - disp_bin, 0.0)
    xmax_r = jnp.maximum(xmax[..., None] - disp_bin, 0.0)

    ymin_d = jnp.broadcast_to(ymin[..., None], (B, K, D))
    ymax_d = jnp.broadcast_to(ymax[..., None], (B, K, D))
    rois_left = jnp.stack([xmin_l, ymin_d, xmax_l, ymax_d], axis=-1)
    rois_right = jnp.stack([xmin_r, ymin_d, xmax_r, ymax_d], axis=-1)
    return rois_left, rois_right, depth_bin


def build_cost_volume(feat_left: jnp.ndarray, feat_right: jnp.ndarray,
                      rois_left: jnp.ndarray, rois_right: jnp.ndarray,
                      roi_size: int) -> jnp.ndarray:
    """RoIAlign both views over all depth hypotheses as MXU matmuls.

    feat_*: (B, H, W, C=32); rois_*: (B, K, D, 4).
    Returns (B*K, D, R, R, 3C) = concat(left, right, left-right).

    TPU-first re-design of the reference's 16x RoIAlign loop
    (stereo_network_old.py:371-376): RoIAlign is linear in the features, so
    each axis of the pooling is a contraction against an interpolation
    matrix (see ops/roi_align.pool_interp_matrix) — zero gathers, all MXU.
    Structure exploited: across the D depth hypotheses only the x extent
    changes (proposal_shift shifts RoIs horizontally by disparity), and the
    left/right RoIs share their y extent, so ONE y-contraction per RoI is
    shared by both views and all D bins; only the (q, w) x-contraction is
    per-bin.
    """
    B, K, D, _ = rois_left.shape
    R = roi_size
    H, W = feat_left.shape[1:3]

    # y extent identical across bins and views by construction
    Wy = pool_interp_matrix(rois_left[:, :, 0, 1], rois_left[:, :, 0, 3],
                            H, R, 2)                          # (B, K, R, H)
    Wxl = pool_interp_matrix(rois_left[..., 0], rois_left[..., 2],
                             W, R, 2)                         # (B, K, D, R, W)
    Wxr = pool_interp_matrix(rois_right[..., 0], rois_right[..., 2],
                             W, R, 2)

    fl = feat_left.astype(jnp.float32)
    fr = feat_right.astype(jnp.float32)
    yl = jnp.einsum("bkph,bhwc->bkpwc", Wy, fl,
                    preferred_element_type=jnp.float32)       # (B, K, R, W, C)
    yr = jnp.einsum("bkph,bhwc->bkpwc", Wy, fr,
                    preferred_element_type=jnp.float32)
    pool_l = jnp.einsum("bkdqw,bkpwc->bkdpqc", Wxl, yl,
                        preferred_element_type=jnp.float32)
    pool_r = jnp.einsum("bkdqw,bkpwc->bkdpqc", Wxr, yr,
                        preferred_element_type=jnp.float32)

    cost = jnp.concatenate([pool_l, pool_r, pool_l - pool_r], axis=-1)
    C3 = cost.shape[-1]
    return cost.reshape(B * K, D, R, R, C3).astype(feat_left.dtype)


def build_cost_volume_gather(feat_left: jnp.ndarray, feat_right: jnp.ndarray,
                             rois_left: jnp.ndarray, rois_right: jnp.ndarray,
                             roi_size: int) -> jnp.ndarray:
    """Gather-based reference implementation (kept for parity tests)."""
    B, K, D, _ = rois_left.shape
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
    R = roi_size

    def per_bin(rois_d):
        rl, rr = rois_d
        pl = roi_align(feat_left, rl.reshape(B * K, 4), batch_idx, R, 1.0, 2)
        pr = roi_align(feat_right, rr.reshape(B * K, 4), batch_idx, R, 1.0, 2)
        return jnp.concatenate([pl, pr, pl - pr], axis=-1)  # (B*K, R, R, 3C)

    # loop over depth bins (lax.map) to bound the RoIAlign working set —
    # D=16 bins of (B*K) rois each instead of one B*K*D gather
    cost = jax.lax.map(per_bin, (rois_left.transpose(2, 0, 1, 3),
                                 rois_right.transpose(2, 0, 1, 3)))
    return cost.transpose(1, 0, 2, 3, 4)  # (B*K, D, R, R, 3C)


class ConvBN3D(nn.Module):
    features: int
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False,
                    kernel_init=msra_init, dtype=self.dtype)(x)
        x = FoldedBatchNorm(use_running_average=not train,
                            dtype=self.dtype, name="BatchNorm_0")(x)
        return nn.relu(x) if self.relu else x


class HourglassVolume(nn.Module):
    """Encoder/decoder 3D-CNN over a cost volume (reference submodule.py
    cost_volume with hg=True, :33-99): two stride-2 3D conv stages and two
    transpose-conv stages with a skip — returns a feature volume (the
    reference feeds it to the commented voxel grid-sample path).

    Volumes are NDHWC."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cost: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(x, name):
            return FoldedBatchNorm(use_running_average=not train,
                                   dtype=self.dtype, name=name)(x)

        c = nn.relu(bn(nn.Conv(64, (3, 3, 3), padding=1, use_bias=False,
                               kernel_init=msra_init, dtype=self.dtype,
                               name="enc0")(cost), "enc0_bn"))
        cost0 = nn.relu(bn(nn.Conv(128, (3, 3, 3), (2, 2, 2), padding=1,
                                   use_bias=False, kernel_init=msra_init,
                                   dtype=self.dtype, name="enc1")(c),
                           "enc1_bn"))
        c = nn.relu(bn(nn.Conv(128, (3, 3, 3), (2, 2, 2), padding=1,
                               use_bias=False, kernel_init=msra_init,
                               dtype=self.dtype, name="enc2")(cost0),
                       "enc2_bn"))
        c = nn.relu(bn(nn.Conv(128, (3, 3, 3), padding=1, use_bias=False,
                               kernel_init=msra_init, dtype=self.dtype,
                               name="enc3")(c), "enc3_bn"))
        up1 = bn(nn.ConvTranspose(128, (3, 3, 3), (2, 2, 2), padding="SAME",
                                  use_bias=False, dtype=self.dtype,
                                  name="dec0")(c), "dec0_bn")
        c = up1 + cost0
        c = bn(nn.ConvTranspose(64, (3, 3, 3), (2, 2, 2), padding="SAME",
                                use_bias=False, dtype=self.dtype,
                                name="dec1")(c), "dec1_bn")
        return c


class CostVolumeNet(nn.Module):
    """3D-CNN instance-depth head with the structure-aware attention module
    (stereo_network_old.py:135-244).  Volumes are NDHWC: (N, D, H, W, C)."""
    reduced_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cost: jnp.ndarray, depth_bin: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        C = self.reduced_channels
        left = cost[..., :C]
        right = cost[..., C:2 * C]

        # stereo correlation gate: normalised cross-correlation per depth
        # plane over (H, W, C) (stereo_network_old.py:197-203)
        cf = jnp.float32
        l32, r32 = left.astype(cf), right.astype(cf)
        l_norm = jnp.sqrt(jnp.sum(l32 * l32, axis=(2, 3, 4)))
        r_norm = jnp.sqrt(jnp.sum(r32 * r32, axis=(2, 3, 4)))
        x_cross = (jnp.sum(l32 * r32, axis=(2, 3, 4)) /
                   jnp.maximum(l_norm * r_norm, 0.01))        # (N, D)
        cost = cost * x_cross[:, :, None, None, None].astype(cost.dtype)

        cost = ConvBN3D(64, dtype=self.dtype)(cost, train)
        cost = ConvBN3D(64, dtype=self.dtype)(cost, train)

        # structure-aware attention: collapse the height dim, gate with a
        # sigmoid 2D conv over (depth, width) (stereo_network_old.py:207-210)
        isp = jnp.mean(cost, axis=2)                          # (N, D, W, C)
        isp = nn.Conv(64, (3, 3), padding=1, kernel_init=msra_init,
                      dtype=self.dtype, name="strAM_conv")(isp)
        isp = FoldedBatchNorm(use_running_average=not train,
                              dtype=self.dtype, name="strAM_bn")(isp)
        gate = jax.nn.sigmoid(isp)[:, :, None].astype(cost.dtype)
        cost = cost * gate

        cost = ConvBN3D(64, dtype=self.dtype)(cost, train)
        cost = ConvBN3D(128, dtype=self.dtype)(cost, train)
        cost = nn.max_pool(cost, (1, 2, 2), (1, 2, 2))        # halve H, W

        res = cost
        cost = ConvBN3D(128, dtype=self.dtype)(cost, train)
        cost = ConvBN3D(128, dtype=self.dtype)(cost, train) + res
        cost = nn.max_pool(cost, (1, 2, 2), (1, 2, 2))

        cost = ConvBN3D(64, dtype=self.dtype)(cost, train)
        cost = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False,
                       kernel_init=msra_init, dtype=self.dtype,
                       name="classify")(cost)                 # (N, D, h, w, 1)
        logits = jnp.mean(cost[..., 0].astype(cf), axis=(2, 3))  # (N, D)

        # soft-argmin expectation over the metric depth bins (:232-236)
        pred = jax.nn.softmax(logits, axis=1)
        # logits are also returned so training can supervise the depth-bin
        # DISTRIBUTION (ops/losses.depth_bin_ce): pure expectation-L1
        # supervision is unstable — its gradient pushes mass toward the
        # extreme bin hardest (p_i*(pred-bin_i) grows with distance), which
        # collapses the softmax one-hot on small data (round-2 finding).
        return jnp.sum(pred * depth_bin, axis=1), logits      # (N,), (N, D)
