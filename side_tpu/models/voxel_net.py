"""Voxel + PointNet instance-depth variant ("new" model).

TPU re-design of the reference's alternative depth estimator
(/root/reference/src/lib/models/networks/stereo_network_new.py and
pointNet.py): instead of a disparity-shifted cost volume, each detected
object gets a metric 10x10x10 voxel grid (1 m z-stride, 0.5 m x/y-stride,
get_voxel :160-283) centred on its coarse disparity-derived 3D centre; the
voxels are projected through P2/P3 into both feature maps, bilinearly
sampled, and a PointNet with the structure-aware attention gate regresses a
RESIDUAL depth added to the disparity depth (:454-464).

The reference's per-image Python loops with `.detach().cpu()` round-trips
(:93-283) — called out in SURVEY.md §3.5 — become one (B, K, V, ...) tensor
program with validity masks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import decode as dec
from .dla import BN_EPS, BN_MOMENTUM, FeatureExtractor, conv_init
from .stereo_net import Head

# 10 bins per axis, matching the reference get_voxel exactly:
# zs = arange(-5, 5, 1.0) + 0.5  -> 10 bins @ 1 m   (stereo_network_new.py:213)
# xs/ys = arange(-2.5, 2.5, 0.5) + 0.25 -> 10 @ 0.5 m (:161,214-215)
# (roiSize=20 at :309 only parameterises get_proposal_shift's depth_bin count,
# whose RoI path is commented out at :396-405; the voxel res the PointNet sees
# is norm_coord_imgs.shape[1] == 10, :417.)
VOXEL_RES = 10


def _apply_affine(pts: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) points through a (2, 3) affine."""
    return pts @ t[:, :2].T + t[:, 2]


def unwarp_centers(bbox: jnp.ndarray, trans_inv: jnp.ndarray) -> jnp.ndarray:
    """Feature-res corner boxes -> original-pixel boxes
    (stereo_network_new.py:105-117).  bbox: (B, K, 4); trans_inv: (B, 2, 3)."""
    p1 = jax.vmap(_apply_affine)(bbox[..., 0:2], trans_inv)
    p2 = jax.vmap(_apply_affine)(bbox[..., 2:4], trans_inv)
    return jnp.concatenate([p1, p2], axis=-1)


def disparity_depth(bbox: jnp.ndarray, bbox_right: jnp.ndarray,
                    fb: jnp.ndarray, trans_inv: jnp.ndarray) -> jnp.ndarray:
    """Coarse depth from the un-warped center disparity (:117-120)."""
    bl = unwarp_centers(bbox, trans_inv)
    br = unwarp_centers(bbox_right, trans_inv)
    cl = (bl[..., 0] + bl[..., 2]) / 2
    cr = (br[..., 0] + br[..., 2]) / 2
    disp = cl - cr
    return fb[:, None] / jnp.where(jnp.abs(disp) < 1e-3, 1e-3, disp)


def voxel_coords(bbox: jnp.ndarray, bbox_right: jnp.ndarray, fb: jnp.ndarray,
                 p2: jnp.ndarray, p3: jnp.ndarray, trans: jnp.ndarray,
                 trans_inv: jnp.ndarray, feat_w: int, feat_h: int):
    """Per-object voxel grids projected into both feature maps.

    Returns (coords_left, coords_right, valid_left, valid_right, depth_ori):
    coords_*: (B, K, V, 2) feature-map pixel coords (V = VOXEL_RES**3),
    valid_*: (B, K, V) in-map flags, depth_ori: (B, K).
    """
    B, K, _ = bbox.shape
    depth_ori = disparity_depth(bbox, bbox_right, fb, trans_inv)  # (B, K)

    bl_ori = unwarp_centers(bbox, trans_inv)
    cx = (bl_ori[..., 0] + bl_ori[..., 2]) / 2
    cy = (bl_ori[..., 1] + bl_ori[..., 3]) / 2

    # back-project the coarse center through P2 (:212-214)
    z = depth_ori - p2[:, None, 2, 3]
    x = (cx * depth_ori - p2[:, None, 0, 3] - p2[:, None, 0, 2] * z) / \
        p2[:, None, 0, 0]
    y = (cy * depth_ori - p2[:, None, 1, 3] - p2[:, None, 1, 2] * z) / \
        p2[:, None, 1, 1]

    # fixed metric offsets (x, y: 0.5 m stride over +-2.5 m; z: 1 m over +-5 m)
    r = VOXEL_RES
    off_xy = (jnp.arange(r, dtype=jnp.float32) - r / 2) * 0.5 + 0.25
    off_z = (jnp.arange(r, dtype=jnp.float32) - r / 2) * 1.0 + 0.5
    ox, oy_, oz = jnp.meshgrid(off_xy, off_xy, off_z, indexing="ij")
    offsets = jnp.stack([ox, oy_, oz], axis=-1).reshape(-1, 3)  # (V, 3)

    centers = jnp.stack([x, y, z], axis=-1)                      # (B, K, 3)
    pts = centers[:, :, None, :] + offsets[None, None]           # (B, K, V, 3)

    def proj(P, t):
        def one(pb, Pb, tb):
            homo = jnp.concatenate(
                [pb, jnp.ones_like(pb[..., :1])], axis=-1)       # (K, V, 4)
            uvw = homo @ Pb.T
            uv = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-3)
            return _apply_affine(uv, tb)                         # feature res
        return jax.vmap(one)(pts, P, t)

    cl = proj(p2, trans)
    cr = proj(p3, trans)

    def valid(c):
        return ((c[..., 0] >= 0) & (c[..., 0] <= feat_w - 1) &
                (c[..., 1] >= 0) & (c[..., 1] <= feat_h - 1))

    return cl, cr, valid(cl), valid(cr), depth_ori


def grid_sample_feats(feat: jnp.ndarray, coords: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (B, H, W, C) at (B, K, V, 2) pixel coords, zeros
    outside, then mask invalid voxels (the reference zeroes invalid
    normalised coords before grid_sample and masks features after,
    stereo_network_new.py:414-446)."""
    B, H, W, C = feat.shape
    _, K, V, _ = coords.shape
    u = jnp.clip(jnp.where(valid, coords[..., 0], 0.0), 0, W - 1)
    v = jnp.clip(jnp.where(valid, coords[..., 1], 0.0), 0, H - 1)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    from ..ops.deform_conv import _row_gather
    flat = feat.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]

    def g(yi, xi):
        idx = (base + yi * W + xi).reshape(B * K * V)
        return _row_gather(flat, idx).reshape(B, K, V, C)

    out = (g(y0, x0) * (1 - fy) * (1 - fx) + g(y0, x1) * (1 - fy) * fx +
           g(y1, x0) * fy * (1 - fx) + g(y1, x1) * fy * fx)
    return out * valid[..., None].astype(out.dtype)


class PointNetDepth(nn.Module):
    """PointNet residual-depth head with structure-aware attention
    (pointNet.py:8-82).  Input: (N, V, C) voxel point features."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, rng=None):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=jnp.float32, name=name)

        x = nn.relu(bn("bn1")(nn.Dense(256, dtype=self.dtype,
                                       name="conv1")(x))).astype(self.dtype)
        x = nn.relu(bn("bn2")(nn.Dense(512, dtype=self.dtype,
                                       name="conv2")(x))).astype(self.dtype)
        x = bn("bn3")(nn.Dense(1024, dtype=self.dtype,
                               name="conv3")(x)).astype(self.dtype)

        # structure-aware gate: mean over the height axis of the voxel cube,
        # 2D conv over (x, z), sigmoid, broadcast back (pointNet.py:29-35)
        r = VOXEL_RES
        N = x.shape[0]
        cube = x.reshape(N, r, r, r, 1024)      # (N, x, y, z, C)
        isp = jnp.mean(cube, axis=2)            # collapse y (height)
        isp = nn.Conv(1024, (3, 3), padding=1, dtype=self.dtype,
                      name="strAM_2D")(isp)
        gate = jax.nn.sigmoid(isp)[:, :, None]
        cube = cube * gate.astype(cube.dtype)
        gated = cube.reshape(N, r * r * r, 1024)

        x = nn.relu(bn("bn4")(nn.Dense(1024, dtype=self.dtype,
                                       name="conv4")(gated))
                    ).astype(self.dtype) + x
        x = jnp.max(x, axis=1)                  # global max-pool over points

        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(bn("fc_bn1")(x))
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.relu(bn("fc_bn2")(x))
        return nn.Dense(1, dtype=self.dtype, name="depth")(x)[..., 0]


class StereoVoxelNet(nn.Module):
    """Full stereo network with the voxel+PointNet depth path
    (stereo_network_new.py:300-470)."""
    heads: Dict[str, int]
    max_objs: int = 50
    topk: int = 100
    down_ratio: int = 4
    input_w: int = 1280
    input_h: int = 384
    dtype: Any = jnp.float32

    LEFT_ONLY = ("kept_type",)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 use_cost_volume: bool = True,
                 target: Optional[Tuple] = None,
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

        out: Dict[str, jnp.ndarray] = {}
        for name, ch in self.heads.items():
            deep = name in self.LEFT_ONLY
            out[name] = Head(ch, deep=deep, hm=(name == "hm"),
                             dtype=self.dtype, name=name)(
                                 f_left if deep else f_stereo)

        if use_cost_volume:
            feat_w = self.input_w // self.down_ratio
            feat_h = self.input_h // self.down_ratio

            # 3x3 reduce to 64 channels WITH bias (stereo_network_new.py:318-322)
            red = nn.Conv(64, (3, 3), padding=1, use_bias=True,
                          kernel_init=conv_init, dtype=self.dtype,
                          name="feaReduce")(feats)
            red = nn.BatchNorm(use_running_average=not train,
                               momentum=BN_MOMENTUM, epsilon=BN_EPS,
                               dtype=jnp.float32, name="feaReduce_bn")(red)
            red = nn.relu(red).astype(self.dtype)
            red_left, red_right = red[:B], red[B:]

            if target is not None:
                bbox, bbox_right, valid = target
            else:
                bbox, bbox_right, valid = dec.bbox_decode(
                    out["hm"], out["wh"], out["reg"], K=self.topk)

            cl, cr, vl, vr, depth_ori = voxel_coords(
                bbox, bbox_right, batch["fb"].reshape(B),
                batch["p2"], batch["p3"], batch["trans"],
                batch["trans_inv"], feat_w, feat_h)

            pl = grid_sample_feats(red_left, cl, vl)    # (B, K, V, 64)
            pr = grid_sample_feats(red_right, cr, vr)
            voxel = jnp.concatenate([pl - pr, pl, pr], axis=-1)  # 192 ch
            K = bbox.shape[1]
            V = voxel.shape[2]
            resid = PointNetDepth(dtype=self.dtype, name="pointNet")(
                voxel.reshape(B * K, V, 192), train)
            depth = (depth_ori + resid.reshape(B, K)).reshape(B, K, 1)
            depth = depth * valid[..., None].astype(depth.dtype)
            out["depth"] = depth

        return out
