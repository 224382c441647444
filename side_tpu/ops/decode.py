"""Shape-static CenterNet stereo decode on device.

Re-design of the reference decode (/root/reference/src/lib/models/decode.py)
for XLA: 3x3 max-pool peak NMS via `lax.reduce_window`, two-stage top-K, and
gather-based head readout.  All outputs are fixed-shape; the reference's
boolean `keep` compaction (decode.py:122-124) becomes a validity mask so the
whole pipeline stays jittable.

Feature maps are NHWC: (B, H, W, C).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def nms_peaks(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of a (B, H, W, C) heatmap (decode.py:9-15)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return jnp.where(hmax == heat, heat, 0.0)


def topk(scores: jnp.ndarray, K: int):
    """Two-stage top-K over a peak map (decode.py:17-33).

    scores: (B, H, W, C) -> (score, inds, clses, ys, xs), each (B, K).
    `inds` indexes the flattened H*W plane.
    """
    B, H, W, C = scores.shape
    flat = scores.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, C, HW)
    topk_scores, topk_inds = jax.lax.top_k(flat, K)        # (B, C, K)
    topk_ys = (topk_inds // W).astype(jnp.float32)
    topk_xs = (topk_inds % W).astype(jnp.float32)

    topk_score, topk_ind = jax.lax.top_k(topk_scores.reshape(B, C * K), K)
    topk_clses = (topk_ind // K).astype(jnp.int32)

    def pick(x):
        return jnp.take_along_axis(x.reshape(B, C * K), topk_ind, axis=1)

    return (topk_score, pick(topk_inds.astype(jnp.int32)), topk_clses,
            pick(topk_ys), pick(topk_xs))


def gather_feat(fmap: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, H, W, C) features at flattened cell indices (B, K) ->
    (B, K, C).  NHWC equivalent of models/utils.py:18-35."""
    B, H, W, C = fmap.shape
    flat = fmap.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, ind[..., None].astype(jnp.int32), axis=1)


def ddd_decode(heat, kept, dim, orien, wh, reg, grid_size: int, K: int = 40):
    """Full stereo 3D decode (decode.py:35-89).

    All inputs NHWC; `heat` must already be sigmoided.
    Returns:
        detections       (B, K, 6): x, y, w_left, h, score, cls
        detections_right (B, K, 6): x_right, y, w_right, h, score, cls
        info_3d          (B, K, 9): dim(3), orien(2), border_left,
                                    border_right, kept_offset, kept_type
    """
    B = heat.shape[0]
    peaks = nms_peaks(heat)
    scores, inds, clses, ys, xs = topk(peaks, K=K)

    reg = gather_feat(reg, inds)                      # (B, K, 3)
    xs_right = xs[..., None] + reg[:, :, 1:2]
    xs = xs[..., None] + reg[:, :, 0:1]
    ys = ys[..., None] + reg[:, :, 2:3]

    dim = gather_feat(dim, inds)                      # (B, K, 3)
    orien = gather_feat(orien, inds)                  # (B, K, 2)
    wh = gather_feat(wh, inds)                        # (B, K, 3)
    clses = clses[..., None].astype(jnp.float32)
    scores = scores[..., None]

    kept = gather_feat(kept, inds)                    # (B, K, 6*grid)
    kept_off = jnp.argmax(kept[:, :, :4 * grid_size], axis=2)
    kept_type = (kept_off // grid_size).astype(jnp.float32)[..., None]
    kept_offset = (kept_off % grid_size).astype(jnp.float32)[..., None]
    border_left = jnp.argmax(
        kept[:, :, 4 * grid_size:5 * grid_size], axis=2
    ).astype(jnp.float32)[..., None]
    border_right = jnp.argmax(
        kept[:, :, 5 * grid_size:], axis=2).astype(jnp.float32)[..., None]

    detections = jnp.concatenate(
        [xs, ys, wh[:, :, 0:1], wh[:, :, 2:3], scores, clses], axis=2)
    detections_right = jnp.concatenate(
        [xs_right, ys, wh[:, :, 1:2], wh[:, :, 2:3], scores, clses], axis=2)
    info_3d = jnp.concatenate(
        [dim, orien, border_left, border_right, kept_offset, kept_type],
        axis=2)
    return detections, detections_right, info_3d


def bbox_decode(heat, wh, reg, K: int = 100):
    """Decode top-K left/right RoI boxes for the cost volume
    (decode.py:91-126), shape-static.

    Returns (bbox, bbox_right, valid):
        bbox, bbox_right (B, K, 4): x1, y1, x2, y2 at feature resolution
        valid            (B, K)    bool — the reference's `keep` filter
                                   (coordinate sum > 0) as a mask.
    """
    heat = jax.nn.sigmoid(heat)
    peaks = nms_peaks(heat)
    scores, inds, clses, ys, xs = topk(peaks, K=K)

    reg = gather_feat(reg, inds)
    xs_right = xs[..., None] + reg[:, :, 1:2]
    xs = xs[..., None] + reg[:, :, 0:1]
    ys = ys[..., None] + reg[:, :, 2:3]
    wh = gather_feat(wh, inds)

    center = jnp.concatenate([xs, ys], axis=2)
    center_right = jnp.concatenate([xs_right, ys], axis=2)
    half = 0.5 * wh[:, :, jnp.array([0, 2])]
    half_right = 0.5 * wh[:, :, jnp.array([1, 2])]
    bbox = jnp.concatenate([center - half, center + half], axis=2)
    bbox_right = jnp.concatenate(
        [center_right - half_right, center_right + half_right], axis=2)
    valid = jnp.sum(bbox, axis=2) > 0
    return bbox, bbox_right, valid


def boxes_from_targets(ind_float, wh, reg, output_w: int, wh_scale: float = 1.0):
    """GT-derived RoI boxes used to feed the cost volume during training
    (stereoTrainer.py:40-61), shape-static with a validity mask.

    Returns (bbox, bbox_right, valid) with shapes (B, K, 4), (B, K, 4), (B, K).
    """
    xs = ind_float % output_w
    ys = ind_float // output_w
    xs_right = xs + reg[:, :, 1]
    xs = xs + reg[:, :, 0]
    ys = ys + reg[:, :, 2]
    center = jnp.stack([xs, ys], axis=2)
    center_right = jnp.stack([xs_right, ys], axis=2)
    half = 0.5 * wh[:, :, jnp.array([0, 2])] * wh_scale
    half_right = 0.5 * wh[:, :, jnp.array([1, 2])] * wh_scale
    bbox = jnp.concatenate([center - half, center + half], axis=2)
    bbox_right = jnp.concatenate(
        [center_right - half_right, center_right + half_right], axis=2)
    valid = jnp.sum(bbox, axis=2) > 0
    return bbox, bbox_right, valid
