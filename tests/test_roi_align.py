import numpy as np
import pytest

import jax.numpy as jnp

from side_tpu.ops.roi_align import roi_align, roi_align_mm


def _numpy_oracle(feat_nhwc, boxes, batch_idx, out_size, scale, ratio):
    """Independent scalar-loop implementation of RoIAlign (aligned=False):
    per-bin fixed ratio x ratio sampling grid, bilinear with the documented
    border rule (coords < -1 or > size give 0, else clamped to edges)."""
    N = boxes.shape[0]
    B, H, W, C = feat_nhwc.shape
    out = np.zeros((N, out_size, out_size, C), np.float64)

    def sample(img, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        fy, fx = y - y0, x - x0
        return (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
                + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)

    for n in range(N):
        img = feat_nhwc[batch_idx[n]].astype(np.float64)
        x1b, y1b, x2b, y2b = boxes[n] * scale
        rw = max(x2b - x1b, 1.0)
        rh = max(y2b - y1b, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for py in range(out_size):
            for px in range(out_size):
                acc = np.zeros(C)
                for iy in range(ratio):
                    for ix in range(ratio):
                        yy = y1b + bh * (py + (iy + 0.5) / ratio)
                        xx = x1b + bw * (px + (ix + 0.5) / ratio)
                        acc += sample(img, yy, xx)
                out[n, py, px] = acc / (ratio * ratio)
    return out.astype(np.float32)


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_matches_roialign_oracle(scale):
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 24, 40, 8).astype(np.float32)
    boxes = np.array([
        [5.0, 3.0, 20.0, 18.0],
        [0.0, 0.0, 39.0, 23.0],
        [10.2, 7.7, 13.9, 12.3],
        [-3.0, -2.0, 10.0, 8.0],     # partially outside
        [35.0, 20.0, 45.0, 30.0],    # spills off the far edge
    ], np.float32)
    batch_idx = np.array([0, 1, 0, 1, 0], np.int32)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                jnp.asarray(batch_idx), 7,
                                spatial_scale=scale, sampling_ratio=2))
    oracle = _numpy_oracle(feat, boxes, batch_idx, 7, scale, 2)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_degenerate_and_tiny_rois():
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 16, 16, 4).astype(np.float32)
    boxes = np.array([
        [8.0, 8.0, 8.0, 8.0],     # zero-size: clamps to 1x1 extent
        [0.0, 0.0, 0.5, 0.5],
    ], np.float32)
    batch_idx = np.zeros(2, np.int32)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                jnp.asarray(batch_idx), 4))
    oracle = _numpy_oracle(feat, boxes, batch_idx, 4, 1.0, 2)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)
    assert np.isfinite(ours).all()


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_mm_matches_oracle(scale):
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 24, 40, 8).astype(np.float32)
    boxes = np.array([
        [5.0, 3.0, 20.0, 18.0],
        [0.0, 0.0, 39.0, 23.0],
        [10.2, 7.7, 13.9, 12.3],
        [-3.0, -2.0, 10.0, 8.0],
        [35.0, 20.0, 45.0, 30.0],
    ], np.float32)
    batch_idx = np.array([0, 1, 0, 1, 0], np.int32)
    ours = np.asarray(roi_align_mm(jnp.asarray(feat), jnp.asarray(boxes),
                                   jnp.asarray(batch_idx), 7,
                                   spatial_scale=scale, sampling_ratio=2))
    oracle = _numpy_oracle(feat, boxes, batch_idx, 7, scale, 2)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_mm_matches_gather_impl():
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 24, 40, 8).astype(np.float32)
    boxes = (rng.rand(32, 4) * np.array([40, 24, 40, 24])).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])
    batch_idx = rng.randint(0, 2, 32).astype(np.int32)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                             jnp.asarray(batch_idx), 7))
    b = np.asarray(roi_align_mm(jnp.asarray(feat), jnp.asarray(boxes),
                                jnp.asarray(batch_idx), 7))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_cost_volume_mm_matches_gather():
    """The matmul cost-volume builder (shared y-contraction across depth
    bins and views) equals the per-bin gather RoIAlign builder."""
    from side_tpu.models.cost_volume import (build_cost_volume,
                                             build_cost_volume_gather,
                                             proposal_shift)
    rng = np.random.RandomState(4)
    B, K, D, H, W, C = 2, 6, 5, 24, 80, 8
    feat_l = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    feat_r = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    cx = rng.uniform(10, 70, (B, K))
    cy = rng.uniform(5, 18, (B, K))
    w = rng.uniform(3, 12, (B, K))
    h = rng.uniform(2, 6, (B, K))
    bbox = jnp.asarray(np.stack([cx - w, cy - h, cx + w, cy + h], -1),
                       jnp.float32)
    disp = rng.uniform(0.5, 4.0, (B, K, 1))
    bbox_r = np.asarray(bbox).copy()
    bbox_r[..., 0] -= disp[..., 0]
    bbox_r[..., 2] -= disp[..., 0]
    rois_l, rois_r, _ = proposal_shift(bbox, jnp.asarray(bbox_r),
                                       jnp.full((B,), 380.0, jnp.float32),
                                       D, W)
    a = np.asarray(build_cost_volume_gather(feat_l, feat_r, rois_l, rois_r, 7))
    b = np.asarray(build_cost_volume(feat_l, feat_r, rois_l, rois_r, 7))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_constant_map_pools_constant():
    feat = np.full((1, 10, 10, 3), 2.5, np.float32)
    boxes = np.array([[2.0, 2.0, 8.0, 8.0]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                               jnp.zeros(1, jnp.int32), 5))
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)
