import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.ops import decode as D


def _rand_maps(rng, B=2, H=24, W=40, C=3, grid=7):
    heat = jax.nn.sigmoid(jnp.asarray(rng.randn(B, H, W, C), jnp.float32))
    kept = jnp.asarray(rng.randn(B, H, W, 6 * grid), jnp.float32)
    dim = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    orien = jnp.asarray(rng.randn(B, H, W, 2), jnp.float32)
    wh = jnp.asarray(rng.rand(B, H, W, 3) * 10, jnp.float32)
    reg = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    return heat, kept, dim, orien, wh, reg


def test_nms_keeps_only_local_maxima():
    hm = np.zeros((1, 9, 9, 1), np.float32)
    hm[0, 4, 4, 0] = 1.0
    hm[0, 4, 5, 0] = 0.8   # adjacent, suppressed
    hm[0, 0, 0, 0] = 0.5   # corner peak survives
    out = np.asarray(D.nms_peaks(jnp.asarray(hm)))
    assert out[0, 4, 4, 0] == 1.0
    assert out[0, 4, 5, 0] == 0.0
    assert out[0, 0, 0, 0] == 0.5


def test_topk_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, H, W, C, K = 2, 16, 20, 3, 10
    scores = rng.rand(B, H, W, C).astype(np.float32)
    s, inds, clses, ys, xs = [np.asarray(v) for v in
                              D.topk(jnp.asarray(scores), K)]
    # oracle: flat global top-K per batch over (C, H*W)
    flat = scores.reshape(B, H * W, C).transpose(0, 2, 1).reshape(B, -1)
    for b in range(B):
        order = np.argsort(-flat[b])[:K]
        np.testing.assert_allclose(np.sort(s[b])[::-1], np.sort(flat[b][order])[::-1],
                                   rtol=1e-6)
        # per-element check of the mapping
        for k in range(K):
            c, i = clses[b, k], inds[b, k]
            assert scores[b, i // W, i % W, c] == pytest.approx(s[b, k])
            assert ys[b, k] == i // W
            assert xs[b, k] == i % W


def test_gather_feat():
    rng = np.random.RandomState(1)
    f = rng.randn(2, 8, 10, 5).astype(np.float32)
    ind = np.array([[0, 79, 35], [12, 1, 40]])
    out = np.asarray(D.gather_feat(jnp.asarray(f), jnp.asarray(ind)))
    flat = f.reshape(2, 80, 5)
    for b in range(2):
        for k in range(3):
            np.testing.assert_allclose(out[b, k], flat[b, ind[b, k]])


def test_ddd_decode_structure():
    rng = np.random.RandomState(2)
    grid, K = 7, 12
    heat, kept, dim, orien, wh, reg = _rand_maps(rng, grid=grid)
    dets, dets_r, info = D.ddd_decode(heat, kept, dim, orien, wh, reg,
                                      grid_size=grid, K=K)
    dets, dets_r, info = map(np.asarray, (dets, dets_r, info))
    assert dets.shape == (2, K, 6) and dets_r.shape == (2, K, 6)
    assert info.shape == (2, K, 9)
    # scores sorted descending
    assert np.all(np.diff(dets[:, :, 4], axis=1) <= 1e-6)
    # shared y and h between views
    np.testing.assert_allclose(dets[:, :, 1], dets_r[:, :, 1])
    np.testing.assert_allclose(dets[:, :, 3], dets_r[:, :, 3])
    # kept_type in [0, 4), offsets within grid
    assert np.all(info[:, :, 8] >= 0) and np.all(info[:, :, 8] < 4)
    assert np.all(info[:, :, 7] >= 0) and np.all(info[:, :, 7] < grid)
    assert np.all(info[:, :, 5] < grid) and np.all(info[:, :, 6] < grid)
    # x offsets: left/right x differ by reg channels at the same peak cell
    B, H, W, C = heat.shape
    regn = np.asarray(reg)
    for b in range(2):
        for k in range(3):
            # reconstruct the peak cell from decoded x,y minus its offset
            pass  # covered by the topk mapping test


def test_ddd_decode_planted_peak():
    grid = 7
    B, H, W, C = 1, 24, 40, 3
    heat = np.full((B, H, W, C), 0.01, np.float32)
    heat[0, 10, 17, 1] = 0.9
    kept = np.zeros((B, H, W, 6 * grid), np.float32)
    kept[0, 10, 17, 2 * grid + 3] = 5.0      # kpt type 2, cell 3
    kept[0, 10, 17, 4 * grid + 1] = 5.0      # border left cell 1
    kept[0, 10, 17, 5 * grid + 6] = 5.0      # border right cell 6
    dim = np.zeros((B, H, W, 3), np.float32)
    dim[0, 10, 17] = [1.5, 1.6, 3.9]
    orien = np.zeros((B, H, W, 2), np.float32)
    orien[0, 10, 17] = [0.6, 0.8]
    wh = np.zeros((B, H, W, 3), np.float32)
    wh[0, 10, 17] = [20.0, 18.0, 10.0]
    reg = np.zeros((B, H, W, 3), np.float32)
    reg[0, 10, 17] = [0.3, -4.2, 0.7]

    dets, dets_r, info = map(np.asarray, D.ddd_decode(
        *(jnp.asarray(a) for a in (heat, kept, dim, orien, wh, reg)),
        grid_size=grid, K=5))
    # top detection is the planted peak
    assert dets[0, 0, 4] == pytest.approx(0.9)
    assert dets[0, 0, 5] == 1  # class
    assert dets[0, 0, 0] == pytest.approx(17 + 0.3)
    assert dets[0, 0, 1] == pytest.approx(10 + 0.7)
    assert dets_r[0, 0, 0] == pytest.approx(17 - 4.2)
    np.testing.assert_allclose(dets[0, 0, 2:4], [20.0, 10.0])
    np.testing.assert_allclose(dets_r[0, 0, 2:4], [18.0, 10.0])
    np.testing.assert_allclose(info[0, 0, :3], [1.5, 1.6, 3.9])
    np.testing.assert_allclose(info[0, 0, 3:5], [0.6, 0.8])
    assert info[0, 0, 5] == 1 and info[0, 0, 6] == 6
    assert info[0, 0, 7] == 3 and info[0, 0, 8] == 2


def test_bbox_decode_valid_mask():
    B, H, W, C = 1, 24, 40, 3
    hm_logits = np.full((B, H, W, C), -8.0, np.float32)
    hm_logits[0, 10, 17, 0] = 3.0
    wh = np.zeros((B, H, W, 3), np.float32)
    wh[0, 10, 17] = [8.0, 7.0, 6.0]
    reg = np.zeros((B, H, W, 3), np.float32)
    bbox, bbox_r, valid = map(np.asarray, D.bbox_decode(
        jnp.asarray(hm_logits), jnp.asarray(wh), jnp.asarray(reg), K=10))
    assert bbox.shape == (1, 10, 4) and valid.shape == (1, 10)
    assert valid[0, 0]
    np.testing.assert_allclose(bbox[0, 0], [17 - 4, 10 - 3, 17 + 4, 10 + 3])
    np.testing.assert_allclose(bbox_r[0, 0], [17 - 3.5, 10 - 3, 17 + 3.5, 10 + 3])
    # zero-wh peaks at cell (0,0) with zero reg -> coordinate sum 0 -> invalid
    assert not valid[0, 1:].all() or np.all(bbox[0, 1:].sum(1) > 0)


def test_boxes_from_targets_matches_reference_math():
    B, K, W = 2, 4, 320
    rng = np.random.RandomState(3)
    ind = rng.randint(0, 96 * 320, (B, K)).astype(np.float32)
    wh = rng.rand(B, K, 3).astype(np.float32) * 30
    reg = rng.rand(B, K, 3).astype(np.float32)
    bbox, bbox_r, valid = map(np.asarray, D.boxes_from_targets(
        jnp.asarray(ind), jnp.asarray(wh), jnp.asarray(reg), W, 1.0))
    xs = ind % W + reg[:, :, 0]
    ys = ind // W + reg[:, :, 2]
    np.testing.assert_allclose(bbox[:, :, 0], xs - 0.5 * wh[:, :, 0], rtol=1e-5)
    np.testing.assert_allclose(bbox[:, :, 3], ys + 0.5 * wh[:, :, 2], rtol=1e-5)
    xs_r = ind % W + reg[:, :, 1]
    np.testing.assert_allclose(bbox_r[:, :, 2], xs_r + 0.5 * wh[:, :, 1],
                               rtol=1e-5)
    assert valid.all()
