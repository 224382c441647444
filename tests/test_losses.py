import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.ops import losses as L
from side_tpu.data import targets as T


def test_focal_loss_matches_oracle():
    rng = np.random.RandomState(0)
    gt = np.zeros((2, 8, 10, 3), np.float32)
    gt[0, 3, 4, 1] = 1.0
    gt[0, 3, 5, 1] = 0.6
    gt[1, 2, 2, 0] = 1.0
    pred = 1 / (1 + np.exp(-rng.randn(2, 8, 10, 3).astype(np.float32)))
    pred = np.clip(pred, 1e-4, 1 - 1e-4)

    ours = float(L.focal_loss(jnp.asarray(pred), jnp.asarray(gt)))

    pos = (gt == 1).astype(np.float64)
    neg = (gt < 1).astype(np.float64)
    p = pred.astype(np.float64)
    pos_loss = (np.log(p) * (1 - p) ** 2 * pos).sum()
    neg_loss = (np.log(1 - p) * p ** 2 * (1 - gt) ** 4 * neg).sum()
    oracle = -(pos_loss + neg_loss) / pos.sum()
    assert ours == pytest.approx(oracle, rel=1e-5)


def test_focal_loss_no_positives():
    gt = np.zeros((1, 4, 4, 1), np.float32)
    pred = np.full((1, 4, 4, 1), 0.3, np.float32)
    ours = float(L.focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    oracle = -(np.log(1 - 0.3) * 0.09 * 1.0) * 16
    assert ours == pytest.approx(oracle, rel=1e-3)


def test_masked_l1_divides_by_all_slots():
    """Reference L1Loss uses reduction='mean' over B*K*C (losses.py:177-185)."""
    B, H, W, C, K = 1, 4, 5, 3, 2
    out = np.zeros((B, H, W, C), np.float32)
    out[0, 1, 2] = [1.0, 2.0, 3.0]
    ind = np.array([[1 * W + 2, 0]])
    mask = np.array([[1, 0]], np.uint8)
    target = np.zeros((B, K, C), np.float32)
    loss = float(L.masked_l1_loss(jnp.asarray(out), jnp.asarray(mask),
                                  jnp.asarray(ind), jnp.asarray(target)))
    assert loss == pytest.approx((1 + 2 + 3) / (B * K * C))


def test_cross_loss_is_unmasked_mean():
    B, H, W, K, C = 1, 2, 3, 2, 4
    out = np.zeros((B, H, W, C), np.float32)
    out[0, 0, 0] = [10.0, 0, 0, 0]
    out[0, 1, 2] = [0, 0, 10.0, 0]
    ind = np.array([[0, 1 * W + 2]])
    target = np.array([[0, 2]])
    loss = float(L.cross_loss(jnp.asarray(out), jnp.asarray(ind),
                              jnp.asarray(target)))
    # both rows nearly perfectly classified
    assert loss < 1e-3
    # wrong target on slot 2 raises it
    loss2 = float(L.cross_loss(jnp.asarray(out), jnp.asarray(ind),
                               jnp.asarray(np.array([[0, 1]]))))
    assert loss2 > 4.0


def test_compute_kept_label_device_matches_host():
    rng = np.random.RandomState(0)
    kept = rng.uniform(-10, 60, (2, 5, 6)).astype(np.float32)
    wh = rng.uniform(10, 60, (2, 5, 3)).astype(np.float32)
    host = T.compute_kept_label(kept, wh, 28)
    dev = np.asarray(L.compute_kept_label(jnp.asarray(kept), jnp.asarray(wh), 28))
    np.testing.assert_array_equal(host, dev)


def _fake_batch_and_outputs(rng, B=2, H=12, W=16, K=5, grid=7, C=3):
    outputs = {
        "hm": jnp.asarray(rng.randn(B, H, W, C), jnp.float32),
        "dim": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "orien": jnp.asarray(rng.randn(B, H, W, 2), jnp.float32),
        "wh": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "reg": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "kept_type": jnp.asarray(rng.randn(B, H, W, 6 * grid), jnp.float32),
        "depth": jnp.asarray(rng.rand(B, K, 1) * 40, jnp.float32),
    }
    hm_gt = np.zeros((B, C, H, W), np.float32)
    hm_gt[0, 1, 3, 4] = 1.0
    hm_gt[1, 0, 5, 6] = 1.0
    batch = {
        "hm": jnp.asarray(hm_gt),
        "rot_mask": jnp.asarray((rng.rand(B, K) > 0.5).astype(np.uint8)),
        "ind": jnp.asarray(rng.randint(0, H * W, (B, K))),
        "dim": jnp.asarray(rng.rand(B, K, 3), jnp.float32),
        "orien": jnp.asarray(rng.rand(B, K, 2), jnp.float32),
        "wh": jnp.asarray(rng.rand(B, K, 3) * 20, jnp.float32),
        "reg": jnp.asarray(rng.rand(B, K, 3), jnp.float32),
        "kept": jnp.asarray(rng.rand(B, K, 6) * 20, jnp.float32),
        "depth": jnp.asarray(rng.rand(B, K, 1) * 40, jnp.float32),
    }
    return outputs, batch


def test_stereo_loss_fixed_weights():
    rng = np.random.RandomState(1)
    outputs, batch = _fake_batch_and_outputs(rng)
    lw = jnp.ones(7)
    total, stats = L.stereo_loss(outputs, batch, lw, grid=7, uncert=False,
                                 use_cost_volume=True)
    parts = [stats[k] for k in ["hm_loss", "wh_loss", "off_loss",
                                "depth_loss", "dim_loss", "orien_loss",
                                "kept_loss"]]
    assert float(total) == pytest.approx(float(sum(parts)), rel=1e-5)
    assert np.isfinite(float(total))


def test_stereo_loss_uncertainty_weighting():
    rng = np.random.RandomState(2)
    outputs, batch = _fake_batch_and_outputs(rng)
    s = jnp.asarray(np.full(7, -1.0, np.float32))
    total, stats = L.stereo_loss(outputs, batch, s, grid=7, uncert=True,
                                 use_cost_volume=True)
    parts = np.array([float(stats[k]) for k in
                      ["hm_loss", "wh_loss", "off_loss", "depth_loss",
                       "dim_loss", "orien_loss", "kept_loss"]])
    expect = float((parts * np.exp(1.0) + (-1.0)).sum())
    assert float(total) == pytest.approx(expect, rel=1e-5)


def test_stereo_loss_grad_flows():
    rng = np.random.RandomState(3)
    outputs, batch = _fake_batch_and_outputs(rng)

    def f(outs):
        return L.stereo_loss(outs, batch, jnp.ones(7), grid=7, uncert=False,
                             use_cost_volume=True)[0]

    grads = jax.grad(f)(outputs)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert float(jnp.abs(grads["hm"]).sum()) > 0
    assert float(jnp.abs(grads["depth"]).sum()) > 0


def test_focal_loss_logits_matches_clamped_in_range():
    """Within the reference clamp range (1e-4, 1-1e-4) the logits form is
    numerically identical to clamped-sigmoid + focal_loss."""
    rng = np.random.RandomState(3)
    gt = np.zeros((2, 8, 10, 3), np.float32)
    gt[0, 3, 4, 1] = 1.0
    gt[1, 2, 2, 0] = 1.0
    gt[1, 2, 3, 0] = 0.8
    logits = rng.randn(2, 8, 10, 3).astype(np.float32) * 3.0  # |x| < 9
    a = float(L.focal_loss(L.clamped_sigmoid(jnp.asarray(logits)),
                           jnp.asarray(gt)))
    b = float(L.focal_loss_logits(jnp.asarray(logits), jnp.asarray(gt)))
    assert b == pytest.approx(a, rel=1e-6)


def test_focal_loss_logits_saturated_positive_recovers():
    """The clamp's zero gradient permanently kills a positive whose
    prediction saturates below 1e-4 (observed: hm_loss pinned at
    -log(1e-4)*(1-1e-4)^2/num_pos on the fixture overfit).  The logits
    form must keep a usable gradient there."""
    gt = np.zeros((1, 4, 4, 1), np.float32)
    gt[0, 1, 1, 0] = 1.0
    logits = np.full((1, 4, 4, 1), -12.0, np.float32)  # sigmoid ~ 6e-6

    g_clamped = jax.grad(lambda x: L.focal_loss(L.clamped_sigmoid(x),
                                                jnp.asarray(gt)))(
        jnp.asarray(logits))
    g_logits = jax.grad(lambda x: L.focal_loss_logits(x, jnp.asarray(gt)))(
        jnp.asarray(logits))
    # clamped path: dead everywhere (all preds outside the clamp range)
    assert float(jnp.abs(g_clamped).max()) == 0.0
    # logits path: the positive cell still pulls up with ~unit slope
    assert float(g_logits[0, 1, 1, 0]) == pytest.approx(-1.0, abs=0.05)
