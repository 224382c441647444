"""Model shape tests (reference testModel.py analogue) on tiny inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.config import Config
from side_tpu.models.dla import FeatureExtractor
from side_tpu.models.stereo_net import StereoNet, init_stereo_net
from side_tpu.models.cost_volume import proposal_shift, build_cost_volume

H, W = 64, 128  # tiny input so CPU compiles stay fast
K = 6


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = Config(input_h=H, input_w=W, compute_dtype="float32", K=8)
    model = StereoNet(heads=dict(cfg.heads), roi_size=4, max_objs=K,
                      topk=8, down_ratio=4, input_w=W, dtype=jnp.float32)
    variables = init_stereo_net(model, jax.random.PRNGKey(0), H, W, K)
    return model, variables


def _batch(B=1):
    rng = np.random.RandomState(0)
    return {
        "input": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "input_right": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "fb": jnp.full((B,), 380.0, jnp.float32),
    }


@pytest.mark.slow
def test_backbone_output_shape():
    """Standalone FeatureExtractor init costs ~30s on CPU; the backbone
    shape is also covered (via the full model) by test_head_shapes."""
    fe = FeatureExtractor(down_ratio=4, dtype=jnp.float32)
    x = jnp.zeros((1, H, W, 3))
    vs = fe.init(jax.random.PRNGKey(0), x)
    y = fe.apply(vs, x)
    assert y.shape == (1, H // 4, W // 4, 64)


def test_head_shapes(model_and_vars):
    model, variables = model_and_vars
    target = (jnp.zeros((1, K, 4)), jnp.zeros((1, K, 4)),
              jnp.zeros((1, K), bool))
    out = model.apply(variables, _batch(), use_cost_volume=True,
                      target=target, train=False)
    Ho, Wo = H // 4, W // 4
    assert out["hm"].shape == (1, Ho, Wo, 3)
    assert out["wh"].shape == (1, Ho, Wo, 3)
    assert out["reg"].shape == (1, Ho, Wo, 3)
    assert out["dim"].shape == (1, Ho, Wo, 3)
    assert out["orien"].shape == (1, Ho, Wo, 2)
    assert out["kept_type"].shape == (1, Ho, Wo, 6 * 28)
    assert out["depth"].shape == (1, K, 1)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_hm_head_bias_init(model_and_vars):
    """hm final bias must start at -2.19 (stereo_network_old.py:300)."""
    _, variables = model_and_vars
    hm_params = variables["params"]["hm"]
    final_conv = [v for k, v in sorted(hm_params.items())][-1]
    np.testing.assert_allclose(np.asarray(final_conv["bias"]), -2.19,
                               atol=1e-6)


def test_depth_masked_by_validity(model_and_vars):
    model, variables = model_and_vars
    boxes = np.zeros((1, K, 4), np.float32)
    boxes[0, 0] = [4, 4, 20, 14]
    boxes[0, 1] = [8, 2, 26, 12]
    valid = np.zeros((1, K), bool)
    valid[0, :2] = True
    out = model.apply(variables, _batch(), use_cost_volume=True,
                      target=(jnp.asarray(boxes), jnp.asarray(boxes),
                              jnp.asarray(valid)), train=False)
    depth = np.asarray(out["depth"])
    assert (depth[0, :2, 0] > 0).all()
    np.testing.assert_allclose(depth[0, 2:, 0], 0.0)


def test_no_cost_volume_path(model_and_vars):
    model, variables = model_and_vars
    out = model.apply(variables, _batch(), use_cost_volume=False, train=False)
    assert "depth" not in out


def test_inference_uses_decoded_boxes(model_and_vars):
    """target=None must route through bbox_decode without shape errors."""
    model, variables = model_and_vars
    out = model.apply(variables, _batch(), use_cost_volume=True, target=None,
                      train=False)
    assert out["depth"].shape == (1, 8, 1)  # topk slots


def test_proposal_shift_geometry():
    fb = jnp.asarray([380.0])
    bbox = jnp.asarray([[[10.0, 5.0, 30.0, 15.0]]])
    rl, rr, depth_bin = proposal_shift(bbox, bbox, fb, 4, feat_w=80)
    rl, rr, depth_bin = map(np.asarray, (rl, rr, depth_bin))
    assert rl.shape == (1, 1, 4, 4) and depth_bin.shape == (1, 1, 4)
    # bins descend from DEPTH_MAX to the box-size prior
    assert depth_bin[0, 0, 0] == pytest.approx(87.0)
    prior = np.clip(380.0 / (20 * 0.9 * 4), 1.0, 87.0)
    assert depth_bin[0, 0, -1] == pytest.approx(prior, rel=1e-5)
    # left rois shift right, right rois shift left, more for nearer bins
    disp = 380.0 / depth_bin / 8.0
    np.testing.assert_allclose(rl[0, 0, :, 0], 10 + disp[0, 0], rtol=1e-5)
    np.testing.assert_allclose(rr[0, 0, :, 0], 10 - disp[0, 0], rtol=1e-5)
    # y coords unchanged
    np.testing.assert_allclose(rl[0, 0, :, 1], 5.0)
    np.testing.assert_allclose(rr[0, 0, :, 3], 15.0)


def test_build_cost_volume_left_minus_right():
    rng = np.random.RandomState(0)
    fl = jnp.asarray(rng.randn(1, 16, 20, 32), jnp.float32)
    fr = jnp.asarray(rng.randn(1, 16, 20, 32), jnp.float32)
    rois = jnp.asarray(np.tile([[2.0, 2.0, 10.0, 10.0]], (1, 2, 3, 1)))
    cost = build_cost_volume(fl, fr, rois, rois, 4)
    assert cost.shape == (2, 3, 4, 4, 96)
    c = np.asarray(cost)
    np.testing.assert_allclose(c[..., 64:], c[..., :32] - c[..., 32:64],
                               rtol=1e-4, atol=1e-5)


def test_cv_topk_caps_cost_volume(model_and_vars):
    """cv_topk: top score-ordered slots get cost-volume depth identical to
    the uncapped run (BN eval mode => per-slot independence); tail slots
    fall back to decoded-disparity depth."""
    model, variables = model_and_vars
    import dataclasses
    m_full = dataclasses.replace(model, cv_topk=0)
    m_cap = dataclasses.replace(model, cv_topk=4)
    batch = _batch()
    out_full = m_full.apply(variables, batch, use_cost_volume=True,
                            target=None, train=False)
    out_cap = m_cap.apply(variables, batch, use_cost_volume=True,
                          target=None, train=False)
    assert out_full["depth"].shape == out_cap["depth"].shape == (1, 8, 1)
    np.testing.assert_allclose(np.asarray(out_cap["depth"][:, :4]),
                               np.asarray(out_full["depth"][:, :4]),
                               atol=1e-4)
    # tail = disparity depth from the decoded boxes
    from side_tpu.ops.decode import bbox_decode
    bbox, bbox_r, valid = bbox_decode(out_full["hm"], out_full["wh"],
                                      out_full["reg"], K=8)
    cl = (np.asarray(bbox)[..., 0] + np.asarray(bbox)[..., 2]) / 2
    cr = (np.asarray(bbox_r)[..., 0] + np.asarray(bbox_r)[..., 2]) / 2
    disp = (cl - cr) * 4
    exp = 380.0 / np.where(np.abs(disp) < 1e-3, 1e-3, disp)
    exp = exp * np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out_cap["depth"][0, 4:, 0]),
                               exp[0, 4:], rtol=1e-4, atol=1e-4)


def test_folded_bn_bf16_large_mean_parity():
    """FoldedBatchNorm at bfloat16 must stay accurate when |mean| >> std:
    the folded constant b = bias - mean*a is large there, and a single
    bf16 cast of b would inject absolute error ~|b|*2^-9 into the O(1)
    normalised output (ADVICE r4 medium).  The hi+lo split must keep the
    result within bf16-resolution tolerance of flax nn.BatchNorm."""
    import flax.linen as nn
    from side_tpu.models.dla import FoldedBatchNorm

    rng = np.random.RandomState(0)
    C = 32
    # large per-channel mean, small std: worst case for the fold
    mean = rng.uniform(200.0, 800.0, C).astype(np.float32)
    std = rng.uniform(0.05, 0.5, C).astype(np.float32)
    x = (mean + std * rng.randn(4, 8, 8, C)).astype(np.float32)

    folded = FoldedBatchNorm(use_running_average=True, dtype=jnp.bfloat16)
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.bfloat16)
    scale = rng.uniform(0.5, 2.0, C).astype(np.float32)
    bias = rng.uniform(-1.0, 1.0, C).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean),
                        "var": jnp.asarray(std ** 2)},
    }
    got = np.asarray(folded.apply(variables, jnp.asarray(x)),
                     np.float32)
    want = np.asarray(ref.apply(variables, jnp.asarray(x)), np.float32)
    assert got.dtype == want.dtype
    # outputs are O(1); bf16 resolution there is ~2^-8 = 0.004.  Allow a
    # few ulps of divergence from the different evaluation orders, but
    # nothing like the |b|*2^-9 ~ 2.0 error of the single-cast fold.
    err = np.abs(got - want)
    assert float(err.max()) < 0.15, float(err.max())
    assert float(err.mean()) < 0.03, float(err.mean())


def test_s2d_stem_parity(monkeypatch):
    """The space-to-depth stem must be mathematically identical to the
    plain full-res stem: same parameter tree, same outputs, same batch
    statistics, same gradients (DLA.__call__ s2d branch; kernels expanded
    by _s2d_kernel from the SAME weights)."""
    from side_tpu.models.dla import DLA

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 64, 3), jnp.float32)
    model = DLA(dtype=jnp.float32)
    monkeypatch.setenv("SIDE_TPU_STEM", "plain")
    vs = model.init(jax.random.PRNGKey(1), x)
    # randomise running stats so the eval path is exercised too
    bs = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            np.random.RandomState(9).uniform(0.1, 0.9, v.shape), v.dtype),
        vs["batch_stats"])
    vs = {"params": vs["params"], "batch_stats": bs}

    def run(train):
        outs = {}
        for mode in ("plain", "s2d"):
            # "s2d_always": the default "s2d" policy is eval-only (the
            # train-program compile budget, see DLA.__call__); parity of
            # the TRAIN path needs the explicit opt-in
            monkeypatch.setenv("SIDE_TPU_STEM",
                               "s2d_always" if mode == "s2d" else mode)
            if train:
                outs[mode] = model.apply(vs, x, train=True,
                                         mutable=["batch_stats"])
            else:
                outs[mode] = (model.apply(vs, x), None)
        return outs

    for train in (False, True):
        o = run(train)
        for a, b in zip(o["plain"][0], o["s2d"][0]):
            # different conv accumulation order => reassociation noise;
            # train mode amplifies it through 6 levels of fresh batch-stat
            # normalisation (a convention bug would be O(1) everywhere)
            tol = 5e-4 if not train else 1e-2
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2 if train else 1e-3,
                                       atol=tol)
        if train:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4),
                o["plain"][1], o["s2d"][1])

    # gradient parity through the stem parameters.  The loss reads the
    # stem-adjacent outputs only: deeper levels re-normalise by fresh
    # batch statistics at tiny spatial extents, which chaotically
    # amplifies reassociation noise (isolated: stem-local grads agree to
    # ~1e-5; a convention bug would be O(1))
    def loss(params, mode):
        monkeypatch.setenv("SIDE_TPU_STEM",
                           "s2d_always" if mode == "s2d" else mode)
        outs, _ = model.apply({"params": params, "batch_stats": bs}, x,
                              train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o * o) for o in outs[1:3])

    g_plain = jax.grad(loss)(vs["params"], "plain")
    g_s2d = jax.grad(loss)(vs["params"], "s2d")
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_s2d)
    for (pa, a), (_, b) in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(pa))
