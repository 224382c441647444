"""DLA-34 torch->flax weight mapping must cover the trunk exactly."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import convert_dla34_weights as CW
from side_tpu.models.dla import DLA
from side_tpu.runtime.checkpoint import _flatten


@pytest.fixture(scope="module")
def dla_tree():
    model = DLA(dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 64, 3)))
    return variables


def _fake_torch_state(dla_tree):
    """Build a torch-style state_dict with the mapped names, shapes taken
    from our flax tree (kernel transposed back to OIHW)."""
    params = _flatten(jax.device_get(dla_tree["params"]))
    stats = _flatten(jax.device_get(dla_tree["batch_stats"]))
    state = {}
    rng = np.random.RandomState(0)
    for flax_prefix, torch_conv, kind in CW.tree_mapping():
        bn = CW._bn_name(torch_conv, kind)
        k = params[f"{flax_prefix}/Conv_0/kernel"]
        state[torch_conv + ".weight"] = (0.05 * rng.randn(
            *np.transpose(k, (3, 2, 0, 1)).shape)).astype(np.float32)
        n = k.shape[-1]
        state[bn + ".weight"] = (1 + 0.1 * rng.randn(n)).astype(np.float32)
        state[bn + ".bias"] = (0.1 * rng.randn(n)).astype(np.float32)
        state[bn + ".running_mean"] = (0.1 * rng.randn(n)).astype(np.float32)
        state[bn + ".running_var"] = (
            1 + 0.1 * np.abs(rng.randn(n))).astype(np.float32)
    return state


def test_mapping_covers_full_trunk(dla_tree):
    state = _fake_torch_state(dla_tree)
    conv_params, conv_stats = CW.convert(state)

    ours_p = _flatten(jax.device_get(dla_tree["params"]))
    ours_s = _flatten(jax.device_get(dla_tree["batch_stats"]))
    got_p = _flatten(conv_params)
    got_s = _flatten(conv_stats)

    assert set(got_p) == set(ours_p), (
        sorted(set(ours_p) - set(got_p))[:5],
        sorted(set(got_p) - set(ours_p))[:5])
    assert set(got_s) == set(ours_s)
    for k in ours_p:
        assert got_p[k].shape == ours_p[k].shape, k
    for k in ours_s:
        assert got_s[k].shape == ours_s[k].shape, k


def test_converted_weights_change_forward(dla_tree):
    """Applying converted weights must change the trunk output (values are
    actually loaded, not silently dropped)."""
    state = _fake_torch_state(dla_tree)
    conv_params, conv_stats = CW.convert(state)
    model = DLA(dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 64, 3), jnp.float32)
    y0 = model.apply(dla_tree, x)[-1]
    y1 = model.apply({"params": conv_params, "batch_stats": conv_stats}, x)[-1]
    assert float(jnp.abs(y0 - y1).max()) > 1e-3


def test_torch_bn_names():
    assert CW._bn_name("base_layer.0", "convbn") == "base_layer.1"
    assert CW._bn_name("level2.tree1.conv1", "convbn") == "level2.tree1.bn1"
    assert CW._bn_name("level2.project.0", "convbn_proj") == "level2.project.1"
    assert CW._bn_name("level2.root.conv", "convbn_root") == "level2.root.bn"


def test_convert_matches_reference_torch_trunk():
    """REAL converter validation (VERDICT r2 next #7): instantiate the
    reference DLA-34 trunk on torch CPU
    (feature_extraction_dla34.py:224-315, DCNv2 import stubbed), randomise
    its full state dict (weights + BN running stats), convert, and assert
    level-by-level output agreement torch-vs-flax in eval mode.  This
    validates conv layout (OIHW->HWIO) and BN eps/stat semantics — SURVEY
    hard part (d) — against the actual reference module, not a synthetic
    name list."""
    import types
    ref_lib = "/root/reference/src/lib"
    if ref_lib not in sys.path:
        sys.path.insert(0, ref_lib)
    import torch

    # the module does `from .DCNv2.dcn_v2 import DCN` at import time; the
    # trunk itself (DLA class) never instantiates it
    dcn_pkg = types.ModuleType("models.networks.DCNv2")
    dcn_mod = types.ModuleType("models.networks.DCNv2.dcn_v2")
    dcn_mod.DCN = type("DCN", (), {})
    sys.modules.setdefault("models.networks.DCNv2", dcn_pkg)
    sys.modules.setdefault("models.networks.DCNv2.dcn_v2", dcn_mod)
    from models.networks import feature_extraction_dla34 as ref_dla

    tmodel = ref_dla.dla34(pretrained=False)
    tmodel.eval()
    # randomise BN running stats so stat conversion is actually exercised
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, buf in tmodel.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=gen))
            elif name.endswith("running_var"):
                buf.copy_(1 + 0.3 * torch.rand(buf.shape, generator=gen))

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()
             if hasattr(v, "numpy")}
    conv_params, conv_stats = CW.convert(state)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 32, 64).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tmodel(torch.tensor(x))]

    model = DLA(dtype=jnp.float32)
    got = model.apply({"params": conv_params, "batch_stats": conv_stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 6
    for lvl, (g, w) in enumerate(zip(got, want)):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape == w.shape, (lvl, g.shape, w.shape)
        np.testing.assert_allclose(g, w, atol=2e-4,
                                   err_msg=f"DLA level {lvl}")
