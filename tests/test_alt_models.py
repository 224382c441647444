"""Alternative backbone families: resdcn stereo + monocular legacy nets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.config import Config
from side_tpu.models import create_model
from side_tpu.models.resnet_dcn import StereoResNet
from side_tpu.models.legacy import MonoDLA, MonoResNet

H, W = 64, 128


def test_factory_families():
    cfg = Config(input_h=H, input_w=W, compute_dtype="float32")
    assert isinstance(create_model(cfg.replace(arch="resdcn_18")),
                      StereoResNet)
    assert isinstance(create_model(cfg.replace(arch="res_18")), MonoResNet)
    assert isinstance(create_model(cfg.replace(arch="dlav0_34")), MonoDLA)
    with pytest.raises(ValueError):
        create_model(cfg.replace(arch="hourglass_104"))


@pytest.mark.slow
def test_stereo_resnet_forward():
    cfg = Config(input_h=H, input_w=W, compute_dtype="float32",
                 arch="resdcn_18")
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "input": jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
        "input_right": jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out["hm"].shape == (1, H // 4, W // 4, 3)
    assert out["kept_type"].shape == (1, H // 4, W // 4, 6 * 28)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("arch", [
    "res_18", pytest.param("dlav0_34", marks=pytest.mark.slow)])
def test_mono_legacy_forward(arch):
    cfg = Config(input_h=H, input_w=W, compute_dtype="float32", arch=arch)
    model = create_model(cfg)
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["hm"].shape == (1, H // 4, W // 4, 3)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
