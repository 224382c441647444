"""Hourglass 3D volume and the DLASeg-style model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.config import Config
from side_tpu.models.cost_volume import HourglassVolume
from side_tpu.models.dla_seg import StereoDLASeg
from side_tpu.models import create_model


def test_hourglass_volume_shapes():
    m = HourglassVolume(dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8, 96),
                    jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vs, x)
    # encoder halves twice, decoder restores; channels 96 -> 64
    assert y.shape == (2, 8, 8, 8, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_dla_seg_heads():
    H, W = 64, 128
    cfg = Config(input_h=H, input_w=W, compute_dtype="float32",
                 arch="dlaseg_34")
    model = create_model(cfg)
    assert isinstance(model, StereoDLASeg)
    rng = np.random.RandomState(0)
    batch = {
        "input": jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
        "input_right": jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
    }
    vs = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(vs, batch)
    assert out["hm"].shape == (1, H // 4, W // 4, 3)
    assert "depth" not in out  # no cost volume in this family
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
