import numpy as np
import pytest

import jax.numpy as jnp

from side_tpu.ops.psroi_pool import psroi_pool


def test_constant_channels_position_sensitive_selection():
    """With feature channel k filled with value k, output bin (i, j) of out
    channel c must equal the position-sensitive channel (c*G+gy)*G+gx."""
    B, H, W = 1, 16, 16
    D, G, P = 2, 2, 4
    C = D * G * G
    feat = np.zeros((B, H, W, C), np.float32)
    for k in range(C):
        feat[..., k] = float(k)
    rois = np.array([[2.0, 2.0, 13.0, 13.0]], np.float32)
    out = np.asarray(psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                jnp.zeros(1, jnp.int32), P, D, G))
    assert out.shape == (1, P, P, D)
    for c in range(D):
        for i in range(P):
            for j in range(P):
                gy, gx = (i * G) // P, (j * G) // P
                expect = (c * G + gy) * G + gx
                assert out[0, i, j, c] == pytest.approx(expect, abs=1e-4)


def test_trans_offsets_shift_sampling():
    B, H, W = 1, 16, 16
    D, G, P = 1, 1, 2
    feat = np.zeros((B, H, W, 1), np.float32)
    feat[0, :, :, 0] = np.arange(W)[None, :]  # value == column index
    rois = np.array([[4.0, 4.0, 11.0, 11.0]], np.float32)
    base = np.asarray(psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                 jnp.zeros(1, jnp.int32), P, D, G))
    trans = np.zeros((1, P, P, 2), np.float32)
    trans[..., 1] = 1.0  # dx
    shifted = np.asarray(psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                    jnp.zeros(1, jnp.int32), P, D, G,
                                    trans=jnp.asarray(trans), trans_std=0.1))
    # roi width ~8.x -> shift ~0.8 columns to the right
    delta = shifted - base
    assert np.all(delta > 0.5) and np.all(delta < 1.2)


def test_out_of_image_rois_finite():
    feat = np.random.RandomState(0).randn(2, 8, 8, 4).astype(np.float32)
    rois = np.array([[-5.0, -5.0, 2.0, 2.0], [6.0, 6.0, 20.0, 20.0]],
                    np.float32)
    out = np.asarray(psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                jnp.asarray([0, 1], jnp.int32), 3, 1, 2))
    assert out.shape == (2, 3, 3, 1)
    assert np.isfinite(out).all()
