"""Dense photometric alignment: ray-box geometry and depth recovery."""

import numpy as np
import pytest

import jax.numpy as jnp

from side_tpu.postprocess import dense_align as DA


def test_ray_box_intersect_center_ray():
    # thin box ("wall") 2m wide x 1.5m tall, 0.2m deep at z=10 straight ahead
    pose = jnp.asarray([0.0, 0.75, 10.0, 2.0, 1.5, 0.2, 0.0])
    rays = jnp.asarray([[0.0, 0.0],        # optical axis -> hits front face
                        [0.5, 0.0],        # far off to the side -> miss
                        [0.05, 0.02]])     # slightly off-center -> hit
    dz, valid = DA.ray_box_intersect(pose, rays)
    dz, valid = np.asarray(dz), np.asarray(valid)
    assert valid[0] and valid[2]
    assert not valid[1]
    # front face sits at z - l/2 -> dz ~ -0.1
    assert dz[0] == pytest.approx(-0.1, abs=0.02)


def test_ray_box_intersect_rotated():
    pose = jnp.asarray([1.0, 1.0, 15.0, 1.6, 1.5, 3.9, 0.8])
    # ray towards the box center
    rays = jnp.asarray([[1.0 / 15.0, 1.0 / 15.0 - 0.75 / 15.0]])
    dz, valid = DA.ray_box_intersect(pose, rays)
    assert bool(valid[0])
    assert abs(float(dz[0])) < 3.0  # within the box half-diagonal


def test_sample_grid_spans_lower_half():
    box = jnp.asarray([[100.0, 50.0, 200.0, 150.0]])
    borders = jnp.asarray([[110.0, 190.0]])
    uv, has_span = DA.sample_grid(box, borders)
    uv = np.asarray(uv)
    assert uv.shape == (1, DA.N_V * DA.N_U, 2)
    assert bool(has_span[0])
    assert uv[0, :, 0].min() == pytest.approx(110.0)
    assert uv[0, :, 0].max() == pytest.approx(190.0)
    # rows from mid-height (100) to 10% above the bottom (140)
    assert uv[0, :, 1].min() == pytest.approx(100.0)
    assert uv[0, :, 1].max() == pytest.approx(140.0)


def test_align_recovers_true_depth():
    """Textured wall at z*=12m, stereo pair with exact disparity; start the
    search from a wrong depth (15m) and expect the photometric argmin to pull
    the aligned depth towards z*."""
    rng = np.random.RandomState(0)
    H2, W2 = 192, 384             # already-2x-upsampled image size
    f2, bl = 300.0, 0.5
    cx2, cy2 = W2 / 2, H2 / 2
    z_true = 12.0

    # horizontally-textured left image; right = left shifted by disparity
    xgrid = np.arange(W2, dtype=np.float32)
    tex = (np.sin(xgrid * 0.7) + 0.3 * np.sin(xgrid * 0.23 + 1.0))
    im_l = np.tile(tex[None, :, None], (H2, 1, 3)).astype(np.float32)
    im_l += rng.randn(H2, W2, 3).astype(np.float32) * 0.01
    # right camera: u_r = u_l - disp  =>  im_r(u) = im_l(u + disp)
    disp = f2 * bl / z_true
    xs = xgrid + disp
    x0 = np.floor(xs).astype(int)
    frac = (xs - x0).astype(np.float32)
    x0c = np.clip(x0, 0, W2 - 1)
    x1c = np.clip(x0 + 1, 0, W2 - 1)
    im_r = (im_l[:, x0c] * (1 - frac)[None, :, None] +
            im_l[:, x1c] * frac[None, :, None])

    # wall box: 3m wide, 2m tall, thin; projected 2D box at z_true
    w_m, h_m = 3.0, 2.0
    u_half = f2 * (w_m / 2) / z_true
    v_half = f2 * (h_m / 2) / z_true
    box2x = np.array([[cx2 - u_half, cy2 - v_half,
                       cx2 + u_half, cy2 + v_half]], np.float32)
    borders2x = box2x[:, [0, 2]]
    z_start = 15.0
    poses = np.array([[0.0, h_m / 2, z_start, w_m, h_m, 0.05, 0.0]],
                     np.float32)

    status, best_dis = DA.align_depths(
        jnp.asarray(im_l), jnp.asarray(im_r), jnp.float32(f2),
        jnp.float32(bl), jnp.float32(cx2), jnp.float32(cy2),
        jnp.asarray(box2x), jnp.asarray(borders2x), jnp.asarray(poses),
        jnp.asarray([True]))
    assert float(status[0]) == 1.0
    # disparity returned in ORIGINAL pixels: fb_orig = (f2/2)*bl
    z_rec = (f2 / 2) * bl / (float(best_dis[0]) - 0.5)
    assert abs(z_rec - z_true) < abs(z_start - z_true)
    assert z_rec == pytest.approx(z_true, abs=0.6)


def test_align_invalid_roi_returns_init():
    im = jnp.zeros((64, 128, 3), jnp.float32)
    box = jnp.asarray([[200.0, 10.0, 220.0, 30.0]])  # off-image
    borders = jnp.asarray([[210.0, 205.0]])          # inverted span
    poses = jnp.asarray([[0.0, 1.0, 10.0, 1.6, 1.5, 3.9, 0.0]])
    status, best_dis = DA.align_depths(
        im, im, jnp.float32(100.0), jnp.float32(0.5), jnp.float32(64.0),
        jnp.float32(32.0), box, borders, poses, jnp.asarray([True]))
    # no valid pixels -> status 0 and the initial disparity
    assert float(status[0]) == 0.0
    init = 100.0 * 0.5 / (10.0 * 2.0) + 0.5
    assert float(best_dis[0]) == pytest.approx(init, rel=1e-5)
