"""Batched Gauss-Newton solver vs. a scipy oracle and synthetic geometry."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from side_tpu.data.kitti import box3d_corners, project
from side_tpu.data.synthetic import default_calib, IMG_H, IMG_W
from side_tpu.postprocess import box_solver as BS


def _make_detection(x, y, z, w, h, l, ry):
    """Project a GT 3D box and build solver inputs the way inference does."""
    p2, p3 = default_calib()
    dim_hwl = [h, w, l]
    corners = box3d_corners(dim_hwl, [x, y, z], ry)
    pts_l = project(p2, corners)
    pts_r = project(p3, corners)
    box_l = np.array([pts_l[:, 0].min(), pts_l[:, 1].min(),
                      pts_l[:, 0].max(), pts_l[:, 1].max()], np.float32)
    box_r = np.array([pts_r[:, 0].min(), pts_r[:, 1].min(),
                      pts_r[:, 0].max(), pts_r[:, 1].max()], np.float32)
    alpha = ry - np.arctan2(x, z)
    # perspective keypoint: among bottom corners 0..3, the one that is not a
    # silhouette edge and is in front of the box center plane
    us = pts_l[:4, 0]
    order = np.argsort(us)
    inner = [i for i in range(4) if i not in (order[0], order[-1])
             and corners[i, 2] <= z]
    kpt_type = inner[0] if inner else 0
    kpt_u = us[kpt_type]
    kpts = np.array([box_l[0], box_l[2], kpt_u, kpt_type], np.float32)
    return p2, box_l, box_r, alpha, kpts


def test_viewpoint_sectors():
    vps = np.asarray(BS.viewpoint_from_alpha(jnp.asarray(
        np.radians([-90, -135, 180, -179, 135, 90, 45, 0, -45]))))
    np.testing.assert_array_equal(vps, [0, 1, 2, 2, 3, 4, 5, 6, 7])


def test_kpt_to_alpha_ranges():
    box = jnp.asarray([[100.0, 50.0, 200.0, 120.0]])
    # kpt at the left edge, type 3 -> alpha 0; at right edge -> -pi/2
    a0 = float(BS.kpt_to_alpha(jnp.asarray([100.0]), jnp.asarray([3.0]),
                               box)[0])
    a1 = float(BS.kpt_to_alpha(jnp.asarray([200.0]), jnp.asarray([3.0]),
                               box)[0])
    assert a0 == pytest.approx(0.0, abs=1e-6)
    assert a1 == pytest.approx(-math.pi / 2, abs=1e-6)


@pytest.mark.parametrize("pose", [
    (1.5, 1.62, 14.0, 0.4),
    (-3.0, 1.58, 25.0, 2.0),
    (0.5, 1.65, 9.0, -1.2),
])
def test_solver_recovers_gt_pose(pose):
    """With perfect observations and the true depth, the 3-DoF solve must
    recover (x, y, theta) closely."""
    x, y, z, ry = pose
    w, h, l = 1.63, 1.53, 3.88
    p2, box_l, box_r, alpha, kpts = _make_detection(x, y, z, w, h, l, ry)
    consts = BS.build_consts(
        np.array([IMG_W, IMG_H], np.float32), jnp.asarray(p2, jnp.float32),
        0.54, jnp.asarray([alpha], jnp.float32),
        jnp.asarray([[w, h, l]], jnp.float32),
        jnp.asarray(box_l[None], jnp.float32),
        jnp.asarray(box_r[None], jnp.float32),
        jnp.asarray(kpts[None], jnp.float32), use_right=False)
    states = np.asarray(BS.solve_x_y_theta(consts,
                                           jnp.asarray([z], jnp.float32)))
    sx, sy, st = states[0]
    # theta parameterisation is ry + pi/2
    st = st - math.pi / 2
    assert sx == pytest.approx(x, abs=0.25)
    assert sy == pytest.approx(y, abs=0.25)
    err = (st - ry + np.pi) % (2 * np.pi) - np.pi
    assert abs(err) < 0.12


def test_solver_matches_scipy_newton():
    """Oracle: the same residual system minimised by scipy (reference uses
    Newton-CG on it, box_estimator.py:547)."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    x, y, z, ry = 2.0, 1.6, 18.0, 0.8
    w, h, l = 1.6, 1.5, 3.9
    p2, box_l, box_r, alpha, kpts = _make_detection(x, y, z, w, h, l, ry)
    consts = BS.build_consts(
        np.array([IMG_W, IMG_H], np.float32), jnp.asarray(p2, jnp.float32),
        0.54, jnp.asarray([alpha], jnp.float32),
        jnp.asarray([[w, h, l]], jnp.float32),
        jnp.asarray(box_l[None], jnp.float32),
        jnp.asarray(box_r[None], jnp.float32),
        jnp.asarray(kpts[None], jnp.float32), use_right=False)

    import jax
    c1 = jax.tree.map(lambda a: jnp.asarray(a)[0] if np.ndim(a) else a,
                      consts)

    def cost(s):
        r = BS._residuals_xytheta(jnp.asarray(s, jnp.float32),
                                  jnp.float32(z), c1)
        return float(jnp.sum(r ** 2))

    init = [z * float(c1.left_u + c1.right_u) / 2,
            z * float(c1.bottom_v + c1.top_v) / 2 + h / 2,
            float(c1.alpha) + math.pi / 2]
    res = scipy_opt.minimize(cost, init, method="Nelder-Mead",
                             options={"xatol": 1e-6, "fatol": 1e-10,
                                      "maxiter": 2000})
    ours = np.asarray(BS.solve_x_y_theta(consts,
                                         jnp.asarray([z], jnp.float32)))[0]
    np.testing.assert_allclose(ours, res.x, atol=0.05)


def test_truncated_detection_uses_alpha():
    """A left-truncated box must switch off the left-edge and keypoint
    residuals and keep alpha (box_estimator.py:428-478 semantics)."""
    p2, _ = default_calib()
    box_l = np.array([[2.0, 100.0, 300.0, 250.0]], np.float32)  # ul < 20
    box_r = np.array([[0.0, 100.0, 280.0, 250.0]], np.float32)
    consts = BS.build_consts(
        np.array([IMG_W, IMG_H], np.float32),
        jnp.asarray(p2[0], jnp.float32) if False else jnp.asarray(
            default_calib()[0], jnp.float32),
        0.54, jnp.asarray([0.5], jnp.float32),
        jnp.asarray([[1.6, 1.5, 3.9]], jnp.float32),
        jnp.asarray(box_l, jnp.float32), jnp.asarray(box_r, jnp.float32),
        jnp.asarray([[2.0, 300.0, 150.0, 1.0]], jnp.float32),
        use_right=False)
    assert float(consts.m_ul[0]) == 0.0
    assert float(consts.m_uk[0]) == 0.0
    assert float(consts.m_alpha[0]) == 1.0
    # alpha must be the regressed one, not the kpt-derived one
    assert float(consts.alpha[0]) == pytest.approx(0.5)
    states = np.asarray(BS.solve_x_y_theta(consts,
                                           jnp.asarray([12.0], jnp.float32)))
    assert np.isfinite(states).all()


def test_solve_4dof_runs():
    x, y, z, ry = 1.0, 1.6, 20.0, 0.3
    w, h, l = 1.6, 1.5, 3.9
    p2, box_l, box_r, alpha, kpts = _make_detection(x, y, z, w, h, l, ry)
    consts = BS.build_consts(
        np.array([IMG_W, IMG_H], np.float32), jnp.asarray(p2, jnp.float32),
        0.54, jnp.asarray([alpha], jnp.float32),
        jnp.asarray([[w, h, l]], jnp.float32),
        jnp.asarray(box_l[None], jnp.float32),
        jnp.asarray(box_r[None], jnp.float32),
        jnp.asarray(kpts[None], jnp.float32), use_right=True)
    states, status = BS.solve_x_y_z_theta(consts,
                                          jnp.asarray([z + 2.0], jnp.float32))
    states = np.asarray(states)
    assert status[0] == 1
    assert states[0, 2] == pytest.approx(z, abs=1.5)
