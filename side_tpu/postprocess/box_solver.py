"""Batched geometric-constraint 3D box solver.

Re-design of the reference's per-detection scipy Newton-CG solver
(/root/reference/src/lib/utils/box_estimator.py): the same Stereo-RCNN-style
reprojection residuals — 2D box edges, the perspective keypoint, and the
viewpoint angle, with truncation-aware masking (:203-264, :466-508) — but
solved as a damped Gauss-Newton over a fixed iteration count, vmapped over
all detections at once.  Jacobians come from `jax.jacfwd` on the residual
vector instead of the hand-coded derivatives (:268-371), and the whole
solve jits onto the device, eliminating the serial CPU loop flagged in
SURVEY.md §3.5.

Viewpoint/vertex discretisation (box_estimator.py:6-158) is encoded as sign
tables; alpha is in the KITTI observation-angle convention.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# sign tables: per viewpoint, the (w, l) signs of the 3D vertex that
# projects to the left / right / bottom edge of the 2D box
# (box_estimator.py:82-115; viewpoint 8 = the "else" fallback)
_LEFT_W = np.array([-1, -1, -1, 1, 1, 1, 1, -1], np.float32)
_LEFT_L = np.array([-1, 1, 1, 1, 1, -1, -1, -1], np.float32)
_RIGHT_W = np.array([1, 1, -1, -1, -1, -1, 1, 1], np.float32)
_RIGHT_L = np.array([-1, -1, -1, -1, 1, 1, 1, 1], np.float32)
_BOT_W = np.array([1, -1, -1, -1, -1, 1, 1, 1], np.float32)
_BOT_L = np.array([-1, -1, -1, 1, 1, 1, 1, -1], np.float32)
# keypoint type -> vertex signs (box_estimator.py:117-138)
_KPT_W = np.array([-1, -1, 1, 1], np.float32)
_KPT_L = np.array([-1, 1, 1, -1], np.float32)


def viewpoint_from_alpha(alpha: jnp.ndarray) -> jnp.ndarray:
    """Discretise the viewpoint angle into 8 sectors with a 4-degree
    boundary band (box_estimator.py:6-32).  Vectorised."""
    deg = alpha * (180.0 / math.pi)
    deg = jnp.where(deg > 360.0, deg - 360.0, deg)
    deg = jnp.where(deg < -360.0, deg + 360.0, deg)
    t = 4.0
    vp = jnp.full(deg.shape, 7, jnp.int32)  # default: else-branch vertex set
    conds = [
        ((deg >= -90 - t) & (deg <= -90 + t), 0),
        ((deg >= -180 + t) & (deg <= -90 - t), 1),
        ((deg >= 180 - t) | (deg <= -180 + t), 2),
        ((deg >= 90 + t) & (deg <= 180 - t), 3),
        ((deg >= 90 - t) & (deg <= 90 + t), 4),
        ((deg >= 0 + t) & (deg <= 90 - t), 5),
        ((deg >= 0 - t) & (deg <= 0 + t), 6),
        ((deg >= -90 + t) & (deg <= 0 - t), 7),
    ]
    for cond, v in conds:
        vp = jnp.where(cond, v, vp)
    return vp


def kpt_to_alpha(kpt_pos: jnp.ndarray, kpt_type: jnp.ndarray,
                 box: jnp.ndarray) -> jnp.ndarray:
    """Approximate viewpoint angle from the keypoint position within the box
    (box_estimator.py:140-158)."""
    width = jnp.maximum(box[..., 2] - box[..., 0], 1e-6)
    s = jnp.arcsin(jnp.clip((kpt_pos - box[..., 0]) / width, -1.0, 1.0))
    base = jnp.stack([jnp.full_like(s, -math.pi / 2),
                      jnp.full_like(s, math.pi),
                      jnp.full_like(s, math.pi / 2),
                      jnp.zeros_like(s)], axis=-1)
    kt = jnp.clip(kpt_type.astype(jnp.int32), 0, 3)
    return jnp.take_along_axis(base, kt[..., None], axis=-1)[..., 0] - s


class SolveConsts(NamedTuple):
    """Per-detection constants of the residual system."""
    left_u: jnp.ndarray
    right_u: jnp.ndarray
    top_v: jnp.ndarray
    bottom_v: jnp.ndarray
    kpt_u: jnp.ndarray
    left_u_r: jnp.ndarray   # right-image edges (4-DoF solve only)
    right_u_r: jnp.ndarray
    alpha: jnp.ndarray
    h: jnp.ndarray
    bl: jnp.ndarray
    lw: jnp.ndarray
    ll: jnp.ndarray
    rw: jnp.ndarray
    rl: jnp.ndarray
    bw: jnp.ndarray
    bot_l: jnp.ndarray
    kw: jnp.ndarray
    kl: jnp.ndarray
    m_ul: jnp.ndarray       # residual on/off masks (truncation handling)
    m_ur: jnp.ndarray
    m_uk: jnp.ndarray
    m_vt: jnp.ndarray
    m_vb: jnp.ndarray
    m_alpha: jnp.ndarray
    m_ul_r: jnp.ndarray
    m_ur_r: jnp.ndarray


def build_consts(im_shape, calib_p2, bl, alpha, dim_whl, box_left, box_right,
                 kpts, use_right: bool, grid: int = 28) -> SolveConsts:
    """Normalise image observations and pick vertex tables.

    dim_whl: (N, 3) as (w, h, l); box_*: (N, 4); kpts: (N, 4) =
    [border_l_u, border_r_u, kpt_u, kpt_type] in pixels.  `grid` is the
    kept_type label quantisation (cfg.grid; 28 in the reference).
    """
    f = calib_p2[0, 0]
    cx, cy = calib_p2[0, 2], calib_p2[1, 2]
    w_max, h_max = im_shape[0], im_shape[1]
    tb = 10.0

    ul, vt, ur, vb = (box_left[:, 0], box_left[:, 1], box_left[:, 2],
                      box_left[:, 3])
    ul_r, ur_r = box_right[:, 0], box_right[:, 2]
    w, h, l = dim_whl[:, 0], dim_whl[:, 1], dim_whl[:, 2]
    kpt_pos, kpt_type = kpts[:, 2], kpts[:, 3]

    truncated = (ul < 2 * tb) | (ur > w_max - 2 * tb)
    # Degenerate keypoint label: objects with NO visible perspective
    # keypoint (e.g. near-frontal/rear cars whose middle corner lands on a
    # silhouette edge) are trained to (type 0, cell 0) — the reference's
    # computeKeptLabel clamps the all-invisible case to zero
    # (stereoTrainer.py:85-94).  kpt_to_alpha would misread that as
    # alpha ~ -90deg and pick the wrong vertex table, sending the solve to
    # a basin ~pi/2 away (caught by the fixture-overfit AP test).  Treat it
    # like truncation: drop the keypoint residual, trust the regressed
    # alpha.
    # expressed in label grid cells so the guard tracks the quantisation:
    # a (type 0, cell 0) label decodes to cell center 0.5/grid, so anything
    # that rounds back to cell 0 (< 1/grid) is the degenerate encoding
    width_l = jnp.maximum(ur - ul, 1e-6)
    kpt_cell = (kpt_pos - ul) / width_l * grid
    degenerate = (kpt_type.astype(jnp.int32) == 0) & (kpt_cell < 1.0)
    no_kpt = truncated | degenerate
    alpha_eff = jnp.where(no_kpt, alpha,
                          kpt_to_alpha(kpt_pos, kpt_type, box_left))
    vp = viewpoint_from_alpha(alpha_eff)

    lt = lambda tab: jnp.asarray(tab)[vp]
    kt = jnp.clip(kpt_type.astype(jnp.int32), 0, 3)

    ones = jnp.ones_like(ul)
    m_uk = jnp.where(no_kpt, 0.0, ones)          # keypoint only if visible
    m_alpha = jnp.where(no_kpt, ones, 0.0)       # alpha when kpt unusable
    m_right = m_alpha if use_right else jnp.zeros_like(ones)

    return SolveConsts(
        left_u=(ul - cx) / f, right_u=(ur - cx) / f,
        top_v=(vt - cy) / f, bottom_v=(vb - cy) / f,
        kpt_u=(kpt_pos - cx) / f,
        left_u_r=(ul_r - cx) / f, right_u_r=(ur_r - cx) / f,
        alpha=alpha_eff, h=h, bl=jnp.full_like(ul, bl),
        lw=lt(_LEFT_W) * w / 2, ll=lt(_LEFT_L) * l / 2,
        rw=lt(_RIGHT_W) * w / 2, rl=lt(_RIGHT_L) * l / 2,
        bw=lt(_BOT_W) * w / 2, bot_l=lt(_BOT_L) * l / 2,
        kw=jnp.asarray(_KPT_W)[kt] * w / 2, kl=jnp.asarray(_KPT_L)[kt] * l / 2,
        m_ul=jnp.where(ul < 2 * tb, 0.0, ones),
        m_ur=jnp.where(ur > w_max - 2 * tb, 0.0, ones),
        m_uk=m_uk,
        m_vt=jnp.where(vt < tb, 0.0, ones),
        m_vb=jnp.where(vb > h_max - tb, 0.0, ones),
        m_alpha=m_alpha,
        m_ul_r=m_right * jnp.where(ul_r < 2 * tb, 0.0, ones),
        m_ur_r=m_right * jnp.where(ur_r > w_max - 2 * tb, 0.0, ones),
    )


def _edge_u(x, z, theta, vw, vl):
    """Projected u of the box vertex (vw, vl) at pose (x, z, theta)."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    return (x + c * vw + s * vl) / (z - s * vw + c * vl)


def _residuals_xytheta(state, z, c: SolveConsts):
    """3-DoF residual vector (box_estimator.py:451-480), z fixed."""
    x, y, theta = state[0], state[1], state[2]
    s, ct = jnp.sin(theta), jnp.cos(theta)
    r_ul = (_edge_u(x, z, theta, c.lw, c.ll) - c.left_u) * c.m_ul
    r_ur = (_edge_u(x, z, theta, c.rw, c.rl) - c.right_u) * c.m_ur
    r_uk = 2.0 * (_edge_u(x, z, theta, c.kw, c.kl) - c.kpt_u) * c.m_uk
    r_vb = (y / (z - s * c.bw + ct * c.bot_l) - c.bottom_v) * c.m_vb
    r_vt = ((y - c.h) / (z + s * c.bw - ct * c.bot_l) - c.top_v) * c.m_vt
    r_a = (theta - math.pi / 2 + jnp.arctan2(-x, z) - c.alpha) * c.m_alpha
    return jnp.stack([r_ul, r_ur, r_uk, r_vb, r_vt, r_a])


def _residuals_xyztheta(state, c: SolveConsts):
    """4-DoF residual vector (box_estimator.py:227-266) including the
    right-image box edges."""
    x, y, z, theta = state[0], state[1], state[2], state[3]
    r3 = _residuals_xytheta(jnp.stack([x, y, theta]), z, c)
    r_ul_r = (_edge_u(x - c.bl, z, theta, c.lw, c.ll) - c.left_u_r) * c.m_ul_r
    r_ur_r = (_edge_u(x - c.bl, z, theta, c.rw, c.rl) - c.right_u_r) * c.m_ur_r
    return jnp.concatenate([r3, jnp.stack([r_ul_r, r_ur_r])])


def _gauss_newton(res_fn, x0, num_iters: int = 20, damping: float = 1e-4):
    """Damped Gauss-Newton on a residual vector; jacobian via jacfwd."""
    def body(_, x):
        r = res_fn(x)
        J = jax.jacfwd(res_fn)(x)
        JtJ = J.T @ J
        g = J.T @ r
        n = x.shape[0]
        step = jnp.linalg.solve(JtJ + damping * jnp.eye(n), g)
        x_new = x - step
        # reject non-finite or cost-increasing steps (robustness vs scipy's
        # line-searching Newton-CG)
        ok = jnp.isfinite(x_new).all() & (
            jnp.sum(res_fn(x_new) ** 2) <= jnp.sum(r ** 2) + 1e-9)
        return jnp.where(ok, x_new, x)
    return jax.lax.fori_loop(0, num_iters, body, x0)


@partial(jax.jit, static_argnames=("num_iters",))
def solve_x_y_theta(consts: SolveConsts, z: jnp.ndarray,
                    num_iters: int = 20) -> jnp.ndarray:
    """Batched 3-DoF pose refinement (box_estimator.py:388-548).

    z: (N,) depth from the aligned disparity.  Returns (N, 3) = (x, y, theta).
    """
    init_x = z * (consts.left_u + consts.right_u) / 2.0
    init_y = z * (consts.bottom_v + consts.top_v) / 2.0 + consts.h / 2.0
    init_t = (consts.alpha + math.pi / 2 - jnp.arctan2(-init_x, z))
    x0 = jnp.stack([init_x, init_y, init_t], axis=-1)

    def solve_one(x0_i, z_i, c_i):
        return _gauss_newton(lambda s: _residuals_xytheta(s, z_i, c_i), x0_i,
                             num_iters)
    return jax.vmap(solve_one)(x0, z, consts)


@partial(jax.jit, static_argnames=("num_iters",))
def solve_x_y_z_theta(consts: SolveConsts, depth: jnp.ndarray,
                      num_iters: int = 25) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched 4-DoF initial solve (box_estimator.py:160-386).

    Returns (states (N, 4), status (N,) — 0 when z>100, :384-386)."""
    init_x = depth * (consts.left_u + consts.right_u) / 2.0
    init_y = depth * (consts.bottom_v + consts.top_v) / 2.0 + consts.h / 2.0
    init_t = (consts.alpha + math.pi / 2 - jnp.arctan2(-init_x, depth))
    x0 = jnp.stack([init_x, init_y, depth, init_t], axis=-1)

    def solve_one(x0_i, c_i):
        return _gauss_newton(lambda s: _residuals_xyztheta(s, c_i), x0_i,
                             num_iters)
    states = jax.vmap(solve_one)(x0, consts)
    status = (states[:, 2] <= 100.0).astype(jnp.int32)
    return states, status
