"""Pallas TPU backward kernels for the windowed deformable convolution.

The training-step profile made the backward the wall: with the Pallas
forward in place, the XLA windowed VJP (autodiff of
deform_conv2d_windowed's 324 shifted multiply-accumulates, reference
col2im/col2im_coord kernels dcn_v2_im2col_cuda.cu:197,256) left the train
step at ~645 ms/batch-2 — ~500 ms of it DCN backward.  These kernels
replace it for the batch-packed (C<=128) layers that carry ~85% of the
DCN work; the rest falls back to the XLA VJP.

Two kernels, mirroring the forward's batch-packed lane layout
(c-major lanes, lane = c*P + b — see dcn_pallas._dcn_kernel_packed):

* d_x ("col2im"): an ALL-READ formulation — no scatters.  Each input
  pixel p receives Sum_{k,s} tri_y(dy_k[q]) tri_x(dx_k[q]) mask_k[q]
  (g W_k^T)[q] over q = p - tap_k - s, so with g/offset/mask padded by
  the halo every contribution is a STATIC slice of halo-wide planes:
  per (k, s) one plane z = wy*wx*u_k is built, then added at 9 static
  tap shifts.  g W_k^T is one block-diagonal MXU matmul per tap.
* d_offset/d_mask/d_weight ("col2im_coord"): recomputes the forward
  column accumulation with two extra derivative accumulators
  (d tri = -sign inside the unit support), reduces over each image's
  channel lanes with a 0/1 matrix at HIGHEST precision (the per-image
  reduction is a lane-segment sum), and accumulates d_weight across
  row-tiles in a resident output block.

Gradient semantics match jax.vjp of deform_conv2d_windowed (same clamp
rule: offsets outside [-R, R] get zero gradient), verified in interpret
mode by tests/test_deform_conv.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dcn_pallas as _fwd

# d_offset/d_mask accumulation strategy (SIDE_TPU_DCN_BWD_ACCUM):
# "lerp" (default, round 3): recompute the forward column exactly as the
#   production lerp forward does (base = clip(floor(d), -R, R-1), frac =
#   d - base, where-chain neighbour select) and read the offset gradients
#   off the SAME lerp: d val/d dy = hi - lo of the y-lerp, d val/d dx =
#   y-lerp of the per-row (hi - lo).  This is the exact a.e. derivative of
#   the production forward, ~2.5x fewer CP-wide VPU ops than the triangle
#   expansion, and — critically — NONZERO at integer offsets: the triangle
#   form's tri'(t) = -sign(t)·[|t|<1] is identically zero at d == 0, so
#   zero-initialised DCN offsets get no direct gradient at init (they only
#   drift via the shared offset_mask conv's mask-channel gradients).  The
#   lerp form yields the right-derivative subgradient there, matching what
#   autodiff of the lerp forward would produce.
# "lerp_vc": the lerp body with the per-tap column value and offset
#   derivatives carried as VALUES instead of round-tripped through the
#   four CP-wide VMEM scratch refs.  Standalone it is FASTER (mid 3.24 ->
#   2.76 ms, mid2 4.38 -> 2.29 ms on-chip) — but in-model the longer live
#   ranges blow up the Mosaic/XLA compile: on this image's TPU relay the
#   compile helper is OOM-killed (SIGKILL) on the batch-2 train program
#   (round-5 bisection: value-carry kills it, the ref form compiles).
#   Opt-in for relays with more compile headroom.
# "tri": the round-2 triangle expansion with separable tri' factoring
#   (kept for bisection; zero gradient at integer offsets).
_BWD_ACCUM = _os.environ.get("SIDE_TPU_DCN_BWD_ACCUM", "lerp")

# Roofline probe bodies (SIDE_TPU_DCN_BWD_ROOF, tools/dcn_bwd_roofline.py):
# "" (production), or calibration variants that keep the IDENTICAL kernel
# plumbing (grid, halo windows, scratch, MXU matmuls, outputs) while
# swapping the per-tap arithmetic for bodies of known CP-wide op counts —
# "lerp0" = fixed-neighbour-base bilinear (the op floor of ANY fractional
# backward; not a valid DCN), "copy" = static-window data movement only.
# Mirrors the forward roofline (dcn_pallas._ACCUM lerp0/copy) that pinned
# the forward at <=1.10x its floor.  NEVER valid gradients; test-guarded.
_ROOF = _os.environ.get("SIDE_TPU_DCN_BWD_ROOF", "")


def _lane_reduce(v, P: int):
    """(n, C*P) -> (n, P): sum over each image's C lanes (c-major packing).
    A lane-segment reduction, done as a matmul against a 0/1 matrix at
    HIGHEST precision (default f32 matmuls round through bf16)."""
    n, CP = v.shape
    E = (jax.lax.broadcasted_iota(jnp.int32, (CP, P), 0) % P ==
         jax.lax.broadcasted_iota(jnp.int32, (CP, P), 1)
         ).astype(jnp.float32)
    return jax.lax.dot_general(v, E,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _windows(a, starts, rows: int):
    """(Hp, Wp, L) -> (T, rows, Wp, L): overlapping row windows, one per
    row-tile, materialised in HBM by an XLA gather.  Feeding the kernels
    halo'd TILED blocks instead of whole resident images keeps the kernel
    VMEM footprint per-tile (the resident form double-buffered ~35M of
    g+offset+mask and blew the 96M scope at the big DLA shape)."""
    idx = starts[:, None] + jnp.arange(rows)[None, :]
    return a[idx]


def _dx_kernel(gp_ref, off_ref, mask_ref, wT_ref, dx_ref,
               u_ref, dyE_ref, dxE_ref, acc_ref, *,
               W, C, Cout, P, tile_h, R, G):
    """d_x for one row-tile: all-read halo formulation (see module doc).

    Input row p receives the single contribution z_{k,s}[q] per (tap k,
    shift s) at q = p - (tap_k - 1) - s.  u_k = (g W_k^T) * mask and the
    expanded offsets are staged ONCE per tap into halo-wide scratches;
    every term then reads tile-sized slices at row start 2R+3 - ty - sy
    (dynamic only in the fori index — a supported ref sublane start) and
    evaluates the tri weights on those slices.  An earlier version
    materialised a halo-wide product plane per term: 324 x 5.6M VMEM
    writes per tile, 2.3x slower than the XLA VJP."""
    rows = tile_h + 2 * R + 4
    Wp = W + 2 * G
    CP = P * C
    CoP = P * Cout
    # shifts -R..R only: the s = R+1 triangle term is identically zero for
    # offsets clamped to [-R, R] (tri(d - (R+1)) needs d > R), so the
    # (2R+2)^2 window shrinks to (2R+1)^2 — 16 -> 9 terms at R=1
    S = 2 * R + 1

    g_halo = gp_ref[0]                             # (rows, Wp, CoP)
    offs = off_ref[0]                              # (rows, Wp, 18P) f32
    masks = mask_ref[0]                            # (rows, Wp, 9P) f32

    acc_ref[:] = jnp.zeros((tile_h, W, CP), jnp.float32)
    for k in range(9):
        ty, tx = k // 3, k % 3
        # u_k = (g @ W_k^T) * mask over the whole halo
        gW = jax.lax.dot_general(
            g_halo.reshape(rows * Wp, CoP), wT_ref[k * CoP:(k + 1) * CoP, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(rows, Wp, CP)
        mkE = _fwd._lane_expand(masks[:, :, k * P:(k + 1) * P], C)
        u_ref[:] = gW * mkE
        dyE_ref[:] = _fwd._lane_expand(
            jnp.clip(offs[:, :, 2 * k * P:(2 * k + 1) * P], -R, R), C)
        dxE_ref[:] = _fwd._lane_expand(
            jnp.clip(offs[:, :, (2 * k + 1) * P:(2 * k + 2) * P], -R, R), C)

        if _ROOF == "copy":
            # roofline probe: static-window adds only — identical slice
            # traffic and tap loop, zero weight arithmetic (~3 CP-wide
            # ops/tap/sy vs production ~23)
            def sy_body(i, carry, ty=ty, tx=tx):
                ro = 2 * R + 3 - ty - i
                vy = u_ref[pl.ds(ro, tile_h)]
                for sx in range(-R, R + 1):
                    cx = G + 1 - tx - sx
                    acc_ref[:] = acc_ref[:] + vy[:, cx:cx + W, :]
                return carry

            jax.lax.fori_loop(0, S, sy_body, 0)
        elif _ROOF == "lerp0":
            # roofline probe: fixed-neighbour-base bilinear — the floor of
            # ANY fractional col2im (each tap sample touches exactly 2x2
            # input neighbours); static rows/cols, frac-lerp weights, no
            # abs/max, no 3x3 shift sweep (~16 CP-wide ops/tap)
            for iy in (R, R + 1):
                ro = 2 * R + 3 - ty - iy
                fy = dyE_ref[ro:ro + tile_h]
                wy = fy if iy > R else 1.0 - fy
                vy = wy * u_ref[ro:ro + tile_h]
                fx = dxE_ref[ro:ro + tile_h]
                for sx in (0, 1):
                    cx = G + 1 - tx - sx
                    fxs = fx[:, cx:cx + W, :]
                    wxS = fxs if sx else 1.0 - fxs
                    acc_ref[:] = acc_ref[:] + vy[:, cx:cx + W, :] * wxS
        else:
            def sy_body(i, carry, ty=ty, tx=tx):
                ro = 2 * R + 3 - ty - i
                syf = i.astype(jnp.float32) - R
                wyS = jnp.maximum(
                    0.0, 1.0 - jnp.abs(dyE_ref[pl.ds(ro, tile_h)] - syf))
                vy = wyS * u_ref[pl.ds(ro, tile_h)]     # (tile_h, Wp, CP)
                dxS = dxE_ref[pl.ds(ro, tile_h)]
                for sx in range(-R, R + 1):
                    cx = G + 1 - tx - sx
                    wxS = jnp.maximum(
                        0.0, 1.0 - jnp.abs(dxS[:, cx:cx + W, :] - sx))
                    acc_ref[:] = acc_ref[:] + vy[:, cx:cx + W, :] * wxS
                return carry

            jax.lax.fori_loop(0, S, sy_body, 0)
    dx_ref[0] = acc_ref[:].astype(dx_ref.dtype)


def _dcoord_kernel(x_ref, g_ref, off_ref, mask_ref, wT_ref, w_ref,
                   doff_ref, dmask_ref, dw_ref,
                   x32_ref, *scratch,
                   W, C, Cout, P, tile_h, R, PAD):
    """d_offset / d_mask / d_weight for one row-tile: forward column
    recompute with tri' accumulators (col2im_coord analogue).

    In lerp mode (production) the per-tap column value and its two offset
    derivatives are carried as VALUES — the earlier form round-tripped
    them through three CP-wide VMEM scratch refs per tap (write + read of
    tile_h*W*CP f32 each, 9 taps), pure bandwidth with no reuse.  The tri
    fallback keeps the refs: its fori_loop accumulators must be refs."""
    t = pl.program_id(1)
    CP = P * C
    CoP = P * Cout
    S = 2 * R + 1      # s = R+1 shifts are identically zero (see _dx_kernel)
    if _BWD_ACCUM != "lerp_vc":
        gw_ref, acc_ref, ady_ref, adx_ref = scratch

    x32_ref[:] = x_ref[0].astype(jnp.float32)      # windowed x block
    g_tile = g_ref[0]                              # (tile_h, W, CoP)
    offs = off_ref[0]
    masks = mask_ref[0]

    for k in range(9):
        ty, tx = k // 3, k % 3
        gw = jax.lax.dot_general(
            g_tile.reshape(tile_h * W, CoP),
            wT_ref[k * CoP:(k + 1) * CoP, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(tile_h, W, CP)
        if _BWD_ACCUM not in ("lerp", "lerp_vc"):
            gw_ref[:] = gw

        dy_raw = offs[:, :, 2 * k * P:(2 * k + 1) * P]
        dx_raw = offs[:, :, (2 * k + 1) * P:(2 * k + 2) * P]
        dy = jnp.clip(dy_raw, -R, R)
        dx = jnp.clip(dx_raw, -R, R)
        dyE = _fwd._lane_expand(dy, C)
        dxE = _fwd._lane_expand(dx, C)
        mkE = _fwd._lane_expand(masks[:, :, k * P:(k + 1) * P], C)

        if _ROOF == "copy" and _BWD_ACCUM == "lerp":
            # roofline probe: static center window — one slice read per
            # tap; the value/derivative streams alias it (data-movement +
            # MXU floor; the lane-reduce/d_weight matmuls below run as in
            # production)
            xs = x32_ref[ty + R:ty + R + tile_h]
            c0 = PAD - 1 + tx
            acc = xs[:, c0:c0 + W, :]
            ady_v = acc
            adx = acc
        elif _ROOF == "lerp0" and _BWD_ACCUM == "lerp":
            # roofline probe: fixed-neighbour-base bilinear recompute — the
            # op floor of ANY fractional col2im_coord (2x2 window, frac
            # lerp + derivative reads, no floor/clip/selects): ~12 CP-wide
            # ops/tap vs production ~34
            fy, fx = dyE, dxE
            row = []
            for sy in (0, 1):
                xs = x32_ref[ty + sy + R:ty + sy + R + tile_h]
                c0 = PAD - 1 + tx
                xb = xs[:, c0:c0 + W, :]
                xb1 = xs[:, c0 + 1:c0 + 1 + W, :]
                d = xb1 - xb
                row.append((xb + d * fx, d))
            ady_v = row[1][0] - row[0][0]
            acc = row[0][0] + ady_v * fy
            adx = row[0][1] + (row[1][1] - row[0][1]) * fy
        elif _BWD_ACCUM == "lerp":
            # fori-row select-lerp (production): same math as lerp_vc —
            # recompute the forward column via the select-lerp and read
            # the offset gradients off the SAME lerp (row_val = lo +
            # (hi-lo)·fx, row_dx = hi-lo; y-lerp of row_val is the value,
            # the by-selected (hi-lo) is d/d dy, the y-lerp of row_dx is
            # d/d dx; exact a.e. derivative of the production forward,
            # nonzero at integer offsets) — but the row loop is a
            # fori_loop whose y-selection accumulates into the four VMEM
            # stream refs (vlo/vhi/dlo/dhi).  ~1/3 the unrolled MLIR of
            # the value form: round-5 bisection showed the unrolled lerp
            # body plus the s2d stem together OOM-kill this image's relay
            # compile helper on the batch-2 train program; this form
            # compiles WITH the stem.  Every lane of by lies in [-R, R-1],
            # so each stream ref is fully overwritten per tap (mlo/mhi
            # each hit exactly one row) — no initialisation needed.
            by = jnp.clip(jnp.floor(dyE), -R, R - 1)
            fy = dyE - by
            bx = jnp.clip(jnp.floor(dxE), -R, R - 1)
            fx = dxE - bx
            mx = {b0: bx == b0 for b0 in range(-R + 1, R)}

            def row_body(i, carry, ty=ty, tx=tx, by=by, fx=fx, mx=mx):
                xs = x32_ref[pl.ds(ty + i, tile_h)]
                lo = hi = None
                for b0 in range(-R, R):
                    c0 = PAD - 1 + tx + b0
                    xb = xs[:, c0:c0 + W, :]
                    xb1 = xs[:, c0 + 1:c0 + 1 + W, :]
                    if lo is None:
                        lo, hi = xb, xb1
                    else:
                        lo = jnp.where(mx[b0], xb, lo)
                        hi = jnp.where(mx[b0], xb1, hi)
                d = hi - lo
                rv = lo + d * fx
                syf = i.astype(jnp.float32) - R
                mlo = by == syf
                mhi = by == syf - 1.0
                acc_ref[:] = jnp.where(mlo, rv, acc_ref[:])   # vlo
                ady_ref[:] = jnp.where(mhi, rv, ady_ref[:])   # vhi
                adx_ref[:] = jnp.where(mlo, d, adx_ref[:])    # dlo
                gw_ref[:] = jnp.where(mhi, d, gw_ref[:])      # dhi
                return carry

            jax.lax.fori_loop(0, S, row_body, 0)
            vlo, vhi = acc_ref[:], ady_ref[:]
            dlo, dhi = adx_ref[:], gw_ref[:]
            ady_v = vhi - vlo
            acc = vlo + ady_v * fy
            adx = dlo + (dhi - dlo) * fy
        elif _BWD_ACCUM == "lerp_vc":
            # unrolled value-carried variant (see _BWD_ACCUM): fastest
            # standalone, largest compile
            by = jnp.clip(jnp.floor(dyE), -R, R - 1)
            fy = dyE - by
            bx = jnp.clip(jnp.floor(dxE), -R, R - 1)
            fx = dxE - bx
            # x-base select masks hoisted out of the row loop (see the
            # forward packed kernel)
            mx = {b0: bx == b0 for b0 in range(-R + 1, R)}
            row_val = []
            row_dx = []
            for sy in range(-R, R + 1):
                xs = x32_ref[ty + sy + R:ty + sy + R + tile_h]
                lo = hi = None
                for b0 in range(-R, R):
                    c0 = PAD - 1 + tx + b0
                    xb = xs[:, c0:c0 + W, :]
                    xb1 = xs[:, c0 + 1:c0 + 1 + W, :]
                    if lo is None:
                        lo, hi = xb, xb1
                    else:
                        lo = jnp.where(mx[b0], xb, lo)
                        hi = jnp.where(mx[b0], xb1, hi)
                d = hi - lo
                row_val.append(lo + d * fx)
                row_dx.append(d)
            vlo = vhi = dlo = dhi = None
            for i, b0 in enumerate(range(-R, R)):
                if vlo is None:
                    vlo, vhi = row_val[0], row_val[1]
                    dlo, dhi = row_dx[0], row_dx[1]
                else:
                    m = by == b0
                    vlo = jnp.where(m, row_val[i], vlo)
                    vhi = jnp.where(m, row_val[i + 1], vhi)
                    dlo = jnp.where(m, row_dx[i], dlo)
                    dhi = jnp.where(m, row_dx[i + 1], dhi)
            ady_v = vhi - vlo
            acc = vlo + ady_v * fy
            adx = dlo + (dhi - dlo) * fy
        else:
            wx = [jnp.maximum(0.0, 1.0 - jnp.abs(dxE - s)) for s in
                  range(-R, R + 1)]
            # d tri(t)/dt = -sign(t) on the open unit support (matches the
            # XLA VJP of max(0, 1-|t|) up to measure-zero ties; identically
            # ZERO at integer offsets — see _BWD_ACCUM)
            wxp = [jnp.where(jnp.abs(dxE - s) < 1.0,
                             -jnp.sign(dxE - s), 0.0)
                   for s in range(-R, R + 1)]

            acc_ref[:] = jnp.zeros((tile_h, W, CP), jnp.float32)
            ady_ref[:] = jnp.zeros((tile_h, W, CP), jnp.float32)
            adx_ref[:] = jnp.zeros((tile_h, W, CP), jnp.float32)

            def row_body(i, carry, ty=ty, tx=tx, dyE=dyE, wx=wx, wxp=wxp):
                xs = x32_ref[pl.ds(ty + i, tile_h)]
                syf = i.astype(jnp.float32) - R
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyE - syf))
                wyp = jnp.where(jnp.abs(dyE - syf) < 1.0,
                                -jnp.sign(dyE - syf), 0.0)
                # separable factoring: the (i, j) triangle products split
                # as acc = sum_i wy_i * (sum_j wx_j x_ij) etc., so the
                # inner j-loop runs TWO accumulator streams (row sums
                # rs / rsx) instead of three CP-wide streams per (i, j)
                # term, and the wy*wx per-term product disappears — ~1.8x
                # fewer VPU ops than the naive col2im_coord expansion
                rs = jnp.zeros_like(acc_ref[:])
                rsx = jnp.zeros_like(rs)
                for ix, sx in enumerate(range(-R, R + 1)):
                    cxs = PAD - 1 + tx + sx
                    xsw = xs[:, cxs:cxs + W, :]
                    rs = rs + xsw * wx[ix]
                    rsx = rsx + xsw * wxp[ix]
                acc_ref[:] = acc_ref[:] + wy * rs
                ady_ref[:] = ady_ref[:] + wyp * rs
                adx_ref[:] = adx_ref[:] + wy * rsx
                return carry

            jax.lax.fori_loop(0, S, row_body, 0)
            gw = gw_ref[:]
            acc = acc_ref[:]
            ady_v = ady_ref[:]
            adx = adx_ref[:]

        dmask = _lane_reduce((acc * gw).reshape(tile_h * W, CP), P)
        gmm = gw * mkE
        ddy = _lane_reduce((ady_v * gmm).reshape(tile_h * W, CP), P)
        ddx = _lane_reduce((adx * gmm).reshape(tile_h * W, CP), P)
        # clip rule: zero gradient where the raw offset left [-R, R]
        ddy = ddy.reshape(tile_h, W, P) * \
            (jnp.abs(dy_raw) <= R).astype(jnp.float32)
        ddx = ddx.reshape(tile_h, W, P) * \
            (jnp.abs(dx_raw) <= R).astype(jnp.float32)
        dmask_ref[0, :, :, k * P:(k + 1) * P] = dmask.reshape(tile_h, W, P)
        doff_ref[0, :, :, 2 * k * P:(2 * k + 1) * P] = ddy
        doff_ref[0, :, :, (2 * k + 1) * P:(2 * k + 2) * P] = ddx

        # d_weight: accumulate (cols * mask)^T @ g across tiles
        dwk = jax.lax.dot_general(
            (acc * mkE).reshape(tile_h * W, CP),
            g_tile.reshape(tile_h * W, CoP),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _init(k=k, dwk=dwk):
            dw_ref[k] = dwk

        @pl.when(t != 0)
        def _acc(k=k, dwk=dwk):
            dw_ref[k] = dw_ref[k] + dwk


def _pick_tile_bwd(H: int, W: int, CP: int, R: int, halo: int,
                   n_temps: int):
    """Largest row-tile whose scratch fits the VMEM budget, or None when
    even tile 1 does not fit (callers fall back to the XLA windowed VJP
    rather than hit a Mosaic VMEM failure)."""
    per_row = (W + 2 * (R + 2)) * CP * 4
    # the Mosaic stack runs ~2.2x past this block+temp estimate (see
    # _vmem_request_margin), so pick tiles whose estimate keeps the
    # request inside the 96M scope after that margin.  The further 0.92
    # mirrors the forward picker's headroom: IN-MODEL stacks run a few %
    # past the standalone ones (measured: d_coord at the big train shape
    # fit standalone at tile 8 but needed 97.6M vs the 96M scope
    # in-model; its estimate sat 1% under this budget before the 0.92)
    budget = int(_fwd._VMEM_LIMIT / 2.2 * 0.92)
    for t in (8, 6, 4, 3, 2, 1):
        if H % t == 0 and \
                (t + halo) * per_row * n_temps <= budget:
            return t
    return None


def packed_backward_fits(H: int, W: int, B: int, C: int, R: int) -> bool:
    """True when both backward kernels have a feasible tile at this shape."""
    CP = B * C
    return (_pick_tile_bwd(H, W, CP, R, 2 * R + 4, 8) is not None and
            _pick_tile_bwd(H, W, CP, R, 2 * R + 3, 9) is not None)


def dcn_packed_backward(x, offset18, mask, weight, g, radius: int,
                        parts=("dx", "dcoord")):
    """Pallas backward for the batch-packed configuration.

    Returns (d_x, d_offset18, d_mask, d_weight, d_bias) matching
    jax.vjp of deform_conv2d_windowed.  `parts` restricts which kernels
    run (compile/runtime bisection via tools/dcn_bwd_bench.py); skipped
    cotangents come back as None."""
    B, H, W, C = x.shape
    Cout = weight.shape[-1]
    R = radius
    PAD = 1 + R + 1
    G = R + 2
    CP = B * C
    CoP = B * Cout
    itemsize = jnp.dtype(x.dtype).itemsize

    # shared packed operands (same layout as the forward)
    xP = _fwd._pack_lanes(x)
    gP = _fwd._pack_lanes(g)
    offP = _fwd._pack_lanes(offset18)
    maskP = _fwd._pack_lanes(mask)
    wfull = weight.reshape(9, C, Cout).astype(jnp.float32)
    # rows (cout, b) = g lanes, cols (cin, b) = x lanes, per tap
    wT = _fwd._eye_expand(jnp.swapaxes(wfull, 1, 2), B).reshape(9 * CoP, CP)

    # ---------------------------------------------------------------- d_x
    d_x = None
    if "dx" in parts:
        d_x = _run_dx(x, gP, offP, maskP, wT, B, H, W, C, Cout, R, G,
                      itemsize)

    # ----------------------------------------------- d_offset/mask/weight
    if "dcoord" not in parts:
        return (d_x, None, None, None, None)
    d_offset18, d_mask, d_weight = _run_dcoord(
        x, xP, gP, offP, maskP, wT, wfull, B, H, W, C, Cout, R, PAD,
        itemsize)
    d_bias = g.astype(jnp.float32).sum(axis=(0, 1, 2))
    return (d_x, d_offset18, d_mask, d_weight.astype(weight.dtype), d_bias)


def _run_dx(x, gP, offP, maskP, wT, B, H, W, C, Cout, R, G, itemsize):
    CP = B * C
    CoP = B * Cout
    tile_dx = _pick_tile_bwd(H, W, CP, R, 2 * R + 4, 8)
    Wp = W + 2 * G
    rows = tile_dx + 2 * R + 4
    T = H // tile_dx
    starts = jnp.arange(T) * tile_dx
    # overlapping halo windows of g / offsets / mask, one per row-tile
    gwin = _windows(jnp.pad(gP, ((0, 0), (G, G), (G, G), (0, 0)))[0],
                    starts, rows)
    owin = _windows(jnp.pad(offP, ((0, 0), (G, G), (G, G), (0, 0)))[0],
                    starts, rows)
    mwin = _windows(jnp.pad(maskP, ((0, 0), (G, G), (G, G), (0, 0)))[0],
                    starts, rows)
    vmem_dx = _fwd._vmem_request_margin(
        2 * rows * Wp * (CoP * itemsize + 18 * B * 4 + 9 * B * 4)
        + 9 * CoP * CP * 4 + 2 * tile_dx * W * CP * itemsize
        + rows * Wp * CP * 4 * 6 + tile_dx * W * CP * 4 * 2, 2.2)
    kern = functools.partial(_dx_kernel, W=W, C=C, Cout=Cout, P=B,
                             tile_h=tile_dx, R=R, G=G)
    dxP = pl.pallas_call(
        kern,
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, rows, Wp, CoP), lambda b, t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, Wp, 18 * B), lambda b, t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, Wp, 9 * B), lambda b, t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * CoP, CP), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_dx, W, CP),
                               lambda b, t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, CP), x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, Wp, CP), jnp.float32),
                        pltpu.VMEM((rows, Wp, CP), jnp.float32),
                        pltpu.VMEM((rows, Wp, CP), jnp.float32),
                        pltpu.VMEM((tile_dx, W, CP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_dx),
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * 9 * (2 * R + 2) ** 2 * C * 3 +
            2 * 9 * H * W * CoP * CP,
            bytes_accessed=T * rows * Wp * CoP * itemsize,
            transcendentals=0),
    )(gwin, owin, mwin, wT)
    return _fwd._unpack_lanes(dxP, B)


def _run_dcoord(x, xP, gP, offP, maskP, wT, wfull, B, H, W, C, Cout,
                R, PAD, itemsize):
    CP = B * C
    CoP = B * Cout
    tile_dc = _pick_tile_bwd(H, W, CP, R, 2 * R + 3, 9)
    Wx = W + 2 * PAD
    win_rows = tile_dc + 2 * R + 3
    Tc = H // tile_dc
    # x windows: tile t needs padded rows [t*tile + PAD-1-R, + win_rows)
    xwin = _windows(jnp.pad(xP, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))[0],
                    jnp.arange(Tc) * tile_dc + PAD - 1 - R, win_rows)
    vmem_dc = _fwd._vmem_request_margin(
        2 * win_rows * Wx * CP * itemsize + 9 * CoP * CP * 4
        + 9 * CP * CoP * 4 + 9 * CP * CoP * 4
        + 2 * tile_dc * W * (CoP * itemsize + 27 * B * 4 + 27 * B * 4)
        + win_rows * Wx * CP * 4 + tile_dc * W * CP * 4 * 18, 2.2)
    kern2 = functools.partial(_dcoord_kernel, W=W, C=C, Cout=Cout, P=B,
                              tile_h=tile_dc, R=R, PAD=PAD)
    doffP, dmaskP, dwBig = pl.pallas_call(
        kern2,
        grid=(1, Tc),
        in_specs=[
            pl.BlockSpec((1, win_rows, Wx, CP), lambda b, t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_dc, W, CoP), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_dc, W, 18 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_dc, W, 9 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * CoP, CP), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * CP, CoP), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_dc, W, 18 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_dc, W, 9 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CP, CoP), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, H, W, 18 * B), jnp.float32),
            jax.ShapeDtypeStruct((1, H, W, 9 * B), jnp.float32),
            jax.ShapeDtypeStruct((9, CP, CoP), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((win_rows, Wx, CP), jnp.float32)] +
        ([] if _BWD_ACCUM == "lerp_vc" else
         [pltpu.VMEM((tile_dc, W, CP), jnp.float32)] * 4),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_dc),
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * 9 * (2 * R + 2) ** 2 * C * 6 +
            4 * 9 * H * W * CoP * CP,
            bytes_accessed=Tc * win_rows * Wx * CP * itemsize,
            transcendentals=0),
    )(xwin, gP, offP, maskP, wT,
      _fwd._eye_expand(wfull, B).reshape(9 * CP, CoP))

    d_offset18 = _fwd._unpack_lanes(doffP, B)
    d_mask = _fwd._unpack_lanes(dmaskP, B)
    # extract the block-diagonal (b == d) entries of dwBig and sum over b:
    # row lane (c, b) c-major = c*B + b, col lane (o, d) = o*B + d
    dwFull = dwBig.reshape(9, C, B, Cout, B)
    d_weight = jnp.einsum("kcbob->kco", dwFull).reshape(3, 3, C, Cout)
    return d_offset18, d_mask, d_weight
