"""Pallas TPU kernel for the windowed deformable convolution.

The shift-decomposed DCN (see ops/deform_conv.py:deform_conv2d_windowed)
needs no gathers: every sample is a triangle-weighted sum of statically
shifted image windows.  XLA materialises each shifted window in HBM, which
is why the pure-XLA windowed path is bandwidth-bound; this kernel keeps a
whole padded image in VMEM per batch item and fuses the entire
(2R+2)^2-shift x 9-tap accumulation plus the weight contraction (MXU) into
one pass per row-tile — the deformable im2col columns never touch HBM.

Scope: 3x3 / stride 1 / dilation 1 / deformable_groups 1 — exactly the
configuration every DCN in SIDE uses (dcn_v2.py:97-128,
feature_extraction_dla34.py:352).  Offsets are clamped to [-radius, radius]
(same contract as deform_conv2d_windowed: exact vs the reference kernel
whenever offsets are in range — and with bf16 activations the two paths are
bit-identical in practice, verified in-model on v5e).

Kernel structure (round-2 rewrite; the round-1 version was 10-20x off the
VPU roofline):
  * per grid step (batch b, row-tile t) the input window is read from the
    resident padded image ONCE, cast to f32 ONCE into a VMEM scratch
    (the old kernel re-read + re-cast it inside all 9*(2R+2)^2 terms);
  * every shift term is then a STATIC slice of that scratch (the old
    kernel's traced-start dynamic slices forced Mosaic copies per term);
  * triangle weights per axis are precomputed per tap (S arrays instead of
    S^2 products from scratch);
  * the im2col columns are written in the activation dtype so the weight
    contraction runs on the MXU in bf16 with f32 accumulation.

Mosaic constraints (each found the hard way in round 1): no >2D gathers on
values, no integer indexing that lowers to a gather (use static slices),
traced LANE-dim dynamic-slice starts crash the compiler, and the default
16M scoped-vmem budget is shared with XLA's co-scheduled buffers — raised
per-kernel via `pltpu.CompilerParams(vmem_limit_bytes=...)` (v5e has 128M
physical VMEM).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_conv import deform_conv2d_windowed

# Scoped-VMEM budget Mosaic may use per DCN kernel.  v5e has 128M physical
# VMEM; the XLA default budget is 16M which round 1 overflowed in-model.
_VMEM_LIMIT = int(_os.environ.get("SIDE_TPU_DCN_VMEM", str(96 * 1024 * 1024)))
# sy accumulation: "full" unrolls everything (static slices); "fori" runs
# the row shifts in a fori_loop (smaller compile, dynamic sublane starts).
# In-model the fully unrolled program never finished the Mosaic compile;
# fori is the production default.
_UNROLL = _os.environ.get("SIDE_TPU_DCN_UNROLL", "fori")
# pack the image batch into the lane dimension for C<=128 layers (b-major;
# see _dcn_kernel_packed) — 2.7-3.5x at the DLA shapes
_PACK = _os.environ.get("SIDE_TPU_DCN_PACK", "1") == "1"
# lane-expansion strategy inside the packed kernel (see _lane_expand:
# "reshape" is rejected by this Mosaic version, and "repeat" at tile 8
# overflowed chip VMEM / at tile 4 ran 14% slower than matmul at tile 8)
_EXPAND = _os.environ.get("SIDE_TPU_DCN_EXPAND", "matmul")
# kernel accumulation strategy:
# "lerp" (default, round 3): bilinear sampling computed as a select-lerp —
#   base = clip(floor(d), -R, R-1), frac = d - base, then one lerp between
#   the two integer neighbours picked by a where-chain over the 2R bases.
#   Identical function to the triangle sum (the triangle weight is nonzero
#   on exactly those two neighbours) at (2R+1) + 2R-select work per axis
#   instead of (2R+2)^2 weighted terms — ~2.5x fewer CP-wide VPU ops at
#   R=1 — with NO accumulator ref and no fori_loop (static row slices).
# "rmw": the round-2 per-term triangle pattern (acc ref updated per term).
# "factored" exploits the separable triangle weights
#   (sum_sy wy * (sum_sx x*wx)) — the acc ref is touched once per
#   row shift instead of once per (row, col) term.  MEASURED AND REJECTED
#   as a default at R=2: at the dominant batch-2 eval shape it ran 5.00 ms
#   vs rmw's 4.37 ms and compiled 2.2x slower — the row-sum value chain
#   extends live ranges and spills.  The identical restructuring DOES win
#   1.8x in the d_coord backward, where it removes two of three CP-wide
#   accumulator streams.
_ACCUM = _os.environ.get("SIDE_TPU_DCN_ACCUM", "lerp")

# lerp compute dtype (SIDE_TPU_DCN_LERP_DT):
# "f32" (default): everything cast to f32 in the kernel.
# "auto" (MEASURED AND REJECTED, round 4): the select-lerp runs in the
#   ACTIVATION dtype — window scratch, neighbour selects, interpolation and
#   mask multiply all stay bf16 when the model runs bf16 (offsets/fracs
#   still derive in f32).  The hoped-for win (half the VMEM streams) does
#   NOT materialise on v5e: the VPU executes bf16 elementwise at the same
#   rate as f32 and Mosaic's bf16 (16,128)-tile pack/unpack relayouts cost
#   more than the bandwidth saved.  Measured at R=1 on the chip
#   (tools/dcn_layer_bench.py, 50 iters): big_b2 1.287 -> 1.676 ms,
#   mid_b2 0.768 -> 0.772, small_b2 0.171 -> 0.133, big 2.533 -> 2.973,
#   mid 1.645 -> 1.916 — a net LOSS at the dominant shapes (modeled
#   in-model total 29.1 -> 34.3 ms); only the deep C=256 shape improved.
#   Kept as an env opt-in for bisection.
_LERP_DT = _os.environ.get("SIDE_TPU_DCN_LERP_DT", "f32")


def _compute_dtype(x_dtype):
    """Kernel-internal window/compute dtype for the lerp accumulation."""
    if _ACCUM == "lerp" and _LERP_DT == "auto":
        return jnp.dtype(x_dtype)
    return jnp.dtype(jnp.float32)


# lane-pack strategy for the (B,H,W,L) <-> (1,H,W,L*B) relayouts around the
# packed kernels (SIDE_TPU_DCN_PACK_VIA):
# "transpose" (default): the plain XLA relayout.  The op-level trace labels
#   these transposes "data formatting" at ~10% of HBM bandwidth (~47 ms
#   nominal across a train step), which motivated the matmul form below —
#   but an end-to-end A/B on the chip showed the attribution is misleading:
#   XLA overlaps/fuses them well enough that replacing them buys nothing.
# "matmul" (measured and rejected, round 3): compute the c-major lane
#   interleave as MXU dots against constant 0/1 scatter matrices, making
#   every read/write contiguous.  Bit-identical to the transpose (each
#   output lane is 1.0 * exactly one input element; bf16 products are
#   exact, f32 runs at HIGHEST precision) — but measured on v5e at the
#   production shapes it was NEUTRAL for training (7.09 vs 7.03 pairs/s,
#   within noise) and ~2% WORSE at inference (50.9 vs 51.9 pairs/s): the
#   extra dots cost what the strided relayout saves.  Kept for bisection
#   and as the recorded experiment.
_PACK_VIA = _os.environ.get("SIDE_TPU_DCN_PACK_VIA", "transpose")


@functools.lru_cache(maxsize=None)
def _pack_mats_np(B: int, L: int):
    """0/1 scatter matrices for the c-major lane interleave (numpy; the
    jnp constants are created per trace so no tracer escapes the cache).

    E: (B, L, L*B) with E[b, l, lane] = 1 iff lane == l*B + b (pack);
    D: (B, L*B, L), its per-b transpose (unpack)."""
    lane = np.arange(L * B)
    E = np.zeros((B, L, L * B), np.float32)
    for b in range(B):
        E[b, lane[lane % B == b] // B, lane[lane % B == b]] = 1.0
    return E, np.swapaxes(E, 1, 2)


def _pack_mats(B: int, L: int, dtype_name: str):
    E, D = _pack_mats_np(B, L)
    dt = jnp.dtype(dtype_name)
    mdt = dt if dt == jnp.bfloat16 else jnp.float32
    return jnp.asarray(E, mdt), jnp.asarray(D, mdt)


def _pack_lanes(a):
    """(B, H, W, L) -> (1, H, W, L*B), lane = l*B + b (c-major batch pack).

    The optional matmul form (out[hw, :] = sum_b a[b, hw, :] @ E[b]) keeps
    reads/writes contiguous but measured no faster than the transpose; see
    the _PACK_VIA note above."""
    B, H, W, L = a.shape
    if _PACK_VIA != "matmul":
        return a.transpose(1, 2, 3, 0).reshape(1, H, W, L * B)
    E, _ = _pack_mats(B, L, a.dtype.name)
    out = jax.lax.dot_general(
        a.reshape(B, H * W, L), E,
        dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(None if a.dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST))
    return out.astype(a.dtype).reshape(1, H, W, L * B)


def _unpack_lanes(aP, B: int, dtype=None):
    """(1|-, H, W, L*B) -> (B, H, W, L): inverse of _pack_lanes."""
    if aP.ndim == 4:
        aP = aP[0]
    H, W, LB = aP.shape
    L = LB // B
    dtype = dtype or aP.dtype
    if _PACK_VIA != "matmul":
        return aP.reshape(H, W, L, B).transpose(3, 0, 1, 2).astype(dtype)
    _, D = _pack_mats(B, L, aP.dtype.name)
    a2 = aP.reshape(H * W, LB)
    prec = (None if aP.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST)
    outs = [jax.lax.dot_general(
        a2, D[b], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec).astype(dtype)
        for b in range(B)]
    return jnp.stack(outs).reshape(B, H, W, L)


def _eye_expand(w2, B: int):
    """(..., A, D) -> (..., A*B, D*B) block-diagonal batch expansion:
    out[..., a*B + b, d*B + e] = w2[..., a, d] * (b == e).

    Built entirely in the FINAL 2D layout: repeat rows by B (sublanes),
    repeat cols by B (lanes), then zero the off-diagonal entries with an
    iota mask evaluated in the same layout.  The earlier 5D broadcast
    forms ((..., A, B, D, B) multiplies) put B=4 in the minor dim — 4 of
    128 lanes — and XLA added a relayout copy per materialisation: the
    round-5 train profile showed ~9 ms/step of such multiplies + copies
    across the fwd/d_x/d_coord weight expansions (prov "kco,bd->kcbod")."""
    A, D = w2.shape[-2:]
    if B == 1:
        return w2
    wr = jnp.repeat(w2, B, axis=-2)           # (..., A*B, D)
    wrc = jnp.repeat(wr, B, axis=-1)          # (..., A*B, D*B), lane=d*B+e
    mask = (jax.lax.broadcasted_iota(jnp.int32, (A * B, D * B), 0) % B ==
            jax.lax.broadcasted_iota(jnp.int32, (A * B, D * B), 1) % B)
    return wrc * mask.astype(w2.dtype)


def _vmem_request(need_bytes: int) -> int:
    """Scoped-VMEM budget to request for one kernel: the estimated need
    plus margin, never the flat ceiling.  A flat 96M request starves XLA's
    co-scheduled buffers of stack space and OOMs the 128M chip VMEM on
    programs whose kernels only need a fraction of it (seen with the B=1
    f32 eval layers)."""
    # 1.7x margin: Mosaic's actual stack exceeded a 1.4x margin by 1.6M
    # at the batch-1 eval shape
    return _vmem_request_margin(need_bytes, 1.7)


def _vmem_request_margin(need_bytes: int, margin: float) -> int:
    """Variant with an explicit margin: the backward kernels' Mosaic temp
    planes run ~1.8x past the block+scratch estimate (R=1 d_x measured
    79.15M actual vs 44.7M estimated), so they request 2.2x."""
    return max(32 << 20, min(_VMEM_LIMIT, int(need_bytes * margin)))


def _pick_tile_h(H: int, W: int, C: int, R: int) -> int:
    """Row-tile height: large enough to amortise per-step work, small
    enough that the f32 scratches stay well inside the budget."""
    per_row = (W + 2 * (R + 2)) * C * 4      # f32 window scratch per row
    cols_row = W * 9 * C * 2                 # bf16 cols per row
    budget = _VMEM_LIMIT // 4
    for t in (16, 12, 8, 6, 4, 3, 2, 1):
        if H % t == 0 and \
                (t + 2 * R + 3) * per_row + t * (cols_row + W * C * 4) <= budget:
            return t
    return 1


def _dcn_kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, out_ref,
                x32_ref, cols_ref, acc_ref, *,
                H, W, C, Cout, tile_h, R, PAD):
    t = pl.program_id(1)
    row0 = t * tile_h

    offs = off_ref[0]                    # (tile_h, W, 18) f32
    masks = mask_ref[0]                  # (tile_h, W, 9) f32
    S = 2 * R + 2                        # shifts per axis

    # one dynamic-start read + one f32 cast of the whole input window:
    # padded rows [row0 + PAD-1-R, ... + tile_h + 2R + 3) cover every
    # (tap ty, shift sy) slice of this row-tile
    win_rows = tile_h + 2 * R + 3
    cdt = x32_ref.dtype
    x32_ref[:] = x_ref[0, pl.ds(row0 + PAD - 1 - R, win_rows), :, :
                       ].astype(cdt)

    for k in range(9):
        ty, tx = k // 3, k % 3
        # static channel slices (integer indexing lowers to a 3D gather)
        dy = jnp.clip(offs[:, :, 2 * k:2 * k + 1][:, :, 0], -R, R)
        dx = jnp.clip(offs[:, :, 2 * k + 1:2 * k + 2][:, :, 0], -R, R)
        mk = masks[:, :, k:k + 1]

        if _ACCUM == "lerp":
            # select-lerp bilinear (see _ACCUM doc), per-image variant.
            # bases/fracs derive in f32; only the frac multiplier is cast
            # to the compute dtype (see _LERP_DT).
            by = jnp.clip(jnp.floor(dy), -R, R - 1)
            tyf = (dy - by)[:, :, None].astype(cdt)
            bx = jnp.clip(jnp.floor(dx), -R, R - 1)
            txf = (dx - bx)[:, :, None].astype(cdt)
            # x-base select masks hoisted out of the row loop (see the
            # packed kernel)
            mx = {b0: (bx == b0)[:, :, None] for b0 in range(-R + 1, R)}
            rows = []
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
                rows.append(lo + (hi - lo) * txf)
            lo = hi = None
            for i, b0 in enumerate(range(-R, R)):
                if lo is None:
                    lo, hi = rows[0], rows[1]
                else:
                    m = (by == b0)[:, :, None]
                    lo = jnp.where(m, rows[i], lo)
                    hi = jnp.where(m, rows[i + 1], hi)
            val = lo + (hi - lo) * tyf
            cols_ref[:, k * C:(k + 1) * C] = (val * mk.astype(cdt)).reshape(
                tile_h * W, C).astype(cols_ref.dtype)
            continue

        # triangle weights per axis, S of each (instead of S^2 pair products
        # recomputed from scratch)
        wx = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - s)) for s in
              range(-R, R + 2)]
        if _UNROLL == "full":
            wy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - s)) for s in
                  range(-R, R + 2)]

        # sample row (padded coords) of output row r is r + PAD-1 + ty + sy;
        # the scratch starts at padded row row0 + PAD-1-R, so the in-scratch
        # start is ty + sy + R — fully static.
        acc_ref[:] = jnp.zeros((tile_h, W, C), jnp.float32)
        if _UNROLL == "full":
            for iy, sy in enumerate(range(-R, R + 2)):
                ry = ty + sy + R
                for ix, sx in enumerate(range(-R, R + 2)):
                    cxs = PAD - 1 + tx + sx
                    w2 = wy[iy] * wx[ix]
                    acc_ref[:] = acc_ref[:] + \
                        x32_ref[ry:ry + tile_h, cxs:cxs + W, :] * \
                        w2[:, :, None]
        else:
            # fori over the row shifts: 6x fewer unrolled statements than
            # "full" (Mosaic compile time scales with statement count; the
            # fully unrolled variant never finished compiling in-model).
            # The triangle weight is recomputed from the loop index — a
            # dynamic_index into a stacked VALUE lowers to an unsupported
            # Mosaic dynamic_slice, while ref loads with dynamic SUBLANE
            # starts (pl.ds on x32_ref) are supported.  Accumulation stays
            # in the ref: a large value carry compiled 5x slower and ran
            # slightly worse (158 vs 146 ms in-model).
            def row_body(i, carry, ty=ty, tx=tx, dyk=dy, wxl=wx):
                xs = x32_ref[pl.ds(ty + i, tile_h)]
                syf = i.astype(jnp.float32) - R
                wyi = jnp.maximum(0.0, 1.0 - jnp.abs(dyk - syf))
                if _ACCUM == "factored":
                    # separable triangle weights: one wy multiply per row
                    # shift instead of one per term (see the packed kernel)
                    cxs0 = PAD - 1 + tx - R
                    row = xs[:, cxs0:cxs0 + W, :] * wxl[0][:, :, None]
                    for ix in range(1, S):
                        cxs = cxs0 + ix
                        row = row + \
                            xs[:, cxs:cxs + W, :] * wxl[ix][:, :, None]
                    acc_ref[:] = acc_ref[:] + row * wyi[:, :, None]
                else:
                    # accumulate the 6 unrolled sx terms in a value and
                    # touch the ref once per iteration
                    local = acc_ref[:]
                    for ix, sx in enumerate(range(-R, R + 2)):
                        cxs = PAD - 1 + tx + sx
                        local = local + xs[:, cxs:cxs + W, :] * \
                            (wyi * wxl[ix])[:, :, None]
                    acc_ref[:] = local
                return carry

            jax.lax.fori_loop(0, S, row_body, 0)
        cols_ref[:, k * C:(k + 1) * C] = (acc_ref[:] * mk).reshape(
            tile_h * W, C).astype(cols_ref.dtype)

    out = jax.lax.dot_general(
        cols_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.reshape(tile_h, W, Cout).astype(out_ref.dtype)


def _lane_expand(v, C: int):
    """(th, W, P) -> (th, W, C*P): per-image values replicated across C
    lanes in C-MAJOR order (lane = c*P + b, matching the packed x layout).
    Strategy via SIDE_TPU_DCN_EXPAND:

    "matmul" (default): contract against a constant 0/1 matrix at HIGHEST
    precision (the default TPU f32 matmul rounds through bf16, which would
    quantise every offset/mask to 8 mantissa bits).
    "repeat": concatenate C copies along lanes — no arithmetic, but at
    tile 8 it overflowed chip VMEM and at tile 4 ran 14% slower than
    matmul at tile 8, so it lost the default despite being "free".
    "reshape" (broadcast + minor-dim merge) is rejected by this Mosaic
    version ("infer-vector-layout: unsupported shape cast")."""
    th, W, P = v.shape
    if _EXPAND == "repeat":
        return pltpu.repeat(v, C, axis=2)
    if _EXPAND == "reshape":
        return jnp.broadcast_to(v[:, :, None, :], (th, W, C, P)).reshape(
            th, W, C * P)
    # 0/1 matrix (P, C*P) built from iota — a captured numpy constant is
    # rejected by pallas_call, and iota lowers fine in Mosaic
    E = (jax.lax.broadcasted_iota(jnp.int32, (P, C * P), 1) % P ==
         jax.lax.broadcasted_iota(jnp.int32, (P, C * P), 0)
         ).astype(jnp.float32)
    out = jax.lax.dot_general(v.reshape(th * W, P), E,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    return out.reshape(th, W, C * P)


def _dcn_kernel_packed(x_ref, off_ref, mask_ref, w_ref, b_ref, out_ref,
                       x32_ref, cols_ref, acc_ref, *,
                       H, W, C, Cout, P, tile_h, R, PAD,
                       om_layout: bool = False):
    """Batch-packed variant: the image batch lives in the LANE dimension
    (C-MAJOR: lane = c*P + b), so C<=128 layers still fill the 128-lane
    VPU.  Measured on v5e at the DLA shapes: C=64 runs at 0.26 TFLOP/s
    unpacked vs 0.92 packed (see tools/dcn_layer_bench.py proxies).
    C-major keeps the per-image offset/mask lane expansion contiguous
    (see _lane_expand; matmul strategy by default).  The weight matrix is
    block-diagonal over the batch so the MXU contraction cannot mix
    images (P**2 x more weight FLOPs, still <1 ms total).

    om_layout=True (fused offset-conv path, _pallas_forward_packed_fused):
    off_ref carries the RAW offset-mask conv output in our per-tap
    interleaved channel order (lane = (3k+j)*P + b, j = dy/dx/mask-logit;
    models/dla.py DeformBlock reshape) and mask_ref is unused — the mask
    sigmoid runs here on the P-wide logits before lane expansion."""
    t = pl.program_id(1)
    row0 = t * tile_h

    offs = off_ref[0]                    # (tile_h, W, 18*P|27*P) f32
    masks = None if om_layout else mask_ref[0]   # (tile_h, W, 9*P) f32
    S = 2 * R + 2
    CP = P * C

    win_rows = tile_h + 2 * R + 3
    cdt = x32_ref.dtype
    x32_ref[:] = x_ref[0, pl.ds(row0 + PAD - 1 - R, win_rows), :, :
                       ].astype(cdt)

    for k in range(9):
        ty, tx = k // 3, k % 3
        if om_layout:
            dy = jnp.clip(offs[:, :, 3 * k * P:(3 * k + 1) * P], -R, R)
            dx = jnp.clip(offs[:, :, (3 * k + 1) * P:(3 * k + 2) * P],
                          -R, R)
            mk = jax.nn.sigmoid(offs[:, :, (3 * k + 2) * P:
                                     (3 * k + 3) * P])
        else:
            dy = jnp.clip(offs[:, :, 2 * k * P:(2 * k + 1) * P], -R, R)
            dx = jnp.clip(offs[:, :, (2 * k + 1) * P:(2 * k + 2) * P],
                          -R, R)
            mk = masks[:, :, k * P:(k + 1) * P]
        # pre-expand per tap (27 expansions/tile).  Expanding only the
        # per-TERM product (324 expansions) uses less VMEM but its Mosaic
        # compile never finished; per-tap is the workable middle.
        dyE = _lane_expand(dy, C)                       # (tile_h, W, P*C)
        dxE = _lane_expand(dx, C)
        mkE = _lane_expand(mk, C)

        if _ACCUM == "lerp0":
            # DIAGNOSTIC (tools/dcn_roofline.py): the op-count FLOOR for
            # any fractional-offset bilinear — fixed neighbour base (0, 0),
            # i.e. the R=0 window: frac extraction + one x-lerp per row +
            # one y-lerp + mask.  NOT a valid DCN (ignores the integer part
            # of the offset); exists purely to measure how far the
            # production select-lerp is from the minimum VPU work.
            tyf = (dyE - jnp.floor(dyE)).astype(cdt)
            txf = (dxE - jnp.floor(dxE)).astype(cdt)
            c0 = PAD - 1 + tx
            r0 = None
            for sy in range(0, 2):
                xs = x32_ref[ty + sy + R:ty + sy + R + tile_h]
                xb = xs[:, c0:c0 + W, :]
                xb1 = xs[:, c0 + 1:c0 + 1 + W, :]
                r = xb + (xb1 - xb) * txf
                r0, r1 = (r, None) if r0 is None else (r0, r)
            val = r0 + (r1 - r0) * tyf
            cols_ref[:, k * CP:(k + 1) * CP] = (
                val * mkE.astype(cdt)).reshape(
                tile_h * W, CP).astype(cols_ref.dtype)
            continue
        if _ACCUM == "copy":
            # DIAGNOSTIC: no interpolation at all — static window * mask.
            # The pure data-movement floor of the cols construction.
            xs = x32_ref[ty + R:ty + R + tile_h]
            c0 = PAD - 1 + tx
            val = xs[:, c0:c0 + W, :]
            cols_ref[:, k * CP:(k + 1) * CP] = (
                val * mkE.astype(cdt)).reshape(
                tile_h * W, CP).astype(cols_ref.dtype)
            continue
        if _ACCUM == "lerp":
            # select-lerp bilinear (see _ACCUM doc): per axis, base =
            # clip(floor(d), -R, R-1) and frac = d - base pick the two
            # integer neighbours; a where-chain over the 2R bases selects
            # them from static slices.  No accumulator ref, no fori_loop.
            # Bases/fracs derive in f32; fracs cast to the compute dtype
            # so the CP-wide streams run bf16 in a bf16 model (_LERP_DT).
            by = jnp.clip(jnp.floor(dyE), -R, R - 1)
            tyf = (dyE - by).astype(cdt)
            bx = jnp.clip(jnp.floor(dxE), -R, R - 1)
            txf = (dxE - bx).astype(cdt)
            # the x-base select masks are row-invariant: compute them once
            # per tap instead of once per (row, base) — 2R CP-wide compares
            # saved per row at R>=1
            mx = {b0: bx == b0 for b0 in range(-R + 1, R)}
            rows = []
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
                rows.append(lo + (hi - lo) * txf)
            lo = hi = None
            for i, b0 in enumerate(range(-R, R)):
                if lo is None:
                    lo, hi = rows[0], rows[1]
                else:
                    m = by == b0
                    lo = jnp.where(m, rows[i], lo)
                    hi = jnp.where(m, rows[i + 1], hi)
            val = lo + (hi - lo) * tyf
            cols_ref[:, k * CP:(k + 1) * CP] = (
                val * mkE.astype(cdt)).reshape(
                tile_h * W, CP).astype(cols_ref.dtype)
            continue

        wx = [jnp.maximum(0.0, 1.0 - jnp.abs(dxE - s)) for s in
              range(-R, R + 2)]

        acc_ref[:] = jnp.zeros((tile_h, W, CP), jnp.float32)

        def row_body(i, carry, ty=ty, tx=tx, dyE=dyE, wxl=wx):
            xs = x32_ref[pl.ds(ty + i, tile_h)]
            syf = i.astype(jnp.float32) - R
            wyi = jnp.maximum(0.0, 1.0 - jnp.abs(dyE - syf))
            if _ACCUM == "factored":
                # separable triangle weights: acc += wy * (sum_sx x*wx).
                # The sx sum is a short local value chain (consumed within
                # the iteration, so it does not spill the way a LOOP-CARRIED
                # value accumulator did — that one measured 29% slower);
                # the acc ref is touched once per row shift instead of once
                # per (row, col) term: 6x less RMW traffic and 7 instead of
                # 12 CP-wide multiplies per iteration.
                cxs0 = PAD - 1 + tx - R
                row = xs[:, cxs0:cxs0 + W, :] * wxl[0]
                for ix in range(1, S):
                    cxs = cxs0 + ix
                    row = row + xs[:, cxs:cxs + W, :] * wxl[ix]
                acc_ref[:] = acc_ref[:] + row * wyi
            else:
                # "rmw": the round-2 per-term pattern
                for ix, sx in enumerate(range(-R, R + 2)):
                    cxs = PAD - 1 + tx + sx
                    acc_ref[:] = acc_ref[:] + \
                        xs[:, cxs:cxs + W, :] * (wyi * wxl[ix])
            return carry

        jax.lax.fori_loop(0, S, row_body, 0)
        cols_ref[:, k * CP:(k + 1) * CP] = (acc_ref[:] * mkE).reshape(
            tile_h * W, CP).astype(cols_ref.dtype)

    out = jax.lax.dot_general(
        cols_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.reshape(tile_h, W, P * Cout).astype(out_ref.dtype)


def _packed_need(H, W, CP, B, Cout, R, PAD, itemsize, tile_h):
    """Estimated VMEM bytes of the packed kernel at a given tile: block and
    scratch sizes are EXACT; Mosaic's register/temp stack is estimated and
    margined 2x.  The SAME formula drives tile selection and the
    vmem_limit request, so the two can never disagree at the clamp
    (batch-4 OOM'd by <1M when they did)."""
    win_rows = tile_h + 2 * R + 3
    # lerp-auto computes in the activation dtype: the window scratch and
    # every CP-wide temp stream shrink to the activation itemsize
    cdt_size = itemsize if (_ACCUM == "lerp" and _LERP_DT == "auto") else 4
    exact = (2 * (H + 2 * PAD) * (W + 2 * PAD) * CP * itemsize  # x block x2
             + 9 * CP * B * Cout * 4 + B * Cout * 4             # weights
             + 2 * tile_h * W * 27 * B * 4                      # off+mask x2
             + 2 * tile_h * W * B * Cout * itemsize             # out x2
             + win_rows * (W + 2 * PAD) * CP * cdt_size         # win scratch
             + tile_h * W * 9 * CP * itemsize                   # cols
             + tile_h * W * CP * 4)                             # acc scratch
    # expanded off/mask + wy/wx; the opt-in factored accumulation carries
    # an extra CP-wide row-sum value stream (measured: its Mosaic stack at
    # the CP=256 eval shape ran 57.2M vs the 4-stream estimate's 50.1M).
    # The lerp form holds the 2R+1 interpolated row values plus lo/hi/fracs
    # live at once.  The f32 lane-expanded offsets/fracs stay f32 even in
    # lerp-auto, so charge half the streams at f32.
    if _ACCUM == "lerp":
        n_streams = 2 * R + 5
        temps = n_streams * tile_h * W * CP * (cdt_size + 4) // 2
    else:
        n_streams = 5 if _ACCUM == "factored" else 4
        temps = n_streams * tile_h * W * CP * 4
    return exact + 2 * temps


def _pick_tile_h_packed(H, W, CP, B, Cout, R, PAD, itemsize):
    """Largest tile whose margined need fits the scoped-VMEM ceiling;
    None if even tile 1 does not (caller falls back to the unpacked
    kernel, which has no giant resident packed image)."""
    for t in (16, 12, 8, 6, 4, 3, 2, 1):
        if H % t == 0 and \
                _packed_need(H, W, CP, B, Cout, R, PAD, itemsize, t) \
                <= int(_VMEM_LIMIT * 0.92):   # 8% headroom at the ceiling
            return t
    return None


def _pallas_forward_packed(x, offset18, mask, weight, bias, radius: int):
    B, H, W, C = x.shape
    Cout = weight.shape[-1]
    R = radius
    PAD = 1 + R + 1
    CP = B * C
    itemsize_ = jnp.dtype(x.dtype).itemsize
    tile_h = _pick_tile_h_packed(H, W, CP, B, Cout, R, PAD, itemsize_)
    if tile_h is None:
        return None     # no tile fits VMEM; caller uses the unpacked path

    # batch -> lanes, c-major (lane = c*B + b) so _lane_expand is a tile
    xP = _pack_lanes(x)
    offP = _pack_lanes(offset18)
    maskP = _pack_lanes(mask)
    # block-diagonal weights: rows ordered (tap, cin, b), cols (cout, b)
    wfull = weight.reshape(9, C, Cout).astype(jnp.float32)
    wBig = _eye_expand(wfull, B).reshape(9 * B * C, B * Cout)
    biasBig = jnp.repeat(bias.astype(jnp.float32), B)

    xp = jnp.pad(xP, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    Hp, Wp = H + 2 * PAD, W + 2 * PAD
    try:
        xp = pltpu.with_memory_space_constraint(xp, pltpu.HBM)
    except Exception:
        pass

    kern = functools.partial(_dcn_kernel_packed, H=H, W=W, C=C, Cout=Cout,
                             P=B, tile_h=tile_h, R=R, PAD=PAD)
    grid = (1, H // tile_h)
    win_rows = tile_h + 2 * R + 3
    # The request takes a further 1.15x on top of _packed_need: the actual
    # Mosaic stack ran 2-6% past the estimate at the batch-2 eval shape
    # (rmw 60.58M / factored 63.01M vs 59.26M estimated at tile 16) —
    # requesting exactly the estimate OOMs scoped vmem, and the stack size
    # moves with kernel-code revisions (an earlier build needed 70.6M at
    # the same shape).  The tile PICKER keeps budgeting with the raw
    # formula against a 0.92 ceiling, so tile choices are unchanged and
    # the worst-case request clamps at _VMEM_LIMIT.
    vmem_req = _vmem_request_margin(_packed_need(
        H, W, CP, B, Cout, R, PAD, itemsize_, tile_h), 1.15)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, CP), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W, 18 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W, 9 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * CP, B * Cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * Cout,), lambda b, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, B * Cout),
                               lambda b, t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, B * Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((win_rows, Wp, CP),
                                   _compute_dtype(x.dtype)),
                        pltpu.VMEM((tile_h * W, 9 * CP), x.dtype),
                        pltpu.VMEM((tile_h, W, CP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_req),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * Cout * B +
            B * H * W * 9 * (2 * R + 2) ** 2 * C * 2,
            bytes_accessed=Hp * Wp * CP * x.dtype.itemsize,
            transcendentals=0),
    )(xp, offP, maskP, wBig, biasBig)
    return _unpack_lanes(out, B)


def _dcn_kernel_packed_om(x_ref, om_ref, w_ref, b_ref, out_ref,
                          x32_ref, cols_ref, acc_ref, **kw):
    """Packed kernel entry for the fused offset-conv layout (one om input
    instead of separate offsets + mask; see _dcn_kernel_packed)."""
    _dcn_kernel_packed(x_ref, om_ref, None, w_ref, b_ref, out_ref,
                       x32_ref, cols_ref, acc_ref, om_layout=True, **kw)


def _om_conv_packed(xP, w_om, b_om, B: int):
    """Offset-mask conv evaluated directly on the LANE-PACKED input.

    The 27-channel offset/mask conv is MXU-hostile unpacked (Cout=27 fills
    27/128 lanes) and its output then needs its own pack relayout.  On the
    packed layout it becomes one conv with a block-diagonal kernel
    (3, 3, C*B, 27*B) — bigger MXU tiles, offsets born in kernel layout,
    no relayout.  Same math as models/dla.py's offset_mask nn.Conv (the
    block-diagonal zeros contribute exactly 0)."""
    C = w_om.shape[2]
    kBig = _eye_expand(w_om.astype(jnp.float32), B).reshape(
        3, 3, C * B, 27 * B)
    om = jax.lax.conv_general_dilated(
        xP, kBig.astype(xP.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    om = om + jnp.repeat(b_om, B).astype(om.dtype)
    return om.astype(jnp.float32)


def _pallas_forward_packed_fused(x, w_om, b_om, weight, bias, radius: int):
    """Packed forward with the offset-mask conv fused into the program:
    same kernel body, but the off/mask operands are replaced by the raw
    packed om conv output (27B lanes, per-tap interleaved; the mask
    sigmoid runs in-kernel)."""
    B, H, W, C = x.shape
    Cout = weight.shape[-1]
    R = radius
    PAD = 1 + R + 1
    CP = B * C
    itemsize_ = jnp.dtype(x.dtype).itemsize
    tile_h = _pick_tile_h_packed(H, W, CP, B, Cout, R, PAD, itemsize_)
    if tile_h is None:
        return None

    xP = _pack_lanes(x)
    omP = _om_conv_packed(xP, w_om, b_om, B)
    wfull = weight.reshape(9, C, Cout).astype(jnp.float32)
    wBig = _eye_expand(wfull, B).reshape(9 * B * C, B * Cout)
    biasBig = jnp.repeat(bias.astype(jnp.float32), B)

    xp = jnp.pad(xP, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    Hp, Wp = H + 2 * PAD, W + 2 * PAD
    try:
        xp = pltpu.with_memory_space_constraint(xp, pltpu.HBM)
    except Exception:
        pass

    kern = functools.partial(_dcn_kernel_packed_om, H=H, W=W, C=C,
                             Cout=Cout, P=B, tile_h=tile_h, R=R, PAD=PAD)
    grid = (1, H // tile_h)
    win_rows = tile_h + 2 * R + 3
    vmem_req = _vmem_request_margin(_packed_need(
        H, W, CP, B, Cout, R, PAD, itemsize_, tile_h), 1.15)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, CP), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W, 27 * B), lambda b, t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * CP, B * Cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * Cout,), lambda b, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, B * Cout),
                               lambda b, t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, B * Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((win_rows, Wp, CP),
                                   _compute_dtype(x.dtype)),
                        pltpu.VMEM((tile_h * W, 9 * CP), x.dtype),
                        pltpu.VMEM((tile_h, W, CP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_req),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * Cout * B +
            B * H * W * 9 * (2 * R + 2) ** 2 * C * 2,
            bytes_accessed=Hp * Wp * CP * x.dtype.itemsize,
            transcendentals=B * H * W * 9),
    )(xp, omP, wBig, biasBig)
    return _unpack_lanes(out, B)


def _fused_reference(x, w_om, b_om, weight, bias, radius):
    """Unfused composition with identical semantics (fallback + VJP):
    the offset_mask conv exactly as models/dla.py DeformBlock runs it,
    then the windowed DCN."""
    B, H, W, _ = x.shape
    om = jax.lax.conv_general_dilated(
        x, w_om.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    om = (om + b_om.astype(om.dtype)).reshape(B, H, W, 9, 3)
    offset = om[..., 0:2].astype(jnp.float32)
    mask = jax.nn.sigmoid(om[..., 2].astype(jnp.float32))
    return deform_conv2d_windowed(x, offset, mask, weight, bias,
                                  stride=1, padding=1, dilation=1,
                                  radius=radius)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dcn_pallas_fused(x, w_om, b_om, weight, bias, radius):
    return _fused_forward(x, w_om, b_om, weight, bias, radius)


def _fused_forward(x, w_om, b_om, weight, bias, radius):
    B, H, W, C = x.shape
    if _PACK and B > 1 and C <= 128:
        g = _packed_group_size(B, C, H, W, weight.shape[-1], radius,
                               1 + radius + 1, jnp.dtype(x.dtype).itemsize)
        if g == B:
            out = _pallas_forward_packed_fused(x, w_om, b_om, weight, bias,
                                               radius)
            if out is not None:
                return out
        elif g is not None:
            outs = [_pallas_forward_packed_fused(
                x[i:i + g], w_om, b_om, weight, bias, radius)
                for i in range(0, B, g)]
            if all(o is not None for o in outs):
                return jnp.concatenate(outs, axis=0)
    # unpackable shape: unfused om conv + the UNPACKED Pallas kernel (the
    # windowed XLA path would be a large regression in-model)
    om = jax.lax.conv_general_dilated(
        x, w_om.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    om = (om + b_om.astype(om.dtype)).reshape(B, H, W, 9, 3)
    offset18 = om[..., 0:2].astype(jnp.float32).reshape(B, H, W, 18)
    mask = jax.nn.sigmoid(om[..., 2].astype(jnp.float32))
    return _pallas_forward(x, offset18, mask, weight, bias, radius)


def _fused_fwd(x, w_om, b_om, weight, bias, radius):
    return _fused_forward(x, w_om, b_om, weight, bias, radius), \
        (x, w_om, b_om, weight, bias)


def _fused_bwd(radius, res, g):
    # eval-only op: gradients (rarely needed) go through the XLA VJP of
    # the mathematically identical unfused composition.  Training uses the
    # unfused DeformBlock path with the Pallas backward kernels instead.
    x, w_om, b_om, weight, bias = res
    _, vjp = jax.vjp(lambda *a: _fused_reference(*a, radius),
                     x, w_om, b_om, weight, bias)
    return vjp(g)


_dcn_pallas_fused.defvjp(_fused_fwd, _fused_bwd)


def deform_conv2d_pallas_fused(x, w_om, b_om, weight, bias=None,
                               radius: int = 1):
    """Fused offset-conv + windowed DCN (inference path).  w_om/b_om are
    the raw offset_mask conv parameters (3, 3, Cin, 27) / (27,) in our
    per-tap interleaved channel order."""
    if bias is None:
        bias = jnp.zeros((weight.shape[-1],), jnp.float32)
    if weight.shape[:2] != (3, 3):
        return _fused_reference(x, w_om, b_om, weight, bias, radius)
    return _dcn_pallas_fused(x, w_om.astype(jnp.float32),
                             b_om.astype(jnp.float32), weight, bias, radius)


def _packed_group_size(B, C, H, W, Cout, R, PAD, itemsize):
    """Largest divisor g of B (2 <= g <= B) whose lane-packed forward is
    feasible at CP = g*C.  Batches too large to pack whole (e.g. B=8 at
    C=64: CP=512 has no VMEM-feasible tile) are split into ceil(B/g)
    groups that each reuse the production packed kernel at its proven
    shapes instead of falling to the unpacked per-image kernel."""
    for g in range(B, 1, -1):
        if B % g or g * C > 1024:
            continue
        if _pick_tile_h_packed(H, W, g * C, g, Cout, R, PAD,
                               itemsize) is not None:
            return g
    return None


def _pallas_forward(x, offset18, mask, weight, bias, radius: int):
    B, H, W, C = x.shape
    if _PACK and B > 1 and C <= 128:
        g = _packed_group_size(B, C, H, W, weight.shape[-1], radius,
                               1 + radius + 1, jnp.dtype(x.dtype).itemsize)
        if g == B:
            packed = _pallas_forward_packed(x, offset18, mask, weight, bias,
                                            radius)
            if packed is not None:
                return packed
        elif g is not None:
            outs = [_pallas_forward_packed(x[i:i + g], offset18[i:i + g],
                                           mask[i:i + g], weight, bias,
                                           radius)
                    for i in range(0, B, g)]
            if all(o is not None for o in outs):
                return jnp.concatenate(outs, axis=0)
    Cout = weight.shape[-1]
    R = radius
    PAD = 1 + R + 1
    tile_h = _pick_tile_h(H, W, C, radius)
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    Hp, Wp = H + 2 * PAD, W + 2 * PAD
    try:
        # keep the operand out of VMEM: inside a large program XLA may place
        # it there (S(1)), double-counting it against the scoped budget
        xp = pltpu.with_memory_space_constraint(xp, pltpu.HBM)
    except Exception:
        pass

    kern = functools.partial(_dcn_kernel, H=H, W=W, C=C, Cout=Cout,
                             tile_h=tile_h, R=R, PAD=PAD)
    grid = (B, H // tile_h)
    win_rows = tile_h + 2 * R + 3
    itemsize = jnp.dtype(x.dtype).itemsize
    # temp-stream count mirrors _packed_need: the lerp form keeps the
    # 2R+1 interpolated row values plus lo/hi/fracs live at once, and
    # Mosaic's actual stack runs ~2x past a naive block+scratch estimate
    # (B=8/C=64 bf16 measured 78.4M actual vs a 26.6M 7-stream estimate)
    n_streams = (2 * R + 5) if _ACCUM == "lerp" else 4
    cdt_size = jnp.dtype(_compute_dtype(x.dtype)).itemsize
    vmem_req = _vmem_request(
        2 * Hp * Wp * C * itemsize                            # x block x2
        + 9 * C * Cout * 4 + Cout * 4                         # weights
        + 2 * tile_h * W * 27 * 4                             # off+mask x2
        + 2 * tile_h * W * Cout * itemsize                    # out x2
        + win_rows * Wp * C * cdt_size                        # win scratch
        + tile_h * W * 9 * C * itemsize                       # cols
        + (1 + 2 * n_streams) * tile_h * W * C * 4)           # acc + temps
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # whole padded image per batch item (index map ignores t — the
            # pipeline keeps it resident across row-tiles)
            pl.BlockSpec((1, Hp, Wp, C), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W, 18), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, W, 9), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, Cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Cout),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((win_rows, Wp, C),
                                   _compute_dtype(x.dtype)),
                        pltpu.VMEM((tile_h * W, 9 * C), x.dtype),
                        pltpu.VMEM((tile_h, W, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_req),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * Cout +
            B * H * W * 9 * (2 * R + 2) ** 2 * C * 2,
            bytes_accessed=B * Hp * Wp * C * x.dtype.itemsize,
            transcendentals=0),
    )(xp, offset18, mask, weight.reshape(9 * C, Cout), bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dcn_pallas(x, offset18, mask, weight, bias, radius):
    return _pallas_forward(x, offset18, mask, weight, bias, radius)


def _xla_equivalent(x, offset18, mask, weight, bias, radius):
    B, H, W, _ = offset18.shape
    offset = offset18.reshape(B, H, W, 9, 2)
    return deform_conv2d_windowed(x, offset, mask, weight, bias,
                                  stride=1, padding=1, dilation=1,
                                  radius=radius)


def _dcn_fwd(x, offset18, mask, weight, bias, radius):
    return _pallas_forward(x, offset18, mask, weight, bias, radius), \
        (x, offset18, mask, weight, bias)


# backward implementation: "pallas" = fused Mosaic col2im/col2im_coord
# kernels for the batch-packed layers (~85% of the DCN work; the XLA VJP
# left the train step backward-bound), "xla" = autodiff of the windowed
# decomposition for everything else.
# Default flipped to pallas in round 3: after the d_coord separable-
# triangle restructure (1.8x fewer VPU ops) the in-model compile finishes
# and the measured train step drops 645 -> 527 ms/batch-2 (3.1 -> 3.8
# pairs/s).  The round-2 compile blow-up was the pre-restructure kernel.
_BWD = _os.environ.get("SIDE_TPU_DCN_BWD", "pallas")
# largest channel count routed to the packed Pallas backward (bisection
# knob; layers above it take the XLA windowed VJP).  256 packs the C=256
# DLA-up layers via the gs=2 group split (~10 ms/step of lane-dim-1 XLA
# VJP copies saved) BUT the two extra CP=512 Mosaic kernels push the
# batch-2 train-program compile past this image's relay compile-helper
# memory budget (SIGKILL, round-5 bisection) — default 128; raise it on
# relays with more compile headroom.
_BWD_CMAX = int(_os.environ.get("SIDE_TPU_DCN_BWD_CMAX", "128"))


def _dcn_bwd(radius, res, g):
    x, offset18, mask, weight, bias = res
    B, H, W, C = x.shape
    # C <= 256 (round 5, was 128): the C=256 DLA-up layers' XLA windowed
    # VJP shatters into lane-dim-1 copies + loop fusions (~10 ms of the
    # 264 ms batch-2 train step); with gs = 512//C = 2 they pack the same
    # way as the C<=128 layers and their (24, 80) extents fit easily.
    if _BWD == "pallas" and _PACK and B > 1 and C <= _BWD_CMAX:
        from .dcn_pallas_bwd import dcn_packed_backward, packed_backward_fits
        gs = next((n for n in range(min(B, 512 // C), 1, -1)
                   if B % n == 0 and packed_backward_fits(H, W, n, C,
                                                          radius)), None)
        if gs == B:
            return dcn_packed_backward(x, offset18, mask, weight, g, radius)
        if gs is not None:
            # sub-batch groups (see _packed_group_size): per-sample
            # cotangents concatenate, weight/bias cotangents sum
            parts = [dcn_packed_backward(x[i:i + gs], offset18[i:i + gs],
                                         mask[i:i + gs], weight,
                                         g[i:i + gs], radius)
                     for i in range(0, B, gs)]
            d_x, d_off, d_mask, d_w, d_b = zip(*parts)
            return (jnp.concatenate(d_x, 0), jnp.concatenate(d_off, 0),
                    jnp.concatenate(d_mask, 0),
                    sum(d_w[1:], d_w[0]), sum(d_b[1:], d_b[0]))
    # fall back to the mathematically identical XLA windowed path
    _, vjp = jax.vjp(
        lambda *a: _xla_equivalent(*a, radius), x, offset18, mask, weight,
        bias)
    return vjp(g)


_dcn_pallas.defvjp(_dcn_fwd, _dcn_bwd)


def deform_conv2d_pallas(x, offset, mask, weight,
                         bias: Optional[jnp.ndarray] = None,
                         stride: int = 1, padding: int = 1,
                         dilation: int = 1, radius: int = 2):
    """Drop-in for deform_conv2d (windowed semantics).  Falls back to the
    XLA windowed path for configurations outside the kernel's scope."""
    B, H, W, C = x.shape
    kh, kw = weight.shape[:2]
    if (stride, padding, dilation, kh, kw) != (1, 1, 1, 3, 3):
        return deform_conv2d_windowed(x, offset, mask, weight, bias,
                                      stride, padding, dilation, radius)
    if bias is None:
        bias = jnp.zeros((weight.shape[-1],), jnp.float32)
    offset18 = offset.reshape(B, H, W, 18).astype(jnp.float32)
    return _dcn_pallas(x, offset18, mask.astype(jnp.float32),
                       weight, bias, radius)
