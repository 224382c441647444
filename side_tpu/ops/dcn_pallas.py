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
whenever offsets are in range).

STATUS (SIDE_TPU_DCN=pallas, experimental): correct in interpret mode and
compiles+runs standalone on v5e for EVERY layer shape the model uses
(verified incl. (4,48,160,128)->64, also under lax.scan), but inside the
full backbone program one instantiation trips Mosaic's 16M scoped-vmem
limit by ~2M — XLA co-schedules neighbouring buffers into the same scoped
budget.  Round-2 fix: per-call buffering control / smaller image blocks
with halo DMA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_conv import deform_conv2d_windowed


def _pick_tile_h(H: int, W: int = 320, C: int = 64, R: int = 2) -> int:
    """Largest row-tile whose unrolled-body stack fits Mosaic's 16M scoped
    vmem: the compiler allocates a fresh (tile_h, W, C) f32 temp for each of
    the 9*(2R+2) unrolled loop bodies (no cross-statement reuse)."""
    # two f32 tile-sized temps (upcast + product) per unrolled body,
    # empirically padded: Mosaic's scoped-stack usage is not exactly
    # liveness-based
    budget = 8 * 1024 * 1024
    per_row = 2 * 9 * (2 * R + 2) * W * C * 4
    for t in (8, 6, 4, 3, 2, 1):
        if H % t == 0 and t * per_row <= budget:
            return t
    return 1


def _dcn_kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, out_ref, cols_ref,
                acc_ref, *, H, W, C, Cout, tile_h, R, PAD):
    t = pl.program_id(1)
    row0 = t * tile_h

    offs = off_ref[0]                    # (tile_h, W, 18) f32
    masks = mask_ref[0]                  # (tile_h, W, 9) f32

    S = 2 * R + 2                        # shifts per axis

    # Mosaic constraints shaped this loop nest (each was found the hard
    # way — see git history):
    #  * tap loop: Python unroll — no dynamic_slice on VALUES, no >2D
    #    gather, so per-tap channel picks must be STATIC slices;
    #  * column shifts: Python unroll — a TRACED lane-dim (second-minor+)
    #    dynamic-slice start crashes the Mosaic compiler;
    #  * row shifts: fori_loop (traced sublane starts are fine);
    #  * accumulate into a VMEM scratch REF, not a value chain — unrolled
    #    (tile_h, W, C) value temporaries blow the 16M scoped-vmem stack.
    for k in range(9):
        ty, tx = k // 3, k % 3
        # static slices (NOT integer indexing, which lowers to a 3D gather)
        dy = jnp.clip(offs[:, :, 2 * k:2 * k + 1][:, :, 0], -R, R)
        dx = jnp.clip(offs[:, :, 2 * k + 1:2 * k + 2][:, :, 0], -R, R)
        mk = masks[:, :, k:k + 1]

        acc_ref[:] = jnp.zeros((tile_h, W, C), jnp.float32)
        for sx in range(-R, R + 2):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))

            def row_body(s, carry, wx=wx, sx=sx, dy=dy, ty=ty, tx=tx):
                sy = s - R
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
                # padded-image row of output row r is r + PAD; sample row
                # is r - 1 + ty + sy -> start = row0 + PAD - 1 + ty + sy
                xs = x_ref[0, pl.ds(row0 + PAD - 1 + ty + sy, tile_h),
                           pl.ds(PAD - 1 + tx + sx, W), :]
                acc_ref[:] = acc_ref[:] + \
                    xs.astype(jnp.float32) * (wy * wx)[:, :, None]
                return carry

            jax.lax.fori_loop(0, S, row_body, 0)
        cols_ref[:, pl.ds(k * C, C)] = (acc_ref[:] * mk).reshape(
            tile_h * W, C).astype(cols_ref.dtype)

    out = jax.lax.dot_general(
        cols_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.reshape(tile_h, W, Cout).astype(out_ref.dtype)


def _pallas_forward(x, offset18, mask, weight, bias, radius: int):
    B, H, W, C = x.shape
    Cout = weight.shape[-1]
    R = radius
    PAD = 1 + R + 1
    tile_h = _pick_tile_h(H, W, C, radius)
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    Hp, Wp = H + 2 * PAD, W + 2 * PAD
    try:
        # keep the operand out of VMEM: inside a large program XLA may place
        # it there (S(1)), double-counting it against the 16M scoped budget
        xp = pltpu.with_memory_space_constraint(xp, pltpu.HBM)
    except Exception:
        pass

    kern = functools.partial(_dcn_kernel, H=H, W=W, C=C, Cout=Cout,
                             tile_h=tile_h, R=R, PAD=PAD)
    grid = (B, H // tile_h)
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
        scratch_shapes=[pltpu.VMEM((tile_h * W, 9 * C), jnp.float32),
                        pltpu.VMEM((tile_h, W, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * Cout +
            B * H * W * 9 * (2 * R + 2) ** 2 * C * 2,
            bytes_accessed=B * Hp * Wp * C * x.dtype.itemsize * (H // tile_h),
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


def _dcn_bwd(radius, res, g):
    # backward through the mathematically identical XLA windowed path
    x, offset18, mask, weight, bias = res
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
