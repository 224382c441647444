"""Modulated deformable convolution v2 for TPU.

TPU-native re-design of the reference's CUDA kernel
(/root/reference/src/lib/models/networks/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:
modulated_deformable_im2col_gpu_kernel at :125, bilinear tap at :25-54): each
of the kh*kw taps of a regular conv is sampled at a learned fractional offset
with zero padding outside the image, scaled by a learned sigmoid mask, and
the resulting "deformable im2col" columns contract against the weights on
the MXU via one big `dot_general`.

Gradients come for free through XLA's gather/scatter transpose — equivalent
to the hand-written col2im/col2im_coord kernels (dcn_v2_im2col_cuda.cu:197,
:256) — so `jax.grad` matches the reference's analytic backward.

Layouts (TPU-native):
    x:      (B, H, W, Cin)            NHWC
    offset: (B, Ho, Wo, kh*kw, 2)     (dy, dx) per tap
    mask:   (B, Ho, Wo, kh*kw)        modulation in [0, 1]
    weight: (kh, kw, Cin, Cout)       HWIO
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


import contextlib as _contextlib
import os as _os

# bilinear-gather formulation.  Measured in the FULL backbone on v5e
# (batch 2, 384x1280, bf16 activations; micro-benchmarks with random
# indices mislead here — real sample positions are near-sequential):
#   "take_batch" + f32-width gathers (default)                    227 ms
#   "take_batch" per-batch take_along_axis on packed bf16         292 ms
#   "patch"      ONE lax.gather of (2, 2, C) corner patches       276 ms
#   "gather"     row lax.gather PROMISE_IN_BOUNDS, batch folded   332 ms
#   "take"       jnp.take(axis=0), batch folded                   380 ms
#   "windowed"   gather-free shift decomposition r2/r1        386/132 ms
# All are far off HBM roofline (~5 ms of traffic): XLA scalarises these
# gathers, and packed-bf16 gathers are ~30% slower than f32-width ones.
# A Mosaic in-kernel gather was rejected by the compiler (large dynamic
# tables unsupported) — see tools/gather_microbench.py.
_GATHER_MODE = _os.environ.get("SIDE_TPU_GATHER", "take_batch")
_GATHER_F32 = _os.environ.get("SIDE_TPU_GATHER_F32", "1") == "1"


def _row_gather(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of (R, C) at flat int32 indices (N,) -> (N, C).
    Indices must be pre-clipped in-bounds."""
    if _GATHER_MODE == "gather":
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(
            flat, idx[:, None], dn, slice_sizes=(1, flat.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return jnp.take(flat, idx, axis=0)


def _bilinear_patch_gather(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray
                           ) -> jnp.ndarray:
    """Zero-padded bilinear sampling via ONE (2, 2, C)-patch gather per
    sample.  x: (B, H, W, C); sy/sx: (B, P).  Returns (B, P, C).

    Edge exactness: the patch start is clamped to H-2/W-2 and the fraction
    recomputed against it, so a sample exactly on the last row/col gets
    weight 1 on the correct pixel."""
    B, H, W, C = x.shape
    P = sy.shape[1]

    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fy = sy - y0f
    fx = sx - x0f

    # patch start clamped into the image; corners select PATCH-RELATIVE
    # rows/cols so border samples still read the correct pixel
    y0p = jnp.clip(y0f, 0, H - 2).astype(jnp.int32)
    x0p = jnp.clip(x0f, 0, W - 2).astype(jnp.int32)
    b_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, P))
    starts = jnp.stack([b_idx, y0p, x0p], axis=-1).reshape(B * P, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    patches = jax.lax.gather(
        x, starts, dn, slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patches = patches.reshape(B, P, 2, 2, C)

    out = jnp.zeros((B, P, C), x.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            w = ((fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx))
            cy = y0f + dy
            cx = x0f + dx
            v_ok = ((cy >= 0) & (cy <= H - 1) & (cx >= 0) & (cx <= W - 1))
            ry = (jnp.clip(cy.astype(jnp.int32) - y0p, 0, 1) == 1)
            rx = (jnp.clip(cx.astype(jnp.int32) - x0p, 0, 1) == 1)
            val = jnp.where(
                ry[..., None],
                jnp.where(rx[..., None], patches[:, :, 1, 1],
                          patches[:, :, 1, 0]),
                jnp.where(rx[..., None], patches[:, :, 0, 1],
                          patches[:, :, 0, 0]))
            out = out + val * (w * v_ok).astype(x.dtype)[..., None]
    return out


def _bilinear_gather(x_flat: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                     H: int, W: int) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    x_flat: (B, H*W, C); sy/sx: (B, P) fractional pixel coords.
    Returns (B, P, C).
    """
    B, HW, C = x_flat.shape
    if _GATHER_MODE == "patch":
        return _bilinear_patch_gather(x_flat.reshape(B, H, W, C), sy, sx)
    P = sy.shape[1]
    per_batch = _GATHER_MODE == "take_batch"
    if not per_batch:
        flat = x_flat.reshape(B * HW, C)
        base = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0

    # packed-bf16 gather lowering is ~30% slower than f32-width on this
    # XLA version; widen low-precision inputs for the gather (values
    # identical — bf16 embeds exactly in f32)
    widen = _GATHER_F32 and x_flat.dtype in (jnp.bfloat16, jnp.float16)
    gather_src = x_flat.astype(jnp.float32) if widen else x_flat

    out = None
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        w = ((fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx))
        inb = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        if per_batch:
            v = jnp.take_along_axis(gather_src, (yi * W + xi)[..., None],
                                    axis=1)
        else:
            idx = (base + yi * W + xi).reshape(-1)          # (B*P,)
            v = _row_gather(flat, idx).reshape(B, P, C)
        w = (w * inb).astype(v.dtype)
        term = v * w[..., None]
        out = term if out is None else out + term
    return out.astype(x_flat.dtype)


def deform_conv2d_windowed(x: jnp.ndarray, offset: jnp.ndarray,
                           mask: jnp.ndarray, weight: jnp.ndarray,
                           bias: Optional[jnp.ndarray] = None,
                           stride: int = 1, padding: int = 1,
                           dilation: int = 1, radius: int = 2) -> jnp.ndarray:
    """Gather-free deformable conv via shift decomposition.

    Bilinear sampling at (base_tap + delta) equals a sum over integer
    shifts s of triangle-kernel weights tri(dy-s_y)*tri(dx-s_x) times the
    STATICALLY shifted image — so with offsets clamped to [-radius, radius]
    the whole deformable im2col becomes (2*radius+2)^2 fused elementwise
    multiply-accumulates per tap and ZERO gathers.  XLA's gathers run at
    ~2% of HBM roofline on TPU for this access pattern (see _GATHER_MODE
    table); this trades them for VPU work that maps perfectly.

    EXACTLY equal to `deform_conv2d` whenever every learned offset lies in
    [-radius, radius] (true in practice: DCN offsets are zero-initialised
    and stay small); otherwise offsets are clamped — a deliberate
    TPU-first deviation from the unbounded reference kernel
    (dcn_v2_im2col_cuda.cu:125), gated by SIDE_TPU_DCN mode.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    R = radius

    dy = jnp.clip(offset[..., 0].astype(jnp.float32), -R, R)  # (B,Ho,Wo,K)
    dx = jnp.clip(offset[..., 1].astype(jnp.float32), -R, R)

    # pad so that every (tap + shift) window read is a static in-bounds
    # strided slice; zero padding reproduces the reference's border rule
    lo = padding + R + 1
    hi = padding + R + 1 + dilation * 2  # slack for tap extent
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))

    def shifted(ty, tx, sy, sx):
        """x sampled at (out*stride - padding + tap + shift) for all output
        positions: one strided static slice of the padded image."""
        oy = lo - padding + ty * dilation + sy
        ox = lo - padding + tx * dilation + sx
        return jax.lax.slice(
            xp, (0, oy, ox, 0),
            (B, oy + (Ho - 1) * stride + 1, ox + (Wo - 1) * stride + 1, Cin),
            (1, stride, stride, 1))

    cols = []
    for k in range(K):
        ty, tx = k // kw, k % kw
        dyk = dy[..., k]
        dxk = dx[..., k]
        acc = jnp.zeros((B, Ho, Wo, Cin), x.dtype)
        for sy in range(-R, R + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyk - sy))
            for sx in range(-R, R + 2):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxk - sx))
                w = (wy * wx).astype(x.dtype)
                acc = acc + shifted(ty, tx, sy, sx) * w[..., None]
        cols.append(acc * mask[..., k, None].astype(x.dtype))

    cols = jnp.stack(cols, axis=3)                    # (B, Ho, Wo, K, Cin)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    out = jax.lax.dot_general(
        cols.reshape(B, Ho * Wo, K * Cin),
        weight.reshape(K * Cin, Cout).astype(cols.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=acc_t)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)


# deformable-conv implementation: "exact" = gather-based (bit-faithful to
# the reference, unbounded offsets), "windowed" = XLA shift decomposition,
# "pallas" = fused Mosaic kernel of the windowed form; the windowed forms
# clamp offsets to +-SIDE_TPU_DCN_RADIUS.
# Production default on TPU is the Pallas kernel (the exact gather path
# scalarises to ~215 ms/step on v5e — see the _GATHER_MODE table); on CPU
# (tests, virtual meshes) Mosaic cannot lower, so default to exact.
#
# Default radius is 1 (round 3): the VPU shift work scales with
# (2R+2)^2 so R=1 runs 36/16 = 2.25x less of it — measured in-model
# 22.5 -> 32.4 infer pairs/s and 3.8 -> 5.3 train pairs/s on v5e — and
# the fixture-overfit acceptance floors (2D IoU, z, PRE-ALIGN z_cv, ry)
# all pass when trained under the R=1 clamp, with z errors [0.12, 0.30] m
# vs the R=2 calibration's [2.50, 0.51] m.  Like R=2 it is a train/eval
# consistency contract (stamped into checkpoints, see
# runtime/checkpoint.dcn_radius_tag); reference-trained unbounded weights
# must use SIDE_TPU_DCN=exact either way, so nothing is lost vs R=2.


_DCN_MODE = _os.environ.get("SIDE_TPU_DCN")  # resolved lazily: backend
# init must not happen at import time (jax.distributed.initialize ordering)


def _resolve_mode() -> str:
    global _DCN_MODE
    if _DCN_MODE is None:
        try:
            _DCN_MODE = ("pallas" if jax.default_backend() == "tpu"
                         else "exact")
        except Exception:
            _DCN_MODE = "exact"
    return _DCN_MODE


_DCN_MODES = ("exact", "windowed", "pallas")


def set_dcn_mode(mode: Optional[str]) -> Optional[str]:
    """Public setter for the deformable-conv implementation mode.

    Returns the previous mode (possibly None = not yet resolved) so callers
    can restore it; `None` resets to lazy backend-default resolution.
    Prefer this (or the `dcn_mode` context manager) over poking the
    module-private `_DCN_MODE` or the SIDE_TPU_DCN env var at runtime.
    """
    global _DCN_MODE
    if mode is not None and mode not in _DCN_MODES:
        raise ValueError(f"unknown DCN mode {mode!r}; one of {_DCN_MODES}")
    prev = _DCN_MODE
    _DCN_MODE = mode
    return prev


def get_dcn_mode() -> str:
    """Currently-effective DCN mode (resolves the lazy default)."""
    return _resolve_mode()


@_contextlib.contextmanager
def dcn_mode(mode: Optional[str]):
    """Scoped DCN mode override; restores the prior mode on exit."""
    prev = set_dcn_mode(mode)
    try:
        yield
    finally:
        set_dcn_mode(prev)


_DCN_RADIUS = int(_os.environ.get("SIDE_TPU_DCN_RADIUS", "1"))


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                  stride: int = 1, padding: int = 1, dilation: int = 1
                  ) -> jnp.ndarray:
    mode = _resolve_mode()
    if mode == "pallas":
        from .dcn_pallas import deform_conv2d_pallas
        return deform_conv2d_pallas(x, offset, mask, weight, bias, stride,
                                    padding, dilation, radius=_DCN_RADIUS)
    if mode == "windowed":
        return deform_conv2d_windowed(x, offset, mask, weight, bias,
                                      stride, padding, dilation,
                                      radius=_DCN_RADIUS)
    return _deform_conv2d_gather(x, offset, mask, weight, bias, stride,
                                 padding, dilation)


# fuse the offset/mask-producing conv into the packed Pallas program at
# inference (SIDE_TPU_DCN_FUSED=1 to enable).  Measured and rejected as the
# default on v5e: the in-kernel block-diagonal conv saves the offset
# relayout but costs more VPU time than XLA's MXU offset conv + relayout
# (full-model bench 47.9 vs 51.7 pairs/s, round 4) — kept as an opt-in for
# future shapes where the relayout dominates.
_FUSED_OM = _os.environ.get("SIDE_TPU_DCN_FUSED", "0") == "1"


def deform_conv2d_om(x: jnp.ndarray, w_om: jnp.ndarray, b_om: jnp.ndarray,
                     weight: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None,
                     train: bool = False) -> jnp.ndarray:
    """Full DCN block compute: offset_mask conv + modulated deformable conv.

    w_om/b_om: the raw 27-channel offset/mask conv parameters
    (3, 3, Cin, 27) / (27,), per-tap interleaved [dy, dx, mask-logit]
    (models/dla.py DeformBlock).  At inference in pallas mode the conv is
    evaluated inside the packed program on the lane-packed input — the
    27-lane conv and its offset relayouts disappear (round-4, VERDICT 1c).
    Training keeps the explicit composition so the Pallas backward kernels
    apply."""
    mode = _resolve_mode()
    if not train and mode == "pallas" and _FUSED_OM:
        from .dcn_pallas import deform_conv2d_pallas_fused
        return deform_conv2d_pallas_fused(x, w_om, b_om, weight, bias,
                                          radius=_DCN_RADIUS)
    B, H, W, _ = x.shape
    om = jax.lax.conv_general_dilated(
        x, w_om.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    om = (om + b_om.astype(om.dtype)).reshape(B, H, W, 9, 3)
    offset = om[..., 0:2].astype(jnp.float32)
    mask = jax.nn.sigmoid(om[..., 2].astype(jnp.float32))
    return deform_conv2d(x, offset, mask, weight, bias)


def _deform_conv2d_gather(x: jnp.ndarray, offset: jnp.ndarray,
                          mask: jnp.ndarray, weight: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          stride: int = 1, padding: int = 1,
                          dilation: int = 1) -> jnp.ndarray:
    """Modulated deformable conv (deformable_groups=1, SIDE's only config —
    dcn_v2.py:97-128 always passes deformable_groups=1)."""
    B, H, W, Cin = x.shape
    kh, kw, wc_in, Cout = weight.shape
    assert wc_in == Cin, (wc_in, Cin)
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    K = kh * kw
    assert offset.shape == (B, Ho, Wo, K, 2), offset.shape
    assert mask.shape == (B, Ho, Wo, K), mask.shape

    # base sampling grid for every tap: (Ho, Wo, K)
    cdt = jnp.promote_types(offset.dtype, jnp.float32)
    oy = jnp.arange(Ho, dtype=cdt) * stride - padding
    ox = jnp.arange(Wo, dtype=cdt) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh, dtype=cdt),
                          jnp.arange(kw, dtype=cdt), indexing="ij")
    ky = (ky * dilation).reshape(K)
    kx = (kx * dilation).reshape(K)
    base_y = oy[:, None, None] + ky[None, None, :]          # (Ho, 1, K)
    base_x = ox[None, :, None] + kx[None, None, :]          # (1, Wo, K)

    sy = (jnp.broadcast_to(base_y, (Ho, Wo, K))[None] +
          offset[..., 0].astype(cdt)).reshape(B, Ho * Wo * K)
    sx = (jnp.broadcast_to(base_x, (Ho, Wo, K))[None] +
          offset[..., 1].astype(cdt)).reshape(B, Ho * Wo * K)

    cols = _bilinear_gather(x.reshape(B, H * W, Cin), sy, sx, H, W)
    cols = cols.reshape(B, Ho * Wo, K, Cin)
    cols = cols * mask.reshape(B, Ho * Wo, K, 1).astype(cols.dtype)

    # (B, Ho*Wo, K*Cin) @ (K*Cin, Cout) on the MXU
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    out = jax.lax.dot_general(
        cols.reshape(B, Ho * Wo, K * Cin),
        weight.reshape(K * Cin, Cout).astype(cols.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=acc_t)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)


def plain_conv2d(x, weight, bias=None, stride=1, padding=1, dilation=1):
    """Regular NHWC conv via conv_general_dilated (for parity tests and the
    offset/mask-producing convolution).

    No preferred_element_type: its VJP builds a mixed-dtype conv (f32
    cotangent x bf16 kernel) which lax rejects; the TPU MXU accumulates in
    f32 internally either way."""
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
