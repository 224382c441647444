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


def _bilinear_gather(x_flat: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                     H: int, W: int) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    x_flat: (B, H*W, C); sy/sx: (B, P) fractional pixel coords.
    Returns (B, P, C).
    """
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0

    out = None
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        w = ((fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx))
        inb = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        idx = yi * W + xi                                   # (B, P)
        v = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
        w = (w * inb).astype(x_flat.dtype)
        term = v * w[..., None]
        out = term if out is None else out + term
    return out


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                  stride: int = 1, padding: int = 1, dilation: int = 1
                  ) -> jnp.ndarray:
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
    offset/mask-producing convolution)."""
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
