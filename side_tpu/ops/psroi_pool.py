"""Deformable position-sensitive RoI pooling.

API-parity op for the reference's DCNv2 pooling kernel
(/root/reference/src/lib/models/networks/DCNv2/src/cuda/
dcn_v2_psroi_pooling_cuda.cu:59-148, exposed as DCNPooling in
dcn_v2.py:132-303).  SIDE's model never calls it (it uses RoIAlign,
SURVEY.md §2 N2) but it completes the deformable-op surface.

Each output bin (i, j) of each output channel c averages
`sample_per_part`^2 bilinear samples from the position-sensitive input
channel (c * group_size + gy) * group_size + gx; an optional per-bin
(dy, dx) offset — scaled by trans_std and the roi size — deforms the bins.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def psroi_pool(feat: jnp.ndarray, rois: jnp.ndarray, batch_idx: jnp.ndarray,
               out_size: int, output_dim: int, group_size: int = 1,
               spatial_scale: float = 1.0, sample_per_part: int = 4,
               trans: Optional[jnp.ndarray] = None,
               trans_std: float = 0.0, no_trans: bool = False) -> jnp.ndarray:
    """feat: (B, H, W, C) with C == output_dim * group_size**2;
    rois: (N, 4) x1,y1,x2,y2; trans: (N, out_size, out_size, 2) bin offsets.
    Returns (N, out_size, out_size, output_dim)."""
    B, H, W, C = feat.shape
    N = rois.shape[0]
    P = out_size
    S = sample_per_part
    G = group_size
    assert C == output_dim * G * G, (C, output_dim, G)

    # roi geometry (kernel rounds to integer grid then pads by 0.5 each side)
    x1 = jnp.round(rois[:, 0]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 2]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / P
    bin_h = roi_h / P

    if trans is None or no_trans:
        trans = jnp.zeros((N, P, P, 2), feat.dtype)

    # per-bin deformation offsets in roi units
    dy = trans[..., 0] * trans_std * roi_h[:, None, None]
    dx = trans[..., 1] * trans_std * roi_w[:, None, None]

    # sample grid inside each bin: (P, S) positions per axis
    sub = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    gy = y1[:, None, None] + bin_h[:, None, None] * (
        jnp.arange(P, dtype=jnp.float32)[None, :, None] + sub[None, None, :])
    gx = x1[:, None, None] + bin_w[:, None, None] * (
        jnp.arange(P, dtype=jnp.float32)[None, :, None] + sub[None, None, :])
    # apply bin offsets: (N, P, S) + (N, P, P) -> (N, P, P, S)
    sy = gy[:, :, None, :] + dy[..., None]                  # (N, Py, Px, S)
    sx = gx[:, None, :, :] + dx[..., None]

    inb = ((sy[:, :, :, :, None] >= -0.5) & (sy[:, :, :, :, None] <= H - 0.5) &
           (sx[:, :, :, None, :] >= -0.5) & (sx[:, :, :, None, :] <= W - 0.5))
    syc = jnp.clip(sy, 0.0, H - 1.0)
    sxc = jnp.clip(sx, 0.0, W - 1.0)

    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    fy = syc - y0
    fx = sxc - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, H - 1)
    x1i = jnp.minimum(x0 + 1, W - 1)

    # position-sensitive channel per (bin, output channel):
    # gidx = (c*G + gy_bin)*G + gx_bin  where gy/gx bin -> group cell
    gy_bin = jnp.clip((jnp.arange(P) * G) // P, 0, G - 1)   # (P,)
    gx_bin = gy_bin
    cch = (jnp.arange(output_dim)[:, None, None] * G +
           gy_bin[None, :, None]) * G + gx_bin[None, None, :]  # (D, Py, Px)

    flat = feat.reshape(B * H * W, C)
    base = batch_idx.astype(jnp.int32) * (H * W)

    def corner(yi, xi, wgt):
        # yi: (N,Py,Px,S) rows; xi: (N,Py,Px,S) cols -> combine to
        # (N,Py,Px,S,S) plane indices
        idx = (base[:, None, None, None, None] +
               yi[:, :, :, :, None] * W + xi[:, :, :, None, :])
        vals = jnp.take(flat, idx.reshape(N, -1), axis=0)   # (N, *, C)
        vals = vals.reshape(N, P, P, S, S, C)
        return vals * wgt[..., None]

    w00 = ((1 - fy)[:, :, :, :, None] * (1 - fx)[:, :, :, None, :])
    w01 = ((1 - fy)[:, :, :, :, None] * fx[:, :, :, None, :])
    w10 = (fy[:, :, :, :, None] * (1 - fx)[:, :, :, None, :])
    w11 = (fy[:, :, :, :, None] * fx[:, :, :, None, :])

    val = (corner(y0, x0, w00) + corner(y0, x1i, w01) +
           corner(y1i, x0, w10) + corner(y1i, x1i, w11))    # (N,P,P,S,S,C)
    val = val * inb[..., None].astype(val.dtype)
    pooled_all = val.mean(axis=(3, 4))                      # (N, P, P, C)

    # pick the position-sensitive channel per (bin, out-channel)
    cch_b = jnp.broadcast_to(cch.transpose(1, 2, 0)[None],
                             (N, P, P, output_dim))
    return jnp.take_along_axis(pooled_all, cch_b, axis=-1)
