"""Vectorised RoIAlign for TPU.

Matches torchvision's legacy RoIAlign with aligned=False (the reference's
cost-volume pooling, /root/reference/src/lib/models/networks/
stereo_network_old.py:271: RoIAlign((16,16), spatial_scale=1,
sampling_ratio=2)): fixed sampling grid per bin, zero outside the feature
map (sample coords < -1 or > size give 0, otherwise clamped bilinear),
averaged over the sampling points.

Everything is fixed-shape: rois come as (N, 4) boxes plus an (N,) int batch
index; invalid rois are simply pooled garbage the caller masks later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pool_interp_matrix(lo: jnp.ndarray, hi: jnp.ndarray, size: int,
                       out_size: int, sampling_ratio: int) -> jnp.ndarray:
    """Averaged bilinear-interpolation matrix for one axis of RoIAlign.

    RoIAlign is linear in the feature map, so pooling one axis is a matmul
    with a (P, size) weight matrix: W[p, j] = mean over the S samples of bin
    p of their bilinear weight onto integer coordinate j (torchvision
    semantics: sample < -1 or > size contributes 0, otherwise clamped).

    lo, hi: (...,) box extents along the axis, already in feature pixels.
    Returns (..., P, size) float32.
    """
    P, S = out_size, sampling_ratio
    extent = jnp.maximum(hi - lo, 1.0)
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S   # bin units
    s = lo[..., None] + (extent / P)[..., None] * grid        # (..., P*S)
    valid = (s >= -1.0) & (s <= float(size))
    sc = jnp.clip(s, 0.0, size - 1.0)
    j = jnp.arange(size, dtype=jnp.float32)
    tri = jnp.maximum(0.0, 1.0 - jnp.abs(sc[..., None] - j))  # (..., P*S, size)
    tri = tri * valid[..., None]
    return tri.reshape(tri.shape[:-2] + (P, S, size)).mean(-2)


def roi_align_mm(feat: jnp.ndarray, boxes: jnp.ndarray,
                 batch_idx: jnp.ndarray, out_size: int,
                 spatial_scale: float = 1.0, sampling_ratio: int = 2
                 ) -> jnp.ndarray:
    """`roi_align` reformulated as two MXU contractions (zero gathers).

    out[n] = Wy[n] @ feat[batch_idx[n]] @ Wx[n]^T with the S*S sample
    average folded into the interpolation matrices.  The per-roi feature
    lookup becomes a per-image einsum masked by the batch index (B is tiny
    here), so XLA sees only dense matmuls.  Matches `roi_align` exactly up
    to float associativity."""
    B, H, W, C = feat.shape
    N = boxes.shape[0]
    P = out_size
    b = boxes * spatial_scale
    Wy = pool_interp_matrix(b[:, 1], b[:, 3], H, P, sampling_ratio)
    Wx = pool_interp_matrix(b[:, 0], b[:, 2], W, P, sampling_ratio)

    feat32 = feat.astype(jnp.float32)
    out = jnp.zeros((N, P, W, C), jnp.float32)
    for bi in range(B):
        sel = (batch_idx == bi).astype(jnp.float32)[:, None, None]
        ytmp = jnp.einsum("nph,hwc->npwc", Wy * sel, feat32[bi],
                          preferred_element_type=jnp.float32)
        out = out + ytmp
    out = jnp.einsum("nqw,npwc->npqc", Wx, out,
                     preferred_element_type=jnp.float32)
    return out.astype(feat.dtype)


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, batch_idx: jnp.ndarray,
              out_size: int, spatial_scale: float = 1.0,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """feat: (B, H, W, C); boxes: (N, 4) x1,y1,x2,y2; batch_idx: (N,) int.
    Returns (N, out_size, out_size, C)."""
    B, H, W, C = feat.shape
    N = boxes.shape[0]
    P = out_size
    S = sampling_ratio

    x1 = boxes[:, 0] * spatial_scale
    y1 = boxes[:, 1] * spatial_scale
    x2 = boxes[:, 2] * spatial_scale
    y2 = boxes[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P

    # sampling coordinates: (N, P*S) per axis
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S  # bin units
    sy = y1[:, None] + bin_h[:, None] * grid[None, :]        # (N, P*S)
    sx = x1[:, None] + bin_w[:, None] * grid[None, :]

    # torchvision: coords < -1 or > size -> 0; else clamp to [0, size-1]
    vy = (sy >= -1.0) & (sy <= H * 1.0)
    vx = (sx >= -1.0) & (sx <= W * 1.0)
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

    # one global gather over (B*H*W, C): folding the batch index into the
    # plane index avoids materialising a per-roi copy of the feature map.
    # Gather at f32 width: packed-bf16 gathers are ~30% slower on this XLA
    # (same finding as ops/deform_conv.py)
    from .deform_conv import _row_gather
    gdt = jnp.float32 if feat.dtype in (jnp.bfloat16, jnp.float16) \
        else feat.dtype
    feat_flat = feat.astype(gdt).reshape(B * H * W, C)
    base = batch_idx.astype(jnp.int32) * (H * W)
    S2 = (P * S) * (P * S)

    def gather(yi, xi):
        # (N, P*S, P*S) flattened plane indices -> (N, (P*S)^2, C)
        idx = (base[:, None, None] + yi[:, :, None] * W +
               xi[:, None, :]).reshape(N * S2)
        return _row_gather(feat_flat, idx).reshape(N, S2, C)

    dt = gdt
    w00 = ((1 - fy)[:, :, None] * (1 - fx)[:, None, :]).reshape(N, -1, 1)
    w01 = ((1 - fy)[:, :, None] * fx[:, None, :]).reshape(N, -1, 1)
    w10 = (fy[:, :, None] * (1 - fx)[:, None, :]).reshape(N, -1, 1)
    w11 = (fy[:, :, None] * fx[:, None, :]).reshape(N, -1, 1)

    val = (gather(y0, x0) * w00.astype(dt) + gather(y0, x1i) * w01.astype(dt) +
           gather(y1i, x0) * w10.astype(dt) +
           gather(y1i, x1i) * w11.astype(dt))

    valid = (vy[:, :, None] & vx[:, None, :]).reshape(N, -1, 1)
    val = val * valid.astype(val.dtype)

    # average the S x S samples of each bin; back to the feature dtype
    val = val.reshape(N, P, S, P, S, C)
    return val.mean(axis=(2, 4)).astype(feat.dtype)
