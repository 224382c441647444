#!/usr/bin/env python
"""Micro-benchmark of deformable-conv gather formulations on the TPU.

Variants:
  A  current: per-batch jnp.take_along_axis on (B, HW, C)
  B  global flatten: fold batch into the row index, jnp.take(axis=0)
  C  explicit jax.lax.gather over rows
  D  one-row-gather: gather full (W*C) rows by y, then a second gather by x
  E  pallas kernel: per-(batch, tile) gather from a VMEM-resident image

Timing: two-length chained scan + host-fetch sync (see bench.py).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, H, W, C, K = 2, 96, 320, 64, 9


def make_inputs():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    sy = jnp.asarray(
        np.clip(rng.randn(B, H * W * K) * 2 +
                np.tile(np.repeat(np.arange(H), W), (B, 1)).repeat(K, 1)[:, :H * W * K], 0, H - 1),
        jnp.float32)
    # simpler: random positions in-bounds
    sy = jnp.asarray(rng.rand(B, H * W * K) * (H - 1), jnp.float32)
    sx = jnp.asarray(rng.rand(B, H * W * K) * (W - 1), jnp.float32)
    return x, sy, sx


def corners(sy, sx):
    import jax.numpy as jnp
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy, fx = sy - y0, sx - x0
    return (y0.astype(jnp.int32), x0.astype(jnp.int32), fy, fx)


def variant_A(x, sy, sx):
    import jax.numpy as jnp
    y0, x0, fy, fx = corners(sy, sx)
    flat = x.reshape(B, H * W, C)
    out = 0.
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = jnp.minimum(y0 + dy, H - 1)
        xi = jnp.minimum(x0 + dx, W - 1)
        idx = yi * W + xi
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        w = ((fy if dy else 1 - fy) * (fx if dx else 1 - fx)).astype(x.dtype)
        out = out + v * w[..., None]
    return jnp.sum(out.astype(jnp.float32))


def variant_B(x, sy, sx):
    import jax.numpy as jnp
    y0, x0, fy, fx = corners(sy, sx)
    flat = x.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    out = 0.
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = jnp.minimum(y0 + dy, H - 1)
        xi = jnp.minimum(x0 + dx, W - 1)
        idx = (base + yi * W + xi).reshape(-1)
        v = jnp.take_along_axis(flat, jnp.broadcast_to(idx[:, None], (TILE, C)), axis=0).reshape(B, -1, C)
        w = ((fy if dy else 1 - fy) * (fx if dx else 1 - fx)).astype(x.dtype)
        out = out + v * w[..., None]
    return jnp.sum(out.astype(jnp.float32))


def variant_C(x, sy, sx):
    import jax
    import jax.numpy as jnp
    y0, x0, fy, fx = corners(sy, sx)
    flat = x.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    out = 0.
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = jnp.minimum(y0 + dy, H - 1)
        xi = jnp.minimum(x0 + dx, W - 1)
        idx = (base + yi * W + xi).reshape(-1, 1)
        v = jax.lax.gather(flat, idx, dn, slice_sizes=(1, C),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        w = ((fy if dy else 1 - fy) * (fx if dx else 1 - fx)).astype(x.dtype)
        out = out + v.reshape(B, -1, C) * w[..., None]
    return jnp.sum(out.astype(jnp.float32))


def variant_E(x, sy, sx):
    """Pallas: whole image in VMEM per batch, flat 1-D tiles of samples."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = H * W * K              # samples per batch
    TILE = 7680                # samples per grid step
    TPB = P // TILE            # tiles per batch

    def kernel(x_ref, y0_ref, x0_ref, fy_ref, fx_ref, out_ref):
        y0 = y0_ref[:]
        x0 = x0_ref[:]
        fy = fy_ref[:]
        fx = fx_ref[:]
        flat = x_ref[:].reshape(H * W, C)
        acc = jnp.zeros((TILE, C), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                yi = jnp.minimum(y0 + dy, H - 1)
                xi = jnp.minimum(x0 + dx, W - 1)
                idx = yi * W + xi
                v = jnp.take_along_axis(flat, jnp.broadcast_to(idx[:, None], (TILE, C)), axis=0)
                w = ((fy if dy else 1 - fy) * (fx if dx else 1 - fx))
                acc += v.astype(jnp.float32) * w[:, None]
        out_ref[:] = acc.astype(out_ref.dtype)

    y0, x0, fy, fx = corners(sy, sx)
    grid = (B * TPB,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda t: (t // TPB, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * P, C), x.dtype),
    )(x, y0.reshape(-1), x0.reshape(-1), fy.reshape(-1), fx.reshape(-1))
    return jnp.sum(out.astype(jnp.float32))


def time_variant(name, fn, args, n_small=4, n_big=24):
    import jax
    import jax.numpy as jnp

    def chained(x, sy, sx, n):
        def step(carry, _):
            s = fn(x, sy + carry * 0.0, sx)
            return s * 0 + carry + 1e-6, s
        _, out = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return out

    try:
        run = jax.jit(chained, static_argnames=("n",))
        c_s = run.lower(*args, n=n_small).compile()
        c_b = run.lower(*args, n=n_big).compile()

        def t(c):
            t0 = time.perf_counter()
            float(jnp.sum(c(*args)))
            return time.perf_counter() - t0

        t(c_s)
        ts = min(t(c_s) for _ in range(2))
        tb = min(t(c_b) for _ in range(2))
        per = (tb - ts) / (n_big - n_small)
        print(f"{name}: {per * 1e3:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def main():
    import jax
    x, sy, sx = make_inputs()
    args = (x, sy, sx)
    for name, fn in [("A take_along_axis", variant_A),
                     ("B global take", variant_B),
                     ("C lax.gather PROMISE_IN_BOUNDS", variant_C),
                     ("E pallas vmem gather", variant_E)]:
        time_variant(name, fn, args)


if __name__ == "__main__":
    main()
