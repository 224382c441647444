#!/usr/bin/env python
"""Single-layer Pallas DCN timing on TPU at the real DLA shapes.

Each layer compiles standalone in well under a minute (unlike the in-model
program), so kernel variants can be compared quickly:

    python tools/dcn_layer_bench.py [--shapes big,mid] [--iters 30]
Env: SIDE_TPU_DCN_UNROLL, SIDE_TPU_DCN_RADIUS, SIDE_TPU_DCN_VMEM.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (B, H, W, Cin, Cout, count_in_model) — from the DLAUp/IDAUp trace at
# bench batch 2 (backbone sees the concatenated 2B stereo batch)
SHAPES = {
    "big": (4, 96, 320, 64, 64, 5),
    # batch-2 inference shapes (bench.py runs batch 2)
    "big_b2": (2, 96, 320, 64, 64, 5),
    "mid_b2": (2, 48, 160, 128, 64, 4),
    "mid2_b2": (2, 48, 160, 128, 128, 2),
    "small_b2": (2, 24, 80, 256, 128, 2),
    "small2_b2": (2, 24, 80, 256, 64, 1),
    "small3_b2": (2, 24, 80, 256, 256, 1),
    "tiny_b2": (2, 12, 40, 512, 256, 1),
    "mid": (4, 48, 160, 128, 64, 4),
    "mid2": (4, 48, 160, 128, 128, 2),
    "small": (4, 24, 80, 256, 128, 2),
    "small2": (4, 24, 80, 256, 64, 1),
    "small3": (4, 24, 80, 256, 256, 1),
    "tiny": (4, 12, 40, 512, 256, 1),
    # layout proxies (not real model shapes): same element count as "big"
    # with the batch packed into lanes
    "bigpack": (1, 96, 320, 256, 64, 5),
    "midpack": (1, 48, 160, 512, 64, 6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="big,mid,mid2,small,tiny")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--mode", default="pallas")
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (value_and_grad wrt x/offset/mask/w)")
    ap.add_argument("--radius", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.ops import deform_conv
    from side_tpu.ops.dcn_pallas import deform_conv2d_pallas
    from side_tpu.ops.deform_conv import deform_conv2d_windowed

    total = 0.0
    for name in args.shapes.split(","):
        B, H, W, Cin, Cout, count = SHAPES[name]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32)
        b = jnp.zeros((Cout,), jnp.float32)
        offset = jnp.asarray(rng.uniform(-1.5, 1.5, (B, H, W, 9, 2)),
                             jnp.float32)
        mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

        fn0 = {"pallas": deform_conv2d_pallas,
               "windowed": deform_conv2d_windowed,
               "exact": deform_conv._deform_conv2d_gather}[args.mode]
        if args.mode in ("pallas", "windowed"):
            import functools
            fn = functools.partial(fn0, radius=args.radius)
        else:
            fn = fn0

        if args.grad:
            @jax.jit
            def step(x, carry, offset=offset, mask=mask, w=w, b=b, fn=fn):
                def loss(x_, o_, m_, w_):
                    return fn(x_, o_, m_, w_, b).astype(jnp.float32).mean()
                val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    x + carry, offset, mask, w)
                extra = sum(g.astype(jnp.float32).sum() for g in grads)
                return ((val + extra * 1e-9) * 1e-6).astype(x.dtype)
        else:
            @jax.jit
            def step(x, carry, offset=offset, mask=mask, w=w, b=b, fn=fn):
                y = fn(x + carry, offset, mask, w, b)
                return (y.astype(jnp.float32).mean() * 1e-6).astype(x.dtype)

        t0 = time.time()
        carry = step(x, jnp.zeros((), x.dtype))
        float(carry)
        compile_s = time.time() - t0

        def t(n):
            c = jnp.zeros((), x.dtype)
            t0 = time.perf_counter()
            for _ in range(n):
                c = step(x, c)
            float(c)
            return time.perf_counter() - t0

        n_s, n_b = args.iters // 5, args.iters
        t(2)
        ts = min(t(n_s) for _ in range(2))
        tb = min(t(n_b) for _ in range(2))
        per = (tb - ts) / (n_b - n_s)
        gflop_vpu = B * H * W * Cin * 9 * (2*args.radius+2)**2 * 2 / 1e9
        print(f"[layer {name}] {args.mode}: {per*1e3:.3f} ms "
              f"(x{count} in model = {per*count*1e3:.1f} ms; "
              f"vpu {gflop_vpu/per/1e3:.2f} TFLOP/s; compile {compile_s:.0f}s)",
              flush=True)
        total += per * count
    print(f"[layer-bench] modeled in-model DCN total: {total*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
