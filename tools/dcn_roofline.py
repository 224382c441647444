#!/usr/bin/env python
"""VPU roofline for the packed Pallas DCN forward (VERDICT r3 #1d).

Is the production select-lerp kernel at the bound?  Method: time the SAME
kernel plumbing (grid, blocks, VMEM scratch, lane expansion, cols + MXU
contraction) with three accumulation bodies of known CP-wide vector-op
counts, at the dominant packed model shapes:

  lerp   — production R=1 select-lerp (deformable bilinear over bases
           {-1,0} per axis): ~31 CP-wide VPU ops per tap
           (frac/base extraction 8, x-select+lerp 5x3 rows, y-select+
           lerp 6, mask 1, base compares 2)
  lerp0  — the op-count FLOOR for ANY fractional-offset bilinear: fixed
           neighbour base, no selects (frac 4, x-lerp 3x2 rows, y-lerp 3,
           mask 1): ~14 ops per tap.  NOT a valid DCN — a kernel cannot
           do less arithmetic and still interpolate fractionally.
  copy   — static window * mask: ~1 op per tap.  The data-movement floor
           of building the (tile_h*W, 9*CP) cols scratch + the weight
           contraction (identical MXU work in all three).

If measured times scale with the op counts (after subtracting the shared
`copy` baseline), the kernel is VPU-arithmetic-bound: the only remaining
lever is a formulation with fewer ops.  Known alternatives at R=1:
separable triangle-weights (~27 ops; its accumulator variants measured
SLOWER in round 2/3 from register spills — dcn_pallas._ACCUM docs) and
bf16 compute (measured slower, _LERP_DT docs).  Print everything.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# dominant packed (C<=128) stereo-concat shapes from the DLAUp/IDAUp trace
SHAPES = {
    "big": (4, 96, 320, 64, 64, 5),
    "mid": (4, 48, 160, 128, 64, 4),
    "mid2": (4, 48, 160, 128, 128, 2),
}
# analytic CP-wide vector ops per tap per output pixel (R=1)
OPS = {"lerp": 31.0, "lerp0": 14.0, "copy": 1.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--shapes", default="big,mid,mid2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.ops import dcn_pallas as dp

    assert int(os.environ.get("SIDE_TPU_DCN_RADIUS", "1")) == 1, \
        "op counts above are R=1"

    results = {}
    for name in args.shapes.split(","):
        B, H, W, Cin, Cout, count = SHAPES[name]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32)
        b = jnp.zeros((Cout,), jnp.float32)
        offset = jnp.asarray(rng.uniform(-1.5, 1.5, (B, H, W, 9, 2)),
                             jnp.float32)
        mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

        for mode in ("lerp", "lerp0", "copy"):
            dp._ACCUM = mode          # read at trace time by the kernel

            @jax.jit
            def step(x, carry, offset=offset, mask=mask, w=w, b=b):
                y = dp.deform_conv2d_pallas(x + carry, offset, mask, w, b,
                                            radius=1)
                return (y.astype(jnp.float32).mean() * 1e-6).astype(x.dtype)

            t0 = time.time()
            float(step(x, jnp.zeros((), x.dtype)))
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
            results[(name, mode)] = per
            print(f"[roofline {name}] {mode}: {per*1e3:.3f} ms "
                  f"(compile {compile_s:.0f}s)", flush=True)
        dp._ACCUM = "lerp"

        tl, t0_, tc = (results[(name, m)] for m in ("lerp", "lerp0", "copy"))
        # ns per CP-wide op, from the two arithmetic-bearing variants
        d_ops = OPS["lerp"] - OPS["lerp0"]
        ns_per_op = (tl - t0_) / d_ops
        # predicted production time if perfectly op-scaled above the floor
        pred = tc + ns_per_op * (OPS["lerp"] - OPS["copy"])
        print(f"[roofline {name}] copy-floor {tc*1e3:.3f} ms | "
              f"op-scaling predicts lerp {pred*1e3:.3f} ms "
              f"(measured {tl*1e3:.3f}; ratio {tl/pred:.2f}) | "
              f"sep-triangle (27 ops) would be "
              f"{(tc + ns_per_op*26)*1e3:.3f} ms "
              f"({(1 - (tc + ns_per_op*26)/tl)*100:.0f}% off the layer)",
              flush=True)

    tot_l = sum(results[(n, "lerp")] * SHAPES[n][5]
                for n in args.shapes.split(","))
    tot_0 = sum(results[(n, "lerp0")] * SHAPES[n][5]
                for n in args.shapes.split(","))
    print(f"[roofline] modeled in-model packed-DCN: production "
          f"{tot_l*1e3:.1f} ms; absolute bilinear floor {tot_0*1e3:.1f} ms "
          f"(unreachable: no neighbour selection)", flush=True)


if __name__ == "__main__":
    main()
