#!/usr/bin/env python
"""VPU roofline for the packed Pallas DCN BACKWARD kernels (VERDICT r4 #1).

Companion to tools/dcn_roofline.py (which pinned the forward at <=1.10x its
bilinear op floor).  Method: time the SAME kernel plumbing — halo windows,
VMEM scratch, lane expansion, per-tap MXU matmuls (g@W_k^T, lane reduces,
d_weight) and outputs — with three per-tap arithmetic bodies of known
CP-wide vector-op counts (SIDE_TPU_DCN_BWD_ROOF in ops/dcn_pallas_bwd):

  d_x ("col2im", all-read):
    prod   — triangle weights over the (2R+1)^2 shift sweep: ~69 ops/tap
             (3 sy x [wy 4 + vy 1 + 3 sx x (wx 4 + fma 2)])
    lerp0  — fixed-neighbour-base frac lerp over the 2x2 window any
             fractional col2im must touch: ~16 ops/tap.  NOT a valid DCN
             d_x — it skips neighbour selection; the prod/lerp0 gap prices
             the all-read 3x3 sweep + selects that a scatter-free TPU
             formulation must pay.
    copy   — static-window adds, same slice traffic: ~9 ops/tap (pure data
             movement + the shared MXU work).

  d_offset/d_mask/d_weight ("col2im_coord", forward recompute):
    prod   — select-lerp recompute + value/dy/dx streams: ~34 ops/tap
    lerp0  — fixed-base 2x2 recompute: ~12 ops/tap
    copy   — one static slice aliased into all three streams: ~1 op/tap

If (prod - lerp0) time scales with the op-count difference, the kernel is
VPU-arithmetic-bound and only a cheaper formulation (none known — the
triangle sweep IS minimal for all-read col2im) moves it; if prod ~= copy,
it is VMEM-traffic/MXU-bound and done.  Prints per-kernel tables and the
modeled in-model totals.

    python tools/dcn_bwd_roofline.py [--iters 30] [--shapes big,mid,mid2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# dominant packed (C<=128) stereo-concat TRAIN shapes (batch 2 -> B=4)
# with their per-step layer counts, as in tools/dcn_roofline.py
SHAPES = {
    "big": (4, 96, 320, 64, 64, 5),
    "mid": (4, 48, 160, 128, 64, 4),
    "mid2": (4, 48, 160, 128, 128, 2),
}
OPS = {
    "dx": {"": 69.0, "lerp0": 16.0, "copy": 9.0},
    "dcoord": {"": 34.0, "lerp0": 12.0, "copy": 1.0},
}
LABEL = {"": "prod", "lerp0": "lerp0", "copy": "copy"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shapes", default="big,mid,mid2")
    ap.add_argument("--parts", default="dx,dcoord")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.ops import dcn_pallas_bwd as dpb

    assert int(os.environ.get("SIDE_TPU_DCN_RADIUS", "1")) == 1, \
        "op counts above are R=1"

    results = {}
    for name in args.shapes.split(","):
        B, H, W, Cin, Cout, count = SHAPES[name]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32)
        g = jnp.asarray(rng.randn(B, H, W, Cout) * 0.5, jnp.bfloat16)
        offset = jnp.asarray(rng.uniform(-1.5, 1.5, (B, H, W, 18)),
                             jnp.float32)
        mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

        for part in args.parts.split(","):
            for mode in ("", "lerp0", "copy"):
                dpb._ROOF = mode          # read at trace time

                @jax.jit
                def step(g, carry, x=x, offset=offset, mask=mask, w=w,
                         part=part):
                    outs = dpb.dcn_packed_backward(
                        x, offset, mask, w, g + carry, radius=1,
                        parts=(part,))
                    tot = sum(o.astype(jnp.float32).mean()
                              for o in outs if o is not None)
                    return (tot * 1e-6).astype(g.dtype)

                t0 = time.time()
                float(step(g, jnp.zeros((), g.dtype)))
                compile_s = time.time() - t0

                def t(n):
                    c = jnp.zeros((), g.dtype)
                    t0 = time.perf_counter()
                    for _ in range(n):
                        c = step(g, c)
                    float(c)
                    return time.perf_counter() - t0

                n_s, n_b = max(2, args.iters // 5), args.iters
                t(2)
                ts = min(t(n_s) for _ in range(2))
                tb = min(t(n_b) for _ in range(2))
                per = (tb - ts) / (n_b - n_s)
                results[(name, part, mode)] = per
                print(f"[bwd-roofline {name} {part}] {LABEL[mode]}: "
                      f"{per*1e3:.3f} ms (compile {compile_s:.0f}s)",
                      flush=True)
            dpb._ROOF = ""

            tl, t0_, tc = (results[(name, part, m)]
                           for m in ("", "lerp0", "copy"))
            ops = OPS[part]
            d_ops = ops[""] - ops["lerp0"]
            ns_per_op = (tl - t0_) / d_ops
            pred = tc + ns_per_op * (ops[""] - ops["copy"])
            print(f"[bwd-roofline {name} {part}] copy-floor {tc*1e3:.3f} "
                  f"ms | op-scaling predicts prod {pred*1e3:.3f} ms "
                  f"(measured {tl*1e3:.3f}; ratio {tl/max(pred,1e-9):.2f}) "
                  f"| prod/lerp0 {tl/max(t0_,1e-9):.2f} "
                  f"prod/copy {tl/max(tc,1e-9):.2f}", flush=True)

    for part in args.parts.split(","):
        tot_p = sum(results[(n, part, "")] * SHAPES[n][5]
                    for n in args.shapes.split(","))
        tot_0 = sum(results[(n, part, "lerp0")] * SHAPES[n][5]
                    for n in args.shapes.split(","))
        tot_c = sum(results[(n, part, "copy")] * SHAPES[n][5]
                    for n in args.shapes.split(","))
        print(f"[bwd-roofline] modeled in-model {part}: production "
              f"{tot_p*1e3:.1f} ms; fractional floor {tot_0*1e3:.1f} ms "
              f"(not a valid DCN); data-movement floor {tot_c*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
