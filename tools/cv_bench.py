#!/usr/bin/env python
"""TPU timing of the cost-volume segment in isolation.

Times proposal_shift + build_cost_volume (+ optionally CostVolumeNet) on
synthetic 1/4-res feature maps, for the matmul builder vs the gather
builder, at a sweep of inference K.  Fetch-synced two-length scan protocol
(same as bench.py).

    python tools/cv_bench.py [--ks 100,50,32] [--builders mm,gather]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="100,50,32")
    ap.add_argument("--builders", default="mm,gather")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--no_net", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.models import cost_volume as cv

    B = args.batch
    H, W, C = 96, 320, 32
    D = 16
    R = 16
    rng = np.random.RandomState(0)
    feat_l = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    feat_r = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)

    net = cv.CostVolumeNet(reduced_channels=C, dtype=jnp.bfloat16)

    for K in [int(k) for k in args.ks.split(",")]:
        cx = rng.uniform(20, 300, (B, K))
        cy = rng.uniform(10, 85, (B, K))
        hw = rng.uniform(4, 30, (B, K))
        hh = rng.uniform(3, 12, (B, K))
        bbox = jnp.asarray(np.stack([cx - hw, cy - hh, cx + hw, cy + hh], -1),
                           jnp.float32)
        disp = rng.uniform(1, 8, (B, K))
        br = np.asarray(bbox).copy()
        br[..., 0] -= disp
        br[..., 2] -= disp
        bbox_r = jnp.asarray(br)
        fb = jnp.full((B,), 380.0, jnp.float32)

        variables = None
        if not args.no_net:
            rl, rr, db = cv.proposal_shift(bbox, bbox_r, fb, D, W)
            cost0 = cv.build_cost_volume(feat_l, feat_r, rl, rr, R)
            variables = jax.jit(net.init)(jax.random.PRNGKey(0), cost0, db.reshape(B * K, D))

        for builder_name in args.builders.split(","):
            builder = (cv.build_cost_volume if builder_name == "mm"
                       else cv.build_cost_volume_gather)

            def seg(fl, frt, bb, bbr):
                rl, rr, db = cv.proposal_shift(bb, bbr, fb, D, W)
                cost = builder(fl, frt, rl, rr, R)
                if args.no_net:
                    return cost.astype(jnp.float32).sum()
                depth, _ = net.apply(variables, cost, db.reshape(B * K, D),
                                     train=False)
                return depth.astype(jnp.float32).sum()

            def chained(fl, frt, n):
                def step(carry, _):
                    s = seg(fl + carry, frt, bbox, bbox_r)
                    return (s * 1e-9).astype(fl.dtype), s
                _, ss = jax.lax.scan(step, jnp.zeros((), fl.dtype),
                                     None, length=n)
                return ss

            run = jax.jit(chained, static_argnames=("n",))
            n_small, n_big = 5, 25
            t0 = time.time()
            c_s = run.lower(feat_l, feat_r, n=n_small).compile()
            c_b = run.lower(feat_l, feat_r, n=n_big).compile()
            compile_s = time.time() - t0

            def t(c):
                t0 = time.perf_counter()
                float(jnp.sum(c(feat_l, feat_r)))
                return time.perf_counter() - t0

            t(c_s)
            ts = min(t(c_s) for _ in range(2))
            tb = min(t(c_b) for _ in range(2))
            per = (tb - ts) / (n_big - n_small)
            print(f"[cv_bench] K={K} builder={builder_name} "
                  f"net={not args.no_net}: {per*1e3:.2f} ms/iter "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
