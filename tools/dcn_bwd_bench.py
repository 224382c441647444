#!/usr/bin/env python
"""Compile + time the two Pallas DCN backward kernels in isolation.

    python tools/dcn_bwd_bench.py [--shape big] [--parts dx,dcoord,all]

Bisects which backward kernel is responsible for compile time / runtime
(the combined program did not compile within 30 min on round 2 day 1).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.dcn_layer_bench import SHAPES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="big")
    ap.add_argument("--parts", default="dx,dcoord")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--radius", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.ops import dcn_pallas_bwd as BW

    B, H, W, Cin, Cout, count = SHAPES[args.shape]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32)
    offset18 = jnp.asarray(rng.uniform(-min(1.5, args.radius), min(1.5, args.radius), (B, H, W, 18)),
                           jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout) * 0.1, jnp.bfloat16)

    for part in args.parts.split(","):
        os.environ["SIDE_TPU_DCN_BWD_PART"] = part

        @jax.jit
        def run(x, offset18, mask, w, g, part=part):
            outs = BW.dcn_packed_backward(x, offset18, mask, w, g, args.radius,
                                          parts=(part,) if part != "all"
                                          else ("dx", "dcoord"))
            return sum(o.astype(jnp.float32).sum() for o in outs
                       if o is not None)

        t0 = time.time()
        val = float(run(x, offset18, mask, w, g))
        print(f"[{args.shape} {part}] compile+run {time.time()-t0:.0f}s "
              f"(val={val:.3e})", flush=True)

        def t(n):
            t0 = time.perf_counter()
            s = None
            for _ in range(n):
                s = run(x, offset18, mask, w, g)
            float(s)
            return time.perf_counter() - t0

        n_s, n_b = max(2, args.iters // 5), args.iters
        t(2)
        ts = min(t(n_s) for _ in range(2))
        tb = min(t(n_b) for _ in range(2))
        per = (tb - ts) / (n_b - n_s)
        print(f"[{args.shape} {part}] {per*1e3:.3f} ms "
              f"(x{count} in model = {per*count*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
