#!/usr/bin/env python
"""Profile the jitted inference program (backbone + heads + cost volume +
decode — the same program bench.py times) on TPU and print top device ops
by self time.

    python tools/infer_profile.py [--steps 4] [--batch 2]

Complements tools/train_profile.py: the infer step's non-DCN residual
(step wall minus the modeled kernel totals from tools/dcn_layer_bench.py)
needs an op-level breakdown to direct optimisation.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--trace_dir", default="/tmp/infer_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.abspath(repo))
    import __graft_entry__ as ge
    from train_profile import print_xplane_ops

    fn_raw, (variables, batch) = ge.entry()
    fn = jax.jit(fn_raw)   # entry() returns the fn un-jitted by contract
    batch = {k: jnp.concatenate([v] * args.batch, axis=0)
             for k, v in batch.items()}

    t0 = time.time()
    dets, _, _ = fn(variables, batch)
    float(jnp.asarray(dets[0, 0, 4]))
    print(f"compile+first step: {time.time()-t0:.1f}s", flush=True)

    def run_n(n):
        t0 = time.perf_counter()
        d = None
        for _ in range(n):
            d, _, _ = fn(variables, batch)
        float(jnp.asarray(d[0, 0, 4]))      # host fetch = real sync
        return time.perf_counter() - t0

    t2 = run_n(2)
    t10 = run_n(10)
    print(f"[infer-profile] {(t10 - t2) / 8 * 1e3:.1f} ms/step "
          f"(batch {args.batch})", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        run_n(args.steps)
    print_xplane_ops(args.trace_dir, tag="infer-profile")


if __name__ == "__main__":
    main()
