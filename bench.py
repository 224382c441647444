#!/usr/bin/env python
"""Inference throughput benchmark on the real TPU chip.

Measures steady-state stereo pairs/sec through the FULL device path:
stereo DLA-34 backbone (both views), all heads, object-conditioned cost
volume + instance-depth head, and the CenterNet decode — i.e. everything the
reference times as `net`+`dec` (stereoDetector.py:84-103).

Timing is dependency-chained: the whole measurement loop is ONE jitted
`lax.scan` whose carry perturbs the next iteration's input with the previous
iteration's output, so no dispatch pipelining or caching can fake the
number; wall-clock covers `iters` strictly serial full-model executions.

Baseline: the only in-repo citable latency is the inherited monocular
CenterNet `ddd_3dop` at 31 ms/image on a TITAN Xp
(/root/reference/readme/MODEL_ZOO.md:80-83) => 32.26 img/s; vs_baseline is
our stereo pairs/sec divided by that (a stereo pair is strictly more work
than one monocular image, so this undersells the speedup).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import entry

    batch_size = int(os.environ.get("BENCH_BATCH", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    fn, (variables, batch) = entry()
    batch = {k: jnp.concatenate([v] * batch_size, axis=0)
             for k, v in batch.items()}

    def chained(variables, batch, n):
        def step(carry, _):
            b = dict(batch)
            b["input"] = batch["input"] + carry
            dets, dets_r, info = fn(variables, b)
            # tiny data dependency onto the next iteration
            new_carry = (dets[0, 0, 4] * 1e-6).astype(batch["input"].dtype)
            return new_carry, dets[0, 0, 4]
        _, scores = jax.lax.scan(step, jnp.zeros((), batch["input"].dtype),
                                 None, length=n)
        return scores

    # Through this image's remote-execution relay, `block_until_ready` does
    # NOT wait for device completion — only a host fetch truly synchronises
    # (calibrated with chained 8192^3 matmuls: fetch-synced timing lands at
    # ~173 bf16 TFLOP/s, i.e. v5e peak).  So every timing below brackets a
    # dispatch + SCALAR FETCH, and two scan lengths cancel the constant
    # dispatch/fetch overhead.
    n_small = max(2, iters // 10)
    n_big = iters
    jit_run = jax.jit(chained, static_argnames=("n",))
    c_small = jit_run.lower(variables, batch, n=n_small).compile()
    c_big = jit_run.lower(variables, batch, n=n_big).compile()

    def fetch_timed(compiled):
        t0 = time.perf_counter()
        scores = compiled(variables, batch)
        float(jnp.sum(scores))          # forces execution + host fetch
        return time.perf_counter() - t0

    fetch_timed(c_small)                # absorb one-time transfer setup
    t_small = min(fetch_timed(c_small) for _ in range(2))
    t_big = min(fetch_timed(c_big) for _ in range(2))
    print(f"[bench] n_small={n_small}: {t_small:.3f}s  "
          f"n_big={n_big}: {t_big:.3f}s", file=sys.stderr)

    dt = max(t_big - t_small, 1e-9)
    pairs_per_sec = (n_big - n_small) * batch_size / dt
    baseline_img_per_sec = 1.0 / 0.031  # TITAN Xp CenterNet ddd (MODEL_ZOO)
    print(json.dumps({
        "metric": "kitti_stereo_infer_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "stereo_pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline_img_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
