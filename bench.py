#!/usr/bin/env python
"""Inference throughput benchmark on the real TPU chip.

Measures steady-state stereo pairs/sec through the FULL device path:
stereo DLA-34 backbone (both views), all heads, object-conditioned cost
volume + instance-depth head, and the CenterNet decode — i.e. everything the
reference times as `net`+`dec` (stereoDetector.py:84-103).

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

    batch_size = int(os.environ.get("BENCH_BATCH", "4"))
    fn, (variables, batch) = entry()
    # rebatch for throughput
    batch = {k: jnp.concatenate([v] * batch_size, axis=0)
             for k, v in batch.items()}
    jit_fn = jax.jit(fn, donate_argnums=())

    out = jax.block_until_ready(jit_fn(variables, batch))  # compile
    # warmup
    for _ in range(3):
        out = jit_fn(variables, batch)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jit_fn(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = iters * batch_size / dt
    baseline_img_per_sec = 1.0 / 0.031  # TITAN Xp CenterNet ddd (MODEL_ZOO)
    print(json.dumps({
        "metric": "kitti_stereo_infer_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "stereo_pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline_img_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
