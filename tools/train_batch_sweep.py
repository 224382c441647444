#!/usr/bin/env python
"""Train-throughput batch sweep (VERDICT r3 #2 diagnostics).

One process (the relay's first host fetch costs minutes, so sweeps must
amortize it): measures steady-state fwd+bwd+Adam stereo pairs/s at each
requested batch size using bench.py's _bench_train, which builds the real
Trainer at full input resolution.

    python tools/train_batch_sweep.py --batches 2,4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4")
    args = ap.parse_args()

    import bench

    for b in (int(v) for v in args.batches.split(",")):
        pairs = bench._bench_train(b)
        print(f"[train-sweep] batch {b}: {pairs:.2f} pairs/s "
              f"({b / pairs * 1e3:.0f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
