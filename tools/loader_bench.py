#!/usr/bin/env python
"""Host input-pipeline throughput bench (no device work).

Measures steady-state training-batch pairs/s out of `data.Loader` — decode
(cv2.imread), augmentation, affine warps, and full target generation
including the occlusion sweep — at the production batch size.  The
reference feeds GPUs with torch process workers (testTrain.py:70-77); this
build uses a thread pool, so the number that matters is whether the host
can outrun the device train rate (bench.py train pairs/s).

    python tools/loader_bench.py [--batch_size 16] [--workers 8]
                                 [--data_dir DIR] [--scenes 64] [--aug]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--data_dir", default="")
    ap.add_argument("--scenes", type=int, default=64,
                    help="fixture scenes when no --data_dir")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--no_aug", action="store_true",
                    help="eval-style loading (no random aug)")
    args = ap.parse_args()

    from side_tpu.config import Config
    from side_tpu.data.dataset import StereoKitti
    from side_tpu.data.loader import Loader
    from side_tpu.data.synthetic import build_fixture

    root = args.data_dir
    if not root:
        tmp = tempfile.mkdtemp(prefix="loaderbench_")
        print(f"[loader-bench] building {args.scenes}-scene fixture at {tmp}",
              flush=True)
        root = build_fixture(tmp, n_train=args.scenes, n_val=2, seed=0)

    cfg = Config(data_dir=root, batch_size=args.batch_size,
                 flip=0.0 if args.no_aug else 0.5,
                 aug_ddd=0.0 if args.no_aug else 0.35)
    ds = StereoKitti(cfg, "train")
    loader = Loader(ds, batch_size=args.batch_size, shuffle=True,
                    num_workers=args.workers, drop_last=True)

    # warm-up epoch: page caches, cv2 thread pools, numpy allocators
    n_pairs = 0
    for batch in loader:
        n_pairs += batch["input"].shape[0]
    t0 = time.perf_counter()
    n_pairs = 0
    n_batches = 0
    for _ in range(args.epochs):
        for batch in loader:
            n_pairs += batch["input"].shape[0]
            n_batches += 1
    dt = time.perf_counter() - t0
    print(f"[loader-bench] batch={args.batch_size} workers={args.workers} "
          f"aug={not args.no_aug}: {n_pairs / dt:.1f} pairs/s "
          f"({dt / n_batches * 1e3:.1f} ms/batch, {n_batches} batches)",
          flush=True)


if __name__ == "__main__":
    main()
