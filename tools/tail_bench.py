#!/usr/bin/env python
"""Fused-tail timing on TPU: single-frame vs batched, align on/off.

The tail (device_tail.py: unwarp + solve + dense align + re-solve) became
one device program in round 3 and batched in round 4; this tool pins where
its time goes so batching decisions are measured, not guessed.

    python tools/tail_bench.py [--batch 8] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

IMG_H, IMG_W = 375, 1242


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.config import Config
    from side_tpu.data import geometry as G
    from side_tpu.postprocess import device_tail as DT

    cfg = Config()
    rng = np.random.RandomState(0)
    K = cfg.K

    def make_frame():
        dets = np.zeros((K, 6), np.float32)
        dets_r = np.zeros((K, 6), np.float32)
        info = np.zeros((K, 10), np.float32)
        n = 20
        cx = rng.uniform(40, 280, n)
        cy = rng.uniform(40, 80, n)
        w = rng.uniform(8, 30, n)
        h = rng.uniform(6, 16, n)
        dets[:n] = np.stack([cx, cy, w, h, rng.uniform(0.3, 0.9, n),
                             np.zeros(n)], 1)
        dets_r[:n] = dets[:n].copy()
        dets_r[:n, 0] -= rng.uniform(1, 6, n)
        info[:n, :3] = [1.5, 1.6, 3.9]
        info[:n, 3] = np.sin(0.3)
        info[:n, 4] = np.cos(0.3)
        info[:n, 6] = cfg.grid
        info[:n, 7] = rng.randint(2, 26, n)
        info[:n, 8] = rng.randint(0, 4, n)
        info[:n, 9] = rng.uniform(8, 40, n)
        img_l = rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
        img_r = rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
        f = 721.5
        p2 = np.array([[f, 0, 609.6, 44.9], [0, f, 172.9, 0.2],
                       [0, 0, 1, 0.003]], np.float32)
        p3 = p2.copy(); p3[0, 3] = -339.5
        p0 = p2.copy(); p0[0, 3] = 0.0
        c = np.array([IMG_W / 2.0, IMG_H / 2.0], np.float32)
        s = np.array([IMG_W, IMG_H], np.int32)
        meta = {"c": c, "s": s,
                "calib": [p0.tolist(), p3.tolist(), p2.tolist(),
                          p3.tolist()]}
        return dets, dets_r, info, img_l, img_r, meta

    frames = [make_frame() for _ in range(args.batch)]

    def timeit(fn, label):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        float(np.asarray(out[0]).sum())
        compile_s = time.time() - t0

        def t(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            float(np.asarray(out[0]).sum())
            return time.perf_counter() - t0

        n_s, n_b = max(2, args.iters // 5), args.iters
        t(2)
        ts = min(t(n_s) for _ in range(2))
        tb = min(t(n_b) for _ in range(2))
        per = (tb - ts) / (n_b - n_s)
        print(f"[tail {label}] {per*1e3:.1f} ms/call "
              f"({per*1e3/args.batch:.1f} ms/frame batched; "
              f"compile {compile_s:.0f}s)", flush=True)
        return per

    d, dr, i, il, ir, m = frames[0]
    for align in (False, True):
        timeit(lambda a=align: DT.run_tail(
            jnp.asarray(d), jnp.asarray(dr), jnp.asarray(i), il, ir, m,
            cfg, run_align=a), f"B=1 align={int(align)}")

    dets_b = jnp.asarray(np.stack([f[0] for f in frames]))
    dets_r_b = jnp.asarray(np.stack([f[1] for f in frames]))
    info_b = jnp.asarray(np.stack([f[2] for f in frames]))
    ils = [f[3] for f in frames]
    irs = [f[4] for f in frames]
    ms = [f[5] for f in frames]
    for align in (False, True):
        timeit(lambda a=align: DT.run_tail_batch(
            dets_b, dets_r_b, info_b, ils, irs, ms, cfg, run_align=a),
            f"B={args.batch} align={int(align)}")


if __name__ == "__main__":
    main()
