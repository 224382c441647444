#!/usr/bin/env python
"""Full-split evaluation (reference: /root/reference/src/testVal.py; pass
--num_images 50 for the testVal50.py smoke mode).

    python tools/val.py stereo --data_dir data --load_model exp/.../model_last.npz
"""

import argparse
import os
import queue
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import cv2
import numpy as np

from side_tpu.config import Config, CLASS_NAMES
from side_tpu.data.dataset import StereoKitti
from side_tpu.postprocess.post_process import save_kitti_results
from side_tpu.runtime.detector import Detector
from side_tpu.runtime.logger import AverageMeter


def run_eval(save_dir: str, gt_dir: str):
    """Shell out to the C++ offline evaluator (stereoDataset.py:333-337)."""
    binary = os.path.join(os.path.dirname(__file__), "kitti_eval",
                          "evaluate_object_3d_offline")
    if not os.path.exists(binary):
        print(f"[val] evaluator binary missing at {binary}; "
              "build with: make -C tools/kitti_eval")
        return None
    cmd = [binary, gt_dir, os.path.join(save_dir, "results")]
    print("[val] running:", " ".join(cmd))
    return subprocess.run(cmd, capture_output=False)


def run_pass(cfg, ds, detector, *, n, eval_batch, serial, no_align):
    """One full inference pass over `n` val images; returns (results,
    meters, steady_ms) where steady_ms is wall ms/image over the SECOND
    half of the reports — the first half absorbs compile + the relay's
    multi-minute first-fetch cold start, so end-of-run `wall/n` wildly
    overstates the steady-state cost."""
    meters = {k: AverageMeter() for k in
              ["tot", "load", "pre", "net", "dec", "post", "merge"]}
    results = {}
    report_t = []

    def report(ind, img_id, ret):
        results[img_id] = ret["results"]
        report_t.append(time.time())
        msg = f"[{ind + 1}/{n}] {img_id:06d} "
        for k in meters:
            meters[k].update(ret[k])
            msg += f"|{k} {ret[k]:.3f}s ({meters[k].avg:.3f}s) "
        print(msg, flush=True)

    if serial:
        for ind in range(n):
            img_id = ds.images[ind]
            info = ds.coco.images[img_id]
            lp = os.path.join(ds.img_dir, info["file_name"])
            rp = os.path.join(ds.img_right_dir, info["file_name"])
            ret = detector.run([lp, rp], image_id=img_id,
                               calib=info["calib"],
                               run_align=not no_align)
            report(ind, img_id, ret)
    else:
        # Pipelined eval (reference: PrefetchDataset workers overlapping
        # pre_process with GPU compute, testVal.py:25-53,76-78): a worker
        # thread runs load+pre ahead of the device; the main thread
        # dispatches frame i's device program asynchronously, then finishes
        # frame i-1 (fetch + post-process tail) while the chip computes.
        # With --eval_batch B > 1 the device programs take B frames at once
        # (one forward+decode, one fused tail) — the batch axis is free TPU
        # parallelism the reference's frame-at-a-time loop leaves unused.
        q = queue.Queue(maxsize=4 * eval_batch)

        def producer():
            for ind in range(n):
                img_id = ds.images[ind]
                info = ds.coco.images[img_id]
                lp = os.path.join(ds.img_dir, info["file_name"])
                rp = os.path.join(ds.img_right_dir, info["file_name"])
                pre = detector.load_and_pre([lp, rp], info["calib"])
                q.put((ind, img_id, pre))
            q.put(None)

        threading.Thread(target=producer, daemon=True).start()
        pending = None

        def next_group():
            """Pull up to eval_batch frames; pad the last group by
            repeating its final frame so every dispatch compiles ONE
            batched shape (padded results are dropped)."""
            group = []
            while len(group) < eval_batch:
                item = q.get()
                if item is None:
                    return group, True
                group.append(item)
            return group, False

        done = False
        while not done:
            group, done = next_group()
            if not group:
                break
            n_real = len(group)
            while len(group) < eval_batch:
                group.append(group[-1])
            if eval_batch == 1:
                handle = detector.dispatch(group[0][2],
                                           run_align=not no_align)
            else:
                handle = detector.dispatch_batch(
                    [g[2] for g in group], run_align=not no_align)
            dispatched = (group, n_real, handle)
            if pending is not None:
                pgroup, pn, ph = pending
                rets = ([detector.finish(ph)] if eval_batch == 1
                        else detector.finish_batch(ph))
                for (pind, pid, _), ret in list(zip(pgroup, rets))[:pn]:
                    report(pind, pid, ret)
            pending = dispatched
        if pending is not None:
            pgroup, pn, ph = pending
            rets = ([detector.finish(ph)] if eval_batch == 1
                    else detector.finish_batch(ph))
            for (pind, pid, _), ret in list(zip(pgroup, rets))[:pn]:
                report(pind, pid, ret)

    steady_ms = None
    if len(report_t) >= 4:
        half = len(report_t) // 2
        steady_ms = (report_t[-1] - report_t[half - 1]) / \
            (len(report_t) - half) * 1e3
    return results, meters, steady_ms


def main():
    # pull our extra flags, forward the rest to Config.cli
    argv = sys.argv[1:]
    num_images = -1
    no_align = False
    profile = False
    serial = False
    eval_batches = [1]
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--num_images":
            num_images = int(argv[i + 1]); i += 2
        elif argv[i] == "--eval_batch":
            eval_batches = [int(argv[i + 1])]; i += 2
        elif argv[i] == "--eval_batches":
            # comparison mode: run the full pass once per batch size in ONE
            # process (the TPU relay's first host fetch costs minutes, so
            # per-mode processes would drown the measurement)
            eval_batches = [int(v) for v in argv[i + 1].split(",")]; i += 2
        elif argv[i] == "--no_align":
            no_align = True; i += 1
        elif argv[i] == "--profile":
            profile = True; i += 1
        elif argv[i] == "--serial":
            serial = True; i += 1
        elif argv[i] == "--no_eval":
            rest.append(argv[i]); i += 1
        else:
            rest.append(argv[i]); i += 1
    do_eval = "--no_eval" not in rest
    rest = [a for a in rest if a != "--no_eval"]
    cfg = Config.cli(rest)

    ds = StereoKitti(cfg, "val")
    detector = Detector(cfg)

    n = len(ds.images) if num_images < 0 else min(num_images, len(ds.images))
    if profile:
        # jax.profiler trace of the inference loop (SURVEY.md §5: the
        # reference has wall-clock stage meters only; this adds device traces)
        prof_dir = os.path.join(cfg.save_dir, "profile")
        os.makedirs(prof_dir, exist_ok=True)
        jax.profiler.start_trace(prof_dir)

    results = None
    for eval_batch in eval_batches:
        t_wall0 = time.time()
        results, meters, steady_ms = run_pass(
            cfg, ds, detector, n=n, eval_batch=eval_batch, serial=serial,
            no_align=no_align)
        wall = time.time() - t_wall0
        if n > 1:
            # in pipelined mode the 'net' meter only sees the residual wait
            # inside finish() after overlap with host work — label it as
            # such (quote serial-mode runs for pure device time)
            net_label = ("pure net avg" if serial else
                         "net wait (overlapped) avg")
            steady = (f"; steady {steady_ms:.0f} ms/image "
                      f"({1e3 / steady_ms:.1f} pairs/s)"
                      if steady_ms else "")
            print(f"[val] batch {eval_batch}: wall {wall:.1f}s for {n} "
                  f"images = {wall/n*1e3:.0f} ms/image "
                  f"({'serial' if serial else 'pipelined'}); "
                  f"{net_label} {meters['net'].avg*1e3:.0f} ms{steady}",
                  flush=True)

    if profile:
        jax.profiler.stop_trace()
        print(f"[val] profile trace in {cfg.save_dir}/profile")

    os.makedirs(cfg.save_dir, exist_ok=True)
    save_kitti_results(results, cfg.save_dir, CLASS_NAMES)
    print(f"[val] wrote results to {cfg.save_dir}/results")
    if do_eval and num_images < 0:
        gt_dir = os.path.join(cfg.data_dir, "kitti", "training", "label_2")
        run_eval(cfg.save_dir, gt_dir)


if __name__ == "__main__":
    main()
