#!/usr/bin/env python
"""Clean-loop benchmark of the fused inference tail on real TPU.

Preloads N distinct frames (host pre-processing done up front), then times
dispatch+finish over them twice (second pass = warm steady state, no
compile, no loader jitter).  A/Bs the align_topk cap:

    python tools/tail_bench.py --data_dir /tmp/valfix [--align_topk 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/valfix")
    ap.add_argument("--align_topk", type=int, default=None)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--no_align", action="store_true")
    args = ap.parse_args()

    from side_tpu.config import Config
    from side_tpu.data.dataset import StereoKitti
    from side_tpu.runtime.detector import Detector

    cfg = Config(data_dir=args.data_dir)
    if args.align_topk is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, align_topk=args.align_topk)
    ds = StereoKitti(cfg, "val")
    det = Detector(cfg)

    import os
    pres = []
    for i in range(min(args.frames, len(ds.images))):
        info = ds.coco.images[ds.images[i]]
        lp = os.path.join(ds.img_dir, info["file_name"])
        rp = os.path.join(ds.img_right_dir, info["file_name"])
        pres.append(det.load_and_pre([lp, rp], info["calib"]))

    run_align = not args.no_align

    def pass_once():
        t0 = time.perf_counter()
        pending = None
        for pre in pres:
            d = det.dispatch(dict(pre), run_align=run_align)
            if pending is not None:
                det.finish(pending)
            pending = d
        det.finish(pending)
        return (time.perf_counter() - t0) / len(pres)

    warm = pass_once()           # compile + warm transfers
    best = min(pass_once() for _ in range(3))
    print(f"align_topk={cfg.align_topk} run_align={run_align}: "
          f"first {warm*1e3:.0f} ms/frame, steady {best*1e3:.0f} ms/frame")


if __name__ == "__main__":
    main()
