#!/usr/bin/env python
"""Single stereo-pair demo (reference: /root/reference/src/demo.py).

    python tools/demo.py --demo left.png,right.png --calib calib.txt \
        --load_model exp/stereo/default/model_last.npz --debug 1

With --demo pointing at a KITTI training index directory layout
(image_2/image_3), every pair in the folder is processed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import cv2
import numpy as np

from side_tpu.config import Config, CLASS_NAMES
from side_tpu.data.kitti import read_calib_file
from side_tpu.runtime.detector import Detector
from side_tpu.utils.debugger import Debugger


def main():
    argv = sys.argv[1:]
    calib_path = None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--calib":
            calib_path = argv[i + 1]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    cfg = Config.cli(rest)
    assert cfg.demo, "--demo left.png,right.png (or a kitti dir) required"
    assert calib_path, "--calib calib.txt required"
    calib = read_calib_file(calib_path)

    detector = Detector(cfg)

    video_ext = ("mp4", "mov", "avi", "mkv")

    def is_video(p):
        return p.rsplit(".", 1)[-1].lower() in video_ext

    if "," in cfg.demo and all(is_video(p) for p in cfg.demo.split(",")):
        # stereo video mode (reference demo.py:24-36; its webcam branch is
        # stale for the stereo task — one camera cannot feed a stereo pair,
        # so here video means a synchronized left,right file pair)
        lp, rp = cfg.demo.split(",")
        cam_l, cam_r = cv2.VideoCapture(lp), cv2.VideoCapture(rp)
        idx = 0
        while True:
            ok_l, img_l = cam_l.read()
            ok_r, img_r = cam_r.read()
            if not (ok_l and ok_r):
                break
            ret = detector.run([img_l, img_r], image_id=idx, calib=calib)
            msg = f"frame {idx}: "
            for stage in ["tot", "load", "pre", "net", "dec", "post",
                          "merge"]:
                msg += f"{stage} {ret[stage]:.3f}s |"
            print(msg, flush=True)
            idx += 1
        return

    if "," in cfg.demo:
        pairs = [tuple(cfg.demo.split(","))]
    else:
        left_dir = os.path.join(cfg.demo, "image_2")
        right_dir = os.path.join(cfg.demo, "image_3")
        pairs = [(os.path.join(left_dir, f), os.path.join(right_dir, f))
                 for f in sorted(os.listdir(left_dir))]

    for idx, (lp, rp) in enumerate(pairs):
        ret = detector.run([lp, rp], image_id=idx, calib=calib)
        msg = f"{os.path.basename(lp)}: "
        for stage in ["tot", "load", "pre", "net", "dec", "post", "merge"]:
            msg += f"{stage} {ret[stage]:.3f}s |"
        print(msg)
        n = sum(len(v) for v in ret["results"].values())
        print(f"  {n} detections above peak_thresh={cfg.peak_thresh}")

        if cfg.debug >= 1:
            dbg = Debugger(class_names=CLASS_NAMES[1:])
            image = cv2.imread(lp)
            dbg.add_3d_detection(image, ret["results"],
                                 np.asarray(calib[2]),
                                 center_thresh=cfg.vis_thresh)
            dbg.add_bird_view(ret["results"],
                              center_thresh=cfg.vis_thresh)
            os.makedirs(cfg.debug_dir, exist_ok=True)
            dbg.save_all_imgs(cfg.debug_dir, prefix=f"{idx}_")
            print(f"  overlays saved to {cfg.debug_dir}")


if __name__ == "__main__":
    main()
