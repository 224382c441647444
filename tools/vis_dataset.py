#!/usr/bin/env python
"""Dataset target-generation visual harness
(reference: /root/reference/src/testDataset.py): iterates the dataset,
reconstructs GT boxes/keypoints from the generated target tensors, maps them
back to original pixels through the inverse output affine, draws them on the
image and writes PNGs — a visual regression check of the target generator
including the stereo-flip path.

    python tools/vis_dataset.py stereo --data_dir data --exp_id vis
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from side_tpu.config import Config
from side_tpu.data import geometry as G
from side_tpu.data.dataset import StereoKitti


def main():
    cfg = Config.cli()
    ds = StereoKitti(cfg, "val")
    out_dir = cfg.debug_dir
    os.makedirs(out_dir, exist_ok=True)
    n = min(len(ds), int(os.environ.get("VIS_N", "8")))
    for i in range(n):
        s = ds[i]
        meta = s["meta"]
        img = cv2.imread(meta["image_right"] if meta["flipped"]
                         else meta["image_path"])
        if meta["flipped"]:
            img = img[:, ::-1].copy()
        c, sc = meta["c"], meta["s"]
        k = int(s["rot_mask"].sum())
        for j in range(k):
            idx = s["ind"][j]
            ys, xs = idx // cfg.output_w, idx % cfg.output_w
            cx = xs + s["reg"][j, 0]
            cy = ys + s["reg"][j, 2]
            w, h = s["wh"][j, 0], s["wh"][j, 2]
            box = np.array([[cx - w / 2, cy - h / 2],
                            [cx + w / 2, cy + h / 2]])
            box = G.transform_preds(box, c, sc, (cfg.output_w, cfg.output_h))
            cv2.rectangle(img, tuple(box[0].astype(int)),
                          tuple(box[1].astype(int)), (0, 255, 0), 2)
            # keypoints are box-relative u at output res
            x1_out = cx - w / 2
            for t in range(4):
                u_out = s["kept"][j, t] + x1_out
                pt = G.transform_preds(np.array([[u_out, cy]]), c, sc,
                                       (cfg.output_w, cfg.output_h))[0]
                cv2.drawMarker(img, tuple(pt.astype(int)), (0, 0, 255),
                               cv2.MARKER_TILTED_CROSS, 10, 2)
            for t in (4, 5):  # visible borders
                u_out = s["kept"][j, t] + x1_out
                pt = G.transform_preds(np.array([[u_out, cy]]), c, sc,
                                       (cfg.output_w, cfg.output_h))[0]
                cv2.line(img, (int(pt[0]), int(box[0, 1])),
                         (int(pt[0]), int(box[1, 1])), (255, 200, 0), 1)
        path = os.path.join(out_dir, f"ds_{i:03d}.png")
        cv2.imwrite(path, img)
        print(f"wrote {path} ({k} objects, flipped={meta['flipped']})")


if __name__ == "__main__":
    main()
