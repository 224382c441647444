#!/usr/bin/env python
"""Anchor-overlap recall study over a COCO-format annotation file
(reference: /root/reference/src/tools/calc_coco_overlap.py — an offline
analysis tool unrelated to the main path): for several anchor grids, report
what fraction of ground-truth boxes has an anchor with IoU above threshold.

    python tools/calc_anchor_overlap.py data/kitti/annotations_3d/kitti_3dop_train.json
"""

import json
import sys

import numpy as np

ANCHOR_SCALES = [16, 32, 64, 128, 256]
ANCHOR_RATIOS = [0.5, 1.0, 2.0]
STRIDE = 16
IMG_W, IMG_H = 1248, 384


def anchors():
    out = []
    for s in ANCHOR_SCALES:
        for r in ANCHOR_RATIOS:
            w = s * np.sqrt(r)
            h = s / np.sqrt(r)
            out.append((w, h))
    return out


def recall_at(boxes, thresh=0.5):
    """Best-anchor IoU per gt box over a dense stride grid."""
    cx = np.arange(STRIDE / 2, IMG_W, STRIDE)
    cy = np.arange(STRIDE / 2, IMG_H, STRIDE)
    best = np.zeros(len(boxes))
    for (aw, ah) in anchors():
        ax1 = cx[None, :] - aw / 2
        ay1 = cy[:, None] - ah / 2
        for i, b in enumerate(boxes):
            x1 = np.maximum(ax1, b[0])
            y1 = np.maximum(ay1, b[1])
            x2 = np.minimum(ax1 + aw, b[0] + b[2])
            y2 = np.minimum(ay1 + ah, b[1] + b[3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            iou = inter / (aw * ah + b[2] * b[3] - inter)
            best[i] = max(best[i], iou.max())
    return (best > thresh).mean(), best.mean()


def main(path):
    with open(path) as f:
        d = json.load(f)
    cats = {c["id"]: c["name"] for c in d["categories"]}
    by_cat = {}
    for ann in d["annotations"]:
        name = cats[ann["category_id"]]
        if name == "DontCare":
            continue
        by_cat.setdefault(name, []).append(ann["bbox"])
    for name, boxes in sorted(by_cat.items()):
        boxes = np.asarray(boxes, np.float64)
        for t in (0.5, 0.7):
            rec, mean_iou = recall_at(boxes, t)
            print(f"{name:16s} n={len(boxes):5d} recall@{t}: {rec:.3f} "
                  f"(mean best IoU {mean_iou:.3f})")


if __name__ == "__main__":
    main(sys.argv[1])
