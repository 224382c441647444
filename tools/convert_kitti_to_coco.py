#!/usr/bin/env python
"""Offline KITTI -> COCO-format JSON converter
(reference: /root/reference/src/tools/convert_kitti_to_coco.py).

    python tools/convert_kitti_to_coco.py --data_dir data/kitti \
        --splits 3dop,subcnn
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from side_tpu.data.kitti import convert_split


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="data/kitti")
    p.add_argument("--splits", default="3dop,subcnn")
    a = p.parse_args()
    for split_name in a.splits.split(","):
        for split in ("train", "val"):
            out = os.path.join(a.data_dir, "annotations_3d",
                               f"kitti_{split_name}_{split}.json")
            d = convert_split(a.data_dir, split_name, split, out)
            print(f"{out}: {len(d['images'])} images, "
                  f"{len(d['annotations'])} annotations")


if __name__ == "__main__":
    main()
