"""Synthetic mini-KITTI fixture for hermetic tests.

The reference ships no fixtures (SURVEY.md §4); this generator renders a few
stereo pairs of textured 3D boxes with a real pinhole stereo rig so the full
pipeline — label projection, target generation, training, decoding, the 3D
solver, and the C++ evaluator — can be exercised without the real dataset.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from .kitti import box3d_corners, project

F = 721.5377
CX, CY = 609.5593, 172.854
BASELINE = 0.54
IMG_H, IMG_W = 375, 1242


def default_calib() -> Tuple[np.ndarray, np.ndarray]:
    p2 = np.array([[F, 0, CX, F * 0.06],
                   [0, F, CY, 0.0],
                   [0, 0, 1, 0.0]], np.float64)
    p3 = p2.copy()
    p3[0, 3] = p2[0, 3] - F * BASELINE
    return p2, p3


def calib_lines(p2, p3) -> str:
    def row(name, p):
        return name + ": " + " ".join(f"{v:.12e}" for v in p.reshape(-1))
    p0 = p2.copy(); p0[0, 3] = 0.0
    p1 = p3.copy()
    r0 = np.eye(3)
    tr = np.eye(3, 4)
    return "\n".join([
        row("P0", p0), row("P1", p1), row("P2", p2), row("P3", p3),
        row("R0_rect", r0), row("Tr_velo_to_cam", tr), row("Tr_imu_to_velo", tr),
    ]) + "\n"


def _render(objs: List[dict], P: np.ndarray, rng: np.random.RandomState
            ) -> np.ndarray:
    """Rasterise textured cuboids (far to near) over a gradient background."""
    img = np.zeros((IMG_H, IMG_W, 3), np.uint8)
    ramp = np.linspace(60, 160, IMG_H, dtype=np.float32)[:, None]
    img[:] = np.stack([ramp, ramp * 0.9, ramp * 0.8], axis=-1
                      ).astype(np.uint8).reshape(IMG_H, 1, 3)
    # deterministic speckle texture so photometric alignment has gradients
    noise = (rng.rand(IMG_H, IMG_W, 1) * 40).astype(np.uint8)
    img = np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)

    for obj in sorted(objs, key=lambda o: -o["location"][2]):
        corners = box3d_corners(obj["dim"], obj["location"], obj["rotation_y"])
        pts = project(P, corners)
        x0 = int(np.clip(pts[:, 0].min(), 0, IMG_W - 1))
        x1 = int(np.clip(pts[:, 0].max(), 0, IMG_W - 1))
        y0 = int(np.clip(pts[:, 1].min(), 0, IMG_H - 1))
        y1 = int(np.clip(pts[:, 1].max(), 0, IMG_H - 1))
        if x1 <= x0 or y1 <= y0:
            continue
        color = np.array(obj["color"], np.int32)
        patch = img[y0:y1, x0:x1].astype(np.int32)
        yy = np.linspace(0, 1, y1 - y0)[:, None, None]
        xx = np.linspace(0, 1, x1 - x0)[None, :, None]
        tex = color * (0.6 + 0.4 * np.sin(8 * np.pi * xx) * np.cos(6 * np.pi * yy))
        img[y0:y1, x0:x1] = np.clip(0.2 * patch + 0.8 * tex, 0, 255).astype(np.uint8)
    return img


def make_scene(rng: np.random.RandomState, n_cars: int) -> List[dict]:
    objs = []
    for _ in range(n_cars):
        z = rng.uniform(8, 40)
        x = rng.uniform(-0.35, 0.35) * z * 0.5
        y = 1.65
        ry = rng.uniform(-np.pi, np.pi)
        dim = [1.5 + rng.rand() * 0.3, 1.6 + rng.rand() * 0.2,
               3.8 + rng.rand() * 0.6]  # h, w, l
        color = rng.randint(60, 255, size=3).tolist()
        objs.append({"type": "Car", "dim": dim, "location": [x, y, z],
                     "rotation_y": ry, "color": color})
    return objs


def label_lines(objs, p2) -> str:
    lines = []
    for o in objs:
        corners = box3d_corners(o["dim"], o["location"], o["rotation_y"])
        pts = project(p2, corners)
        bbox = [max(pts[:, 0].min(), 0), max(pts[:, 1].min(), 0),
                min(pts[:, 0].max(), IMG_W - 1), min(pts[:, 1].max(), IMG_H - 1)]
        x, y, z = o["location"]
        alpha = o["rotation_y"] - np.arctan2(x, z)
        if alpha > np.pi:
            alpha -= 2 * np.pi
        if alpha < -np.pi:
            alpha += 2 * np.pi
        lines.append(
            f"{o['type']} 0.00 0 {alpha:.2f} "
            f"{bbox[0]:.2f} {bbox[1]:.2f} {bbox[2]:.2f} {bbox[3]:.2f} "
            f"{o['dim'][0]:.2f} {o['dim'][1]:.2f} {o['dim'][2]:.2f} "
            f"{x:.2f} {y:.2f} {z:.2f} {o['rotation_y']:.2f}")
    return "\n".join(lines) + "\n"


def build_fixture(root: str, n_train: int = 4, n_val: int = 2,
                  seed: int = 0, split_name: str = "3dop") -> str:
    """Write a synthetic KITTI tree under `root`/kitti; returns the data dir."""
    try:
        import cv2
    except Exception:
        cv2 = None
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "kitti")
    for d in ["training/image_2", "training/image_3", "training/label_2",
              "training/calib", f"ImageSets_{split_name}", "annotations_3d"]:
        os.makedirs(os.path.join(base, d), exist_ok=True)

    p2, p3 = default_calib()
    n_total = n_train + n_val
    ids = []
    for i in range(n_total):
        objs = make_scene(rng, n_cars=rng.randint(1, 4))
        tex_rng = np.random.RandomState(1000 + i)
        img_l = _render(objs, p2, np.random.RandomState(1000 + i))
        img_r = _render(objs, p3, np.random.RandomState(1000 + i))
        name = f"{i:06d}"
        ids.append(name)
        if cv2 is not None:
            cv2.imwrite(os.path.join(base, "training/image_2", name + ".png"), img_l)
            cv2.imwrite(os.path.join(base, "training/image_3", name + ".png"), img_r)
        with open(os.path.join(base, "training/label_2", name + ".txt"), "w") as f:
            f.write(label_lines(objs, p2))
        with open(os.path.join(base, "training/calib", name + ".txt"), "w") as f:
            f.write(calib_lines(p2, p3))

    with open(os.path.join(base, f"ImageSets_{split_name}", "train.txt"), "w") as f:
        f.write("\n".join(ids[:n_train]) + "\n")
    with open(os.path.join(base, f"ImageSets_{split_name}", "val.txt"), "w") as f:
        f.write("\n".join(ids[n_train:]) + "\n")

    from .kitti import convert_split
    for split in ("train", "val"):
        convert_split(base, split_name, split,
                      os.path.join(base, "annotations_3d",
                                   f"kitti_{split_name}_{split}.json"))
    return root
