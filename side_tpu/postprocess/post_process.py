"""End-to-end 3D post-processing for one stereo frame.

Orchestrates the reference's inference tail
(/root/reference/src/lib/utils/post_process.py:19-207): affine-unwarp of
both views' boxes and the keypoint/border cells, disparity (or cost-volume)
depth initialisation, the batched geometric box solve, dense photometric
alignment on the 2x-upsampled originals, and the final re-solve — producing
per-class KITTI rows [alpha, x1, y1, x2, y2, h, w, l, x, y, z, ry, score].

Unlike the reference (per-detection scipy on CPU + per-class Python loops),
every detection of a frame is solved/aligned in ONE fixed-shape jitted batch
and only the final class bucketing happens on host.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import geometry as G
from ..data.kitti import Calib, calib_from_list
from . import box_solver as BS
from . import dense_align as DA


def get_alpha(orien: np.ndarray) -> np.ndarray:
    """(sin, cos) -> viewpoint angle (post_process.py:14-17)."""
    return np.arctan2(orien[..., 0], orien[..., 1])


def unwarp_boxes(dets: np.ndarray, c, s, output_size) -> np.ndarray:
    """Center/size detections -> corner boxes in original pixels
    (post_process.py:19-38).  dets: (K, >=4) [cx, cy, w, h, ...]."""
    boxes = np.zeros((dets.shape[0], 4), np.float32)
    boxes[:, :2] = dets[:, :2] - 0.5 * dets[:, 2:4]
    boxes[:, 2:] = dets[:, :2] + 0.5 * dets[:, 2:4]
    boxes[:, :2] = G.transform_preds(boxes[:, :2], c, s, output_size)
    boxes[:, 2:] = G.transform_preds(boxes[:, 2:], c, s, output_size)
    return boxes


def cells_to_pixels(info: np.ndarray, boxes_left: np.ndarray,
                    grid: int) -> np.ndarray:
    """Keypoint/border grid cells -> pixel u coords anchored on the unwarped
    left box (post_process.py:40-71).  Returns (K, 4) =
    [border_l_u, border_r_u, kpt_u, kpt_type]."""
    width = boxes_left[:, 2] - boxes_left[:, 0]
    start = boxes_left[:, 0]
    cells = info[:, 5:8]  # border_left, border_right, kept_offset
    px = start[:, None] + cells * width[:, None] / grid
    return np.concatenate(
        [px[:, 0:1], px[:, 1:2], px[:, 2:3], info[:, 8:9]], axis=1)


def process_frame(dets: np.ndarray, dets_right: np.ndarray,
                  info_3d: np.ndarray, meta: Dict, cfg: Config,
                  img_left: np.ndarray = None, img_right: np.ndarray = None,
                  run_align: bool = True) -> Dict[int, np.ndarray]:
    """Full post-processing of one frame's decoded outputs.

    dets/dets_right: (K, 6); info_3d: (K, 9) or (K, 10) with cost-volume
    depth appended.  Returns {class_id (1-based): (n, 13) KITTI rows}."""
    c, s = meta["c"], meta["s"]
    calib = calib_from_list(meta["calib"])
    out_size = (cfg.output_w, cfg.output_h)

    f = calib.f
    bl = calib.baseline
    x_shift = (calib.p2[0, 3] - calib.p0[0, 3]) / f
    y_shift = (calib.p2[1, 3] - calib.p0[1, 3]) / f
    z_shift = (calib.p2[2, 3] - calib.p0[2, 3]) / f

    K = dets.shape[0]
    scores = dets[:, 4]
    classes = dets[:, 5].astype(np.int32)
    keep = scores > cfg.peak_thresh

    box_left = unwarp_boxes(dets, c, s, out_size)
    box_right = unwarp_boxes(dets_right, c, s, out_size)
    kpts = cells_to_pixels(info_3d, box_left, cfg.grid)
    dim = info_3d[:, :3]                       # (h, w, l)
    alpha = get_alpha(info_3d[:, 3:5])

    center_x = (box_left[:, 0] + box_left[:, 2]) / 2
    center_y = (box_left[:, 1] + box_left[:, 3]) / 2
    center_x_r = (box_right[:, 0] + box_right[:, 2]) / 2

    if cfg.cost_volume and info_3d.shape[1] > 9:
        depth = info_3d[:, 9].copy()
    else:
        disp = center_x - center_x_r
        depth = f * bl / np.where(np.abs(disp) < 1e-3, 1e-3, disp)
    depth = np.clip(depth, 0.5, 300.0)

    # closed-form back-projection fallback (post_process.py:129-135)
    z = depth - calib.p2[2, 3]
    x = (center_x * depth - calib.p2[0, 3] - calib.p2[0, 2] * z) / calib.p2[0, 0]
    y = (center_y * depth - calib.p2[1, 3] - calib.p2[1, 2] * z) / \
        calib.p2[1, 1] + dim[:, 0] / 2
    theta = G.alpha_to_rot_y(alpha, center_x, calib.p2[0, 2], calib.p2[0, 0])

    # batched first solve with the network depth (post_process.py:156-162)
    dim_whl = dim[:, [1, 0, 2]]
    consts = BS.build_consts(np.asarray(s, np.float32),
                             jnp.asarray(calib.p2, jnp.float32),
                             bl, jnp.asarray(alpha, jnp.float32),
                             jnp.asarray(dim_whl, jnp.float32),
                             jnp.asarray(box_left, jnp.float32),
                             jnp.asarray(box_right, jnp.float32),
                             jnp.asarray(kpts, jnp.float32), use_right=False,
                             grid=cfg.grid)
    states = np.asarray(BS.solve_x_y_theta(consts,
                                           jnp.asarray(depth, jnp.float32)))
    solved_ok = np.isfinite(states).all(axis=1)
    x = np.where(solved_ok, states[:, 0] - x_shift, x)
    y = np.where(solved_ok, states[:, 1] - y_shift, y)
    z_out = np.where(solved_ok, depth - z_shift, z)
    theta = np.where(solved_ok, states[:, 2] - math.pi / 2, theta)

    # dense alignment + re-solve (post_process.py:179-206)
    if run_align and img_left is not None and keep.any():
        mean = np.asarray(cfg.mean, np.float32).reshape(1, 1, 3)
        std = np.asarray(cfg.std, np.float32).reshape(1, 1, 3)
        norm_l = (img_left.astype(np.float32) / 255.0 - mean) / std
        norm_r = (img_right.astype(np.float32) / 255.0 - mean) / std
        im_l2 = DA.upsample2x(norm_l)
        im_r2 = DA.upsample2x(norm_r)
        scale = 2.0
        poses = np.stack([x + x_shift, y + y_shift, z_out + z_shift,
                          dim[:, 1], dim[:, 0], dim[:, 2],
                          theta + math.pi / 2], axis=1)
        status, best_dis = DA.align_depths(
            jnp.asarray(im_l2), jnp.asarray(im_r2),
            jnp.float32(f * scale), jnp.float32(bl),
            jnp.float32(calib.p2[0, 2] * scale),
            jnp.float32(calib.p2[1, 2] * scale),
            jnp.asarray(box_left * scale, jnp.float32),
            jnp.asarray(kpts[:, :2] * scale, jnp.float32),
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(keep))
        status = np.asarray(status)
        best_dis = np.asarray(best_dis)
        z_aligned = f * bl / np.maximum(best_dis, 1e-3)
        states2 = np.asarray(BS.solve_x_y_theta(
            consts, jnp.asarray(z_aligned, jnp.float32)))
        ok2 = (status > 0) & np.isfinite(states2).all(axis=1)
        x = np.where(ok2, states2[:, 0] - x_shift, x)
        y = np.where(ok2, states2[:, 1] - y_shift, y)
        z_out = np.where(ok2, z_aligned - z_shift, z_out)
        theta = np.where(ok2, states2[:, 2] - math.pi / 2, theta)

    rows = np.concatenate([
        alpha[:, None], box_left, dim, x[:, None], y[:, None],
        z_out[:, None], theta[:, None], scores[:, None]], axis=1
    ).astype(np.float32)

    preds: Dict[int, np.ndarray] = {}
    for cls in range(cfg.num_classes):
        sel = keep & (classes == cls)
        preds[cls + 1] = rows[sel]
    return preds


def save_kitti_results(results: Dict[int, Dict[int, np.ndarray]],
                       save_dir: str, class_names: List[str]) -> str:
    """Write per-image KITTI txt files (stereoDataset.py:315-331)."""
    import os
    results_dir = os.path.join(save_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    for img_id, per_cls in results.items():
        path = os.path.join(results_dir, f"{img_id:06d}.txt")
        with open(path, "w") as fh:
            for cls_ind, rows in per_cls.items():
                name = class_names[cls_ind]
                for r in np.asarray(rows):
                    vals = " ".join(f"{v:.2f}" for v in r)
                    fh.write(f"{name} 0.0 0 {vals}\n")
    return results_dir
