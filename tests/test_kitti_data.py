import json
import os

import numpy as np
import pytest

from side_tpu.data import kitti as K
from side_tpu.data import targets as T
from side_tpu.data.synthetic import default_calib, IMG_H, IMG_W


def _calib_list():
    p2, p3 = default_calib()
    p0 = p2.copy(); p0[0, 3] = 0.0
    return [p0.tolist(), p3.tolist(), p2.tolist(), p3.tolist()]


def _ann(loc, dim, ry, cat="Car", trunc=0.0, occ=0):
    x, z = loc[0], loc[2]
    alpha = ry - np.arctan2(x, z)
    return {"category_id": K.CAT_IDS[cat], "dim": list(dim),
            "location": list(loc), "rotation_y": ry, "alpha": float(alpha),
            "truncated": trunc, "occluded": occ}


def test_box3d_corners_geometry():
    c = K.box3d_corners([1.5, 1.6, 3.9], [2.0, 1.65, 20.0], 0.3)
    assert c.shape == (8, 3)
    # bottom ring at y=pos.y, top ring at y=pos.y - h
    np.testing.assert_allclose(c[:4, 1], 1.65, atol=1e-9)
    np.testing.assert_allclose(c[4:, 1], 1.65 - 1.5, atol=1e-9)
    # centroid x/z equals object position
    np.testing.assert_allclose(c[:, 0].mean(), 2.0, atol=1e-9)
    np.testing.assert_allclose(c[:, 2].mean(), 20.0, atol=1e-9)


def test_read_objects_projects_stereo_disparity():
    anns = [_ann([0.0, 1.65, 15.0], [1.5, 1.6, 3.9], 0.0)]
    objs = K.read_objects(anns, _calib_list(), ["Car"], (IMG_H, IMG_W, 3))
    assert len(objs) == 1
    bl, br = objs[0].boxes
    # right-image box must sit left of the left-image box (positive disparity)
    assert br.box[0] < bl.box[0]
    assert br.box[2] < bl.box[2]
    # vertical extent identical for rectified stereo
    np.testing.assert_allclose(bl.box[[1, 3]], br.box[[1, 3]], atol=1e-6)
    # expected disparity ~ f*b/z at box center
    disp = (bl.box[0] + bl.box[2]) / 2 - (br.box[0] + br.box[2]) / 2
    p2, p3 = default_calib()
    f = p2[0, 0]
    expected = f * 0.54 / 15.0
    assert abs(disp - expected) < 1.5


def test_keypoints_silhouette_edges_removed():
    anns = [_ann([0.0, 1.65, 15.0], [1.5, 1.6, 3.9], 0.7)]
    objs = K.read_objects(anns, _calib_list(), ["Car"], (IMG_H, IMG_W, 3))
    kp = objs[0].boxes[0].keypoints
    # exactly the two silhouette-edge corners and self-occluded ones are -1;
    # at least one perspective keypoint survives for a generic yaw
    assert np.sum(kp == -1) >= 2
    assert np.sum(kp >= 0) >= 1
    # surviving keypoints lie strictly inside the 2D box u-range
    box = objs[0].boxes[0].box
    for u in kp[kp >= 0]:
        assert box[0] - 1e-6 <= u <= box[2] + 1e-6


def test_occlusion_sweep_borders():
    # near object fully inside the column span of a far object occludes it
    far = _ann([0.0, 1.65, 30.0], [1.5, 1.6, 3.9], 0.0)
    near = _ann([0.0, 1.65, 10.0], [1.5, 1.6, 3.9], 0.0)
    objs = K.read_objects([far, near], _calib_list(), ["Car"],
                          (IMG_H, IMG_W, 3))
    far_o = next(o for o in objs if o.pos[2] == 30.0)
    near_o = next(o for o in objs if o.pos[2] == 10.0)
    nb = near_o.boxes[0]
    fb = far_o.boxes[0]
    # near object keeps its full span
    assert nb.visible_right - nb.visible_left >= (nb.box[2] - nb.box[0]) - 2
    # far object's visible span shrinks (it is centred behind the near one)
    assert (fb.visible_right - fb.visible_left) < (fb.box[2] - fb.box[0])


def test_truncation_occlusion_filter():
    anns = [_ann([0.0, 1.65, 15.0], [1.5, 1.6, 3.9], 0.0, trunc=1.0),
            _ann([0.0, 1.65, 25.0], [1.5, 1.6, 3.9], 0.0, occ=3),
            _ann([3.0, 1.65, 20.0], [1.5, 1.6, 3.9], 0.0)]
    objs = K.read_objects(anns, _calib_list(), ["Car"], (IMG_H, IMG_W, 3))
    assert len(objs) == 1


def test_infer_boundary_shapes():
    boxes = np.array([[100, 100, 300, 200], [150, 90, 400, 260]], np.float32)
    lr = K.infer_boundary((375, 1242, 3), boxes)
    assert lr.shape == (2, 2)
    assert np.all(lr[:, 1] >= lr[:, 0])


def test_convert_split_roundtrip(fixture_root):
    base = os.path.join(fixture_root, "kitti")
    path = os.path.join(base, "annotations_3d", "kitti_3dop_train.json")
    with open(path) as f:
        d = json.load(f)
    assert len(d["images"]) == 4
    assert all("calib" in im and len(im["calib"]) >= 4 for im in d["images"])
    assert all(len(np.asarray(im["calib"][2]).reshape(-1)) == 12
               for im in d["images"])
    assert len(d["annotations"]) >= 4
    idx = K.CocoIndex(path)
    assert len(idx) == 4
    img_id = idx.img_ids[0]
    objs = K.read_objects(idx.anns_by_img[img_id],
                          idx.images[img_id]["calib"], ["Car", "Van", "Truck"],
                          (IMG_H, IMG_W, 3))
    assert len(objs) >= 1


def test_compute_kept_label_quantisation():
    grid = 28
    wh = np.array([[[55.0, 50.0, 20.0]]])
    # keypoints at 1/4 and 1/2 of width, two invisible, borders at 0 and w
    kept = np.array([[[14.0, 28.0, -60.0, -60.0, 0.0, 54.0]]])
    out = T.compute_kept_label(kept, wh, grid)
    assert out.shape == (1, 1, 3)
    # cell = round(u * 28 / 56); max over kpts = cell 14 at index 1
    assert out[0, 0, 0] == 1 * grid + 14
    assert out[0, 0, 1] == 0
    assert out[0, 0, 2] == 27
    # out-of-range border (cell > grid-1) clamps to class 0
    kept2 = np.array([[[14.0, 28.0, -60.0, -60.0, 0.0, 55.9]]])
    out2 = T.compute_kept_label(kept2, wh, grid)
    assert out2[0, 0, 2] == 0


def test_compute_kept_label_all_invisible():
    grid = 28
    wh = np.array([[[55.0, 50.0, 20.0]]])
    kept = np.array([[[-60.0, -60.0, -60.0, -60.0, -5.0, 70.0]]])
    out = T.compute_kept_label(kept, wh, grid)
    # everything clamps to class 0
    assert np.all(out == 0)


def _sweep_loop(boxes, depths, width=1260):
    """Straight transliteration of the reference per-column loops
    (stereo_utils.py:64-120) — the oracle for the vectorised sweep."""
    n = len(depths)
    depth_line = np.zeros(width, np.float64)
    for i in range(n):
        for col in range(int(boxes[i, 0]), int(boxes[i, 2]) + 1):
            px = depth_line[col]
            if px == 0.0:
                depth_line[col] = depths[i]
            elif depths[i] < px:
                depth_line[col] = (depths[i] + px) / 2.0
    out = np.zeros((n, 3), np.float64)   # vl, vr, fully_occluded
    for i in range(n):
        vl, vr = boxes[i, 0], boxes[i, 2]
        left_visible = depth_line[int(boxes[i, 0])] >= depths[i]
        right_visible = depth_line[int(boxes[i, 2])] >= depths[i]
        occluded = not left_visible and not right_visible
        if occluded:
            vr = boxes[i, 0]
        for col in range(int(boxes[i, 0]), int(boxes[i, 2]) + 1):
            if left_visible and depth_line[col] >= depths[i]:
                vr = col
            elif right_visible and depth_line[col] < depths[i]:
                vl = col
        out[i] = [vl, vr, occluded]
    return depth_line, out


def test_vectorised_sweep_matches_loop():
    """The vectorised depth-line paint + border scan must reproduce the
    reference's per-column loops exactly, over randomized overlapping
    layouts (including nested, chained, and duplicate-depth overlaps)."""
    rng = np.random.RandomState(0)
    for trial in range(200):
        n = rng.randint(1, 9)
        x1 = rng.uniform(0, 1100, n)
        w = rng.uniform(3, 400, n)
        boxes = np.stack([x1, np.zeros(n), np.minimum(x1 + w, 1259),
                          np.full(n, 80.0)], axis=1)
        depths = rng.uniform(4, 70, n)
        if trial % 3 == 0:          # force exact-duplicate depths
            depths[:] = depths[0]

        ref_line, ref_out = _sweep_loop(boxes, depths)
        line = np.zeros(1260, np.float64)
        for i in range(n):
            K._paint_depth_line(line, int(boxes[i, 0]),
                                int(boxes[i, 2]) + 1, depths[i])
        np.testing.assert_array_equal(line, ref_line)
        for i in range(n):
            vl, vr, lv, rv = K._visible_span(line, int(boxes[i, 0]),
                                             int(boxes[i, 2]), depths[i])
            evl = vl if vl is not None else boxes[i, 0]
            occ = not lv and not rv
            evr = vr if vr is not None else \
                (boxes[i, 0] if occ else boxes[i, 2])
            assert occ == bool(ref_out[i, 2])
            assert evl == ref_out[i, 0], (trial, i)
            assert evr == ref_out[i, 1], (trial, i)


def test_infer_boundary_matches_loop():
    """infer_boundary (vectorised) vs the reference loop semantics
    (stereo_utils.py:461-500) on random box layouts."""
    rng = np.random.RandomState(1)
    for _ in range(100):
        n = rng.randint(1, 8)
        x1 = rng.uniform(0, 1100, n)
        w = rng.uniform(5, 300, n)
        h = rng.uniform(20, 300, n)
        boxes = np.stack([x1, np.zeros(n), np.minimum(x1 + w, 1279), h],
                         axis=1).astype(np.float32)
        got = K.infer_boundary((384, 1280), boxes)
        _, ref = _sweep_loop(boxes, (1050.0 / boxes[:, 3]).astype(np.float64),
                             width=1280)
        np.testing.assert_allclose(got[:, 0], ref[:, 0])
        np.testing.assert_allclose(got[:, 1], ref[:, 1])
