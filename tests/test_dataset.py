import numpy as np
import pytest

from side_tpu.config import Config
from side_tpu.data.dataset import StereoKitti, collate
from side_tpu.data.loader import Loader
from side_tpu.data import geometry as G


@pytest.fixture()
def cfg(fixture_root):
    return Config(data_dir=fixture_root, num_workers=2)


def test_sample_shapes(cfg):
    ds = StereoKitti(cfg, "val")
    s = ds[0]
    assert s["input"].shape == (384, 1280, 3)        # NHWC (TPU layout)
    assert s["input_right"].shape == (384, 1280, 3)
    assert s["hm"].shape == (3, 96, 320)
    assert s["wh"].shape == (50, 3)
    assert s["reg"].shape == (50, 3)
    assert s["dim"].shape == (50, 3)
    assert s["orien"].shape == (50, 2)
    assert s["depth"].shape == (50, 1)
    assert s["kept"].shape == (50, 6)
    assert s["ind"].shape == (50,)
    assert s["rot_mask"].shape == (50,)
    assert s["p2"].shape == (3, 4)
    assert s["trans"].shape == (2, 3)
    assert np.isfinite(s["input"]).all()
    assert s["rot_mask"].sum() >= 1


def test_targets_consistent_with_heatmap(cfg):
    ds = StereoKitti(cfg, "val")
    s = ds[0]
    n = int(s["rot_mask"].sum())
    for k in range(n):
        idx = s["ind"][k]
        y, x = idx // 320, idx % 320
        # heatmap has a peak of 1.0 at the integer center cell
        assert s["hm"][:, y, x].max() == pytest.approx(1.0)
        # sub-pixel offsets within [0, 1) for left x and y
        assert 0.0 <= s["reg"][k, 0] < 1.0
        assert 0.0 <= s["reg"][k, 2] < 1.0
        # right center sits left of the left center: reg[1] < reg[0] given
        # same int anchor (positive disparity)
        assert s["reg"][k, 1] < s["reg"][k, 0]
        assert s["depth"][k, 0] > 0
        assert s["wh"][k, 0] > 0 and s["wh"][k, 2] > 0


def test_target_roundtrip_to_original_pixels(cfg):
    """testDataset.py-style check: reconstruct GT boxes from targets and map
    back to original pixels; they must match the raw projected boxes."""
    from side_tpu.data.kitti import read_objects
    from side_tpu.config import CLASS_NAMES

    ds = StereoKitti(cfg, "val")
    s = ds[0]
    meta = s["meta"]
    objects = read_objects(ds.coco.anns_by_img[meta["img_id"]],
                           meta["calib"], CLASS_NAMES[1:], (375, 1242, 3))
    n = int(s["rot_mask"].sum())
    assert n == len(objects[:50])
    for k in range(min(n, len(objects))):
        idx = s["ind"][k]
        ys, xs = idx // 320, idx % 320
        cx = xs + s["reg"][k, 0]
        cy = ys + s["reg"][k, 2]
        w, h = s["wh"][k, 0], s["wh"][k, 2]
        box_out = np.array([[cx - w / 2, cy - h / 2], [cx + w / 2, cy + h / 2]])
        box_orig = G.transform_preds(box_out, meta["c"], meta["s"], (320, 96))
        raw = objects[k].boxes[0].box
        # compare against the clipped projected box
        exp = np.array([[max(raw[0], 0), max(raw[1], 0)],
                        [min(raw[2], 1241), min(raw[3], 374)]])
        np.testing.assert_allclose(box_orig, exp, atol=1.5)


def test_flip_train_doubles_and_mirrors(fixture_root):
    cfg = Config(data_dir=fixture_root, flip_train=True, aug_ddd=0.0,
                 no_color_aug=True)
    ds = StereoKitti(cfg, "train")
    assert len(ds) == 8
    s0 = ds[0]
    s4 = ds[4]  # flipped twin of sample 0
    # flipped left input is the mirrored right image (up to 1px warp shift);
    # inputs are uint8 (device-normalised) — compare in normalised units
    def norm(x):
        return (x.astype(np.float32) / 255.0 - np.float32(0.5)) / 0.28
    diff = np.abs(norm(s4["input"][:, 2:-2]) -
                  norm(s0["input_right"][:, ::-1][:, 2:-2]))
    assert np.median(diff) < 0.08
    assert s0["rot_mask"].sum() == s4["rot_mask"].sum()
    n = int(s0["rot_mask"].sum())
    # flipped alpha relation: sin(alpha_f) = sin(alpha), cos flips sign
    o0 = s0["orien"][:n]
    # match objects by depth, flipped order may differ
    d0 = s0["depth"][:n, 0]
    d4 = s4["depth"][:n, 0]
    order0, order4 = np.argsort(d0), np.argsort(d4)
    np.testing.assert_allclose(np.sort(d0), np.sort(d4), atol=1e-4)
    o4 = s4["orien"][:n]
    np.testing.assert_allclose(o0[order0, 0], o4[order4, 0], atol=1e-4)
    np.testing.assert_allclose(o0[order0, 1], -o4[order4, 1], atol=1e-4)


def test_loader_batches(cfg):
    ds = StereoKitti(cfg, "train")
    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2,
                    drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["input"].shape == (2, 384, 1280, 3)
    assert b["hm"].shape == (2, 3, 96, 320)
    assert "meta" not in b


def test_collate_keeps_meta(cfg):
    ds = StereoKitti(cfg, "val")
    batch = collate([ds[0], ds[1]])
    assert isinstance(batch["meta"], list) and len(batch["meta"]) == 2
