"""Golden parity tests: run the REFERENCE implementation on torch CPU and
assert numerical agreement with side_tpu (VERDICT r2 next #3).

The reference's pure-Python modules import cleanly with the CPU torch in
this image once `.cuda()`/`torch.cuda.*Tensor` are patched to no-ops and
the `progress` bar dependency is stubbed.  Every "matches the reference
semantics" docstring claim in ops/losses.py, ops/decode.py and
data/geometry.py is checked here against the actual reference code rather
than a re-derivation.

Covered references:
  models/losses.py:42-208   (focal / L1 / cross)
  modules/stereoTrainer.py:77-95 (computeKeptLabel quantisation)
  models/decode.py:35-126   (ddd_decode, bbox_decode)
  utils/image.py:19-196     (affine transform, gaussian radius/draw)
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.golden

REF_LIB = "/root/reference/src/lib"


@pytest.fixture(scope="module")
def ref():
    """Reference modules on torch CPU with cuda calls neutralised."""
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    import torch

    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.Tensor.cuda = lambda self, *a, **k: self

    # `progress.bar.Bar` is imported by stereoTrainer but unused here
    if "progress" not in sys.modules:
        progress = types.ModuleType("progress")
        bar = types.ModuleType("progress.bar")
        bar.Bar = type("Bar", (), {})
        progress.bar = bar
        sys.modules["progress"] = progress
        sys.modules["progress.bar"] = bar

    from models import losses as ref_losses
    from models import decode as ref_decode
    from modules import stereoTrainer as ref_trainer
    from utils import image as ref_image

    ns = types.SimpleNamespace(torch=torch, losses=ref_losses,
                               decode=ref_decode, trainer=ref_trainer,
                               image=ref_image)
    return ns


def _nchw(t, x):
    return t.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


# --------------------------------------------------------------- losses
def test_focal_loss_parity(ref):
    from side_tpu.ops.losses import focal_loss
    t = ref.torch
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 12, 16, 3
    gt = np.zeros((B, C, H, W), np.float32)
    for b in range(B):
        for _ in range(4):
            c, y, x = rng.randint(C), rng.randint(H), rng.randint(W)
            gt[b, c, y, x] = 1.0
            # gaussian skirt
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W and (dy or dx):
                        gt[b, c, yy, xx] = max(gt[b, c, yy, xx],
                                               float(rng.rand()) * 0.9)
    pred = np.clip(rng.rand(B, C, H, W).astype(np.float32), 1e-4, 1 - 1e-4)

    want = float(ref.losses.FocalLoss()(t.tensor(pred), t.tensor(gt)))
    got = float(focal_loss(pred.transpose(0, 2, 3, 1),
                           gt.transpose(0, 2, 3, 1)))
    assert got == pytest.approx(want, rel=1e-5)

    # zero-positive branch (losses.py:61-62)
    gt0 = np.clip(gt, 0.0, 0.5)
    want0 = float(ref.losses.FocalLoss()(t.tensor(pred), t.tensor(gt0)))
    got0 = float(focal_loss(pred.transpose(0, 2, 3, 1),
                            gt0.transpose(0, 2, 3, 1)))
    assert got0 == pytest.approx(want0, rel=1e-5)


def test_l1_loss_parity(ref):
    from side_tpu.ops.losses import masked_l1_loss
    t = ref.torch
    rng = np.random.RandomState(1)
    B, H, W, C, K = 2, 8, 10, 3, 5
    out = rng.randn(B, H, W, C).astype(np.float32)
    ind = rng.randint(0, H * W, (B, K)).astype(np.int64)
    mask = (rng.rand(B, K) > 0.4).astype(np.uint8)
    target = rng.randn(B, K, C).astype(np.float32)

    want = float(ref.losses.L1Loss()(_nchw(t, out), t.tensor(mask),
                                     t.tensor(ind), t.tensor(target)))
    got = float(masked_l1_loss(out, mask, ind, target))
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_loss_parity(ref):
    from side_tpu.ops.losses import cross_loss
    t = ref.torch
    rng = np.random.RandomState(2)
    B, H, W, C, K = 2, 8, 10, 28, 5
    out = rng.randn(B, H, W, C).astype(np.float32)
    ind = rng.randint(0, H * W, (B, K)).astype(np.int64)
    mask = (rng.rand(B, K) > 0.4).astype(np.uint8)
    target = rng.randint(0, C, (B, K)).astype(np.int64)

    # the reference ignores `mask` entirely (losses.py:187-198)
    want = float(ref.losses.CrossLoss()(
        _nchw(t, out), t.tensor(mask), t.tensor(ind),
        t.tensor(target[..., None])))
    got = float(cross_loss(out, ind, target))
    assert got == pytest.approx(want, rel=1e-5)


def test_compute_kept_label_parity(ref):
    from side_tpu.ops.losses import compute_kept_label
    t = ref.torch
    rng = np.random.RandomState(3)
    B, K, grid = 2, 8, 28
    wh = np.abs(rng.randn(B, K, 3).astype(np.float32)) * 20 + 1
    kept = (rng.rand(B, K, 6).astype(np.float32) * 1.4 - 0.2) * \
        wh[:, :, 0:1]                              # some out of [0, w)
    kept[0, 0] = -5.0                              # all-invisible slot
    kept[0, 1] = wh[0, 1, 0] * 2                   # all-too-far slot

    opt = types.SimpleNamespace(mse_loss=False, grid=grid,
                                lossWeight=[1.0] * 7)
    loss_mod = ref.trainer.StereoLoss(opt)
    want = loss_mod.computeKeptLabel(t.tensor(kept), t.tensor(wh)).numpy()
    got = np.asarray(compute_kept_label(kept, wh, grid))
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------- decode
def _rand_heads(rng, B=2, H=12, W=16, C=3, grid=28):
    return {
        "hm": rng.randn(B, H, W, C).astype(np.float32),
        "kept": rng.randn(B, H, W, 6 * grid).astype(np.float32),
        "dim": rng.randn(B, H, W, 3).astype(np.float32),
        "orien": rng.randn(B, H, W, 2).astype(np.float32),
        "wh": rng.randn(B, H, W, 3).astype(np.float32),
        "reg": rng.randn(B, H, W, 3).astype(np.float32),
    }


def test_ddd_decode_parity(ref):
    from side_tpu.ops.decode import ddd_decode
    import jax
    t = ref.torch
    rng = np.random.RandomState(4)
    h = _rand_heads(rng)
    grid, K = 28, 8
    hm = 1.0 / (1.0 + np.exp(-h["hm"]))  # sigmoid outside, as the trainer does

    want = ref.decode.ddd_decode(
        _nchw(t, hm), _nchw(t, h["kept"]), _nchw(t, h["dim"]),
        _nchw(t, h["orien"]), _nchw(t, h["wh"]), _nchw(t, h["reg"]),
        grid_size=grid, K=K)
    got = ddd_decode(hm, h["kept"], h["dim"], h["orien"], h["wh"], h["reg"],
                     grid_size=grid, K=K)
    for w, g, name in zip(want[:2], got[:2], ("det", "det_r")):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=1e-5,
                                   err_msg=name)
    # DOCUMENTED DEVIATION: reference decode.py:64 computes
    # kept_type = argmax/grid_size with TRUE division (py2->py3 artifact),
    # so its info_3d[..., 8] is e.g. 3.607 where the type is 3; every
    # consumer casts it back with int() (box_estimator.py:408).  We emit
    # the integer type directly — compare after flooring the reference.
    info_ref = want[2].numpy()
    info_ref[..., 8] = np.floor(info_ref[..., 8])
    np.testing.assert_allclose(np.asarray(got[2]), info_ref, atol=1e-5,
                               err_msg="info")


def test_bbox_decode_parity(ref):
    from side_tpu.ops.decode import bbox_decode
    t = ref.torch
    rng = np.random.RandomState(5)
    h = _rand_heads(rng)
    K = 8

    ref_l, ref_r, shape = ref.decode.bbox_decode(
        _nchw(t, h["hm"]), _nchw(t, h["wh"]), _nchw(t, h["reg"]), K=K)
    bbox, bbox_r, valid = bbox_decode(h["hm"], h["wh"], h["reg"], K=K)
    bbox, bbox_r, valid = map(np.asarray, (bbox, bbox_r, valid))
    assert tuple(shape) == (bbox.shape[0], K, 5)

    # the reference compacts with `keep`; ours masks.  Rebuild its rows.
    ours_rows = []
    for b in range(bbox.shape[0]):
        for k in range(K):
            if valid[b, k]:
                ours_rows.append(np.concatenate([[b], bbox[b, k]]))
    ours_rows_r = []
    for b in range(bbox.shape[0]):
        for k in range(K):
            if valid[b, k]:
                ours_rows_r.append(np.concatenate([[b], bbox_r[b, k]]))
    np.testing.assert_allclose(np.asarray(ours_rows), ref_l.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_rows_r), ref_r.numpy(),
                               atol=1e-5)


# ------------------------------------------------------------- image.py
def test_affine_transform_parity(ref):
    from side_tpu.data.geometry import get_affine_transform, affine_transform
    rng = np.random.RandomState(6)
    for _ in range(5):
        c = rng.rand(2).astype(np.float32) * 400
        s = float(rng.rand() * 500 + 50)
        rot = 0.0
        out = (rng.randint(100, 500), rng.randint(100, 500))
        shift = rng.rand(2).astype(np.float32) * 0.1
        want = ref.image.get_affine_transform(c, s, rot, out, shift=shift)
        got = get_affine_transform(c, s, rot, out, shift=shift)
        np.testing.assert_allclose(got, want, atol=1e-4)

        pt = rng.rand(2).astype(np.float32) * 400
        np.testing.assert_allclose(affine_transform(pt, got),
                                   ref.image.affine_transform(pt, want),
                                   atol=1e-3)


def test_gaussian_parity(ref):
    from side_tpu.data.geometry import (gaussian_radius, draw_umich_gaussian,
                                        draw_msra_gaussian)
    rng = np.random.RandomState(7)
    for _ in range(5):
        det = (float(rng.rand() * 40 + 2), float(rng.rand() * 40 + 2))
        assert gaussian_radius(det) == pytest.approx(
            ref.image.gaussian_radius(det), rel=1e-6)

    hm_w = np.zeros((24, 32), np.float32)
    hm_r = np.zeros((24, 32), np.float32)
    for _ in range(6):
        ct = (rng.randint(0, 32), rng.randint(0, 24))
        radius = int(rng.randint(1, 6))
        draw_umich_gaussian(hm_w, ct, radius)
        ref.image.draw_umich_gaussian(hm_r, ct, radius)
    np.testing.assert_allclose(hm_w, hm_r, atol=1e-6)

    hm_w2 = np.zeros((24, 32), np.float32)
    hm_r2 = np.zeros((24, 32), np.float32)
    for _ in range(6):
        ct = np.array([rng.randint(0, 32), rng.randint(0, 24)], np.float32)
        sigma = float(rng.randint(1, 5))
        draw_msra_gaussian(hm_w2, ct, sigma)
        ref.image.draw_msra_gaussian(hm_r2, ct, sigma)
    np.testing.assert_allclose(hm_w2, hm_r2, atol=1e-6)


# ------------------------------------------------ box_estimator (scipy)
def _ref_box_estimator(ref):
    import scipy
    if not hasattr(scipy, "array"):      # removed in modern scipy
        scipy.array = np.array
    from utils import box_estimator as ref_be
    return ref_be


def test_solve_x_y_theta_parity(ref):
    """Our batched damped Gauss-Newton vs the REFERENCE Newton-CG solver
    (box_estimator.py:388-548) on the same observations."""
    import jax.numpy as jnp
    from side_tpu.postprocess import box_solver as BS
    from test_box_solver import _make_detection
    from side_tpu.data.synthetic import IMG_H, IMG_W

    ref_be = _ref_box_estimator(ref)
    cases = [(1.5, 1.62, 14.0, 0.4), (-3.0, 1.58, 25.0, 2.0),
             (0.5, 1.65, 9.0, -1.2), (2.0, 1.6, 18.0, 0.8)]
    whl = (1.63, 1.53, 3.88)

    for (x, y, z, ry) in cases:
        w, h, l = whl
        p2, box_l, box_r, alpha, kpts = _make_detection(x, y, z, w, h, l, ry)
        p3 = p2.copy()
        p3[0, 3] = p2[0, 3] - p2[0, 0] * 0.54
        calib = types.SimpleNamespace(p2=p2, p3=p3)
        disparity = p2[0, 0] * 0.54 / z

        want_states, want_z = ref_be.solve_x_y_theta_from_kpt(
            np.array([IMG_W, IMG_H], np.float32), calib, float(alpha),
            [w, h, l], box_l.tolist(), float(disparity), kpts.tolist())

        consts = BS.build_consts(
            np.array([IMG_W, IMG_H], np.float32),
            jnp.asarray(p2, jnp.float32), 0.54,
            jnp.asarray([alpha], jnp.float32),
            jnp.asarray([[w, h, l]], jnp.float32),
            jnp.asarray(box_l[None], jnp.float32),
            jnp.asarray(box_r[None], jnp.float32),
            jnp.asarray(kpts[None], jnp.float32), use_right=False)
        got = np.asarray(BS.solve_x_y_theta(
            consts, jnp.asarray([want_z], jnp.float32)))[0]
        np.testing.assert_allclose(got, np.asarray(want_states), atol=0.08,
                                   err_msg=f"case {(x, y, z, ry)}")


def test_solve_x_y_z_theta_parity(ref):
    """4-DoF solve vs box_estimator.py:160-386 (left+right edges, no
    aligned disparity).

    DOCUMENTED REFERENCE DEFECT (verified here): the reference's analytic
    Jacobian `j_kpt` disagrees with its own objective `f_kpt` (entries off
    by ~2x; probe it with scipy numeric gradients), so its Newton-CG stalls
    at the initial point and returns init (x0(z), y0(z), z, theta0)
    unchanged.  The call is dead code in the reference's active path anyway
    (commented out at post_process.py:147).  Our Gauss-Newton minimises the
    same residual system and actually converges — so this test asserts (a)
    the reference's stall, and (b) that our solution has LOWER residual
    cost than the reference's returned point under the REFERENCE's own
    objective."""
    import jax.numpy as jnp
    from side_tpu.postprocess import box_solver as BS
    from test_box_solver import _make_detection
    from side_tpu.data.synthetic import IMG_H, IMG_W

    ref_be = _ref_box_estimator(ref)
    x, y, z, ry = 1.0, 1.6, 20.0, 0.3
    w, h, l = 1.6, 1.5, 3.9
    p2, box_l, box_r, alpha, kpts = _make_detection(x, y, z, w, h, l, ry)
    p3 = p2.copy()
    p3[0, 3] = p2[0, 3] - p2[0, 0] * 0.54
    calib = types.SimpleNamespace(p2=p2, p3=p3)

    # capture the reference's own objective to compare solution quality
    import scipy.optimize as so
    cap = {}
    orig_minimize = so.minimize

    def spy(fun, x0, method=None, jac=None, options=None):
        cap["fun"], cap["x0"] = fun, np.array(x0, np.float64)
        return orig_minimize(fun, x0, method=method, jac=jac,
                             options=options)

    ref_be.minimize = spy
    try:
        status_ref, want = ref_be.solve_x_y_z_theta_from_kpt(
            np.array([IMG_W, IMG_H], np.float32), calib, float(alpha),
            [w, h, l], box_l.tolist(), box_r.tolist(), z + 2.0,
            kpts.tolist())
    finally:
        ref_be.minimize = orig_minimize

    # (a) the reference stalls: its "solution" is the init point
    np.testing.assert_allclose(np.asarray(want), cap["x0"], atol=1e-5)
    assert np.asarray(want)[2] == pytest.approx(z + 2.0)

    consts = BS.build_consts(
        np.array([IMG_W, IMG_H], np.float32), jnp.asarray(p2, jnp.float32),
        0.54, jnp.asarray([alpha], jnp.float32),
        jnp.asarray([[w, h, l]], jnp.float32),
        jnp.asarray(box_l[None], jnp.float32),
        jnp.asarray(box_r[None], jnp.float32),
        jnp.asarray(kpts[None], jnp.float32), use_right=True)
    got, status = BS.solve_x_y_z_theta(consts,
                                       jnp.asarray([z + 2.0], jnp.float32))
    got = np.asarray(got)[0]
    assert int(status[0]) == int(status_ref) == 1
    # (b) ours converges to the true depth and beats the reference's
    # returned point under the reference's own cost
    assert got[2] == pytest.approx(z, abs=0.5)
    assert cap["fun"](got.astype(np.float64)) < cap["fun"](np.asarray(want))


# ----------------------------------------------------------- dense_align
def test_dense_align_parity(ref):
    """Our batched enumeration vs the reference align_parallel
    (dense_align.py:240-312) on a textured synthetic stereo pair.

    The pixel SAMPLING differs by design (reference: strided integer
    lattice + ray-hit compaction, :40-55; ours: fixed N_V x N_U fractional
    grid with weights) so disparities agree to the fine enumeration step,
    not bitwise."""
    import jax.numpy as jnp
    from side_tpu.postprocess import dense_align as DA
    t = ref.torch
    from dense_align import dense_align as ref_da

    rng = np.random.RandomState(0)
    H, W = 96, 192
    f, bl = 150.0, 0.5
    cx, cy = W / 2, H / 2
    z_true = 12.0

    xgrid = np.arange(W, dtype=np.float32)
    tex = 128 + 100 * np.sin(xgrid * 0.7) + 25 * np.sin(xgrid * 0.23 + 1.0)
    im_l = np.tile(tex[None, :, None], (H, 1, 3)).astype(np.float32)
    im_l += rng.randn(H, W, 3).astype(np.float32)
    disp = f * bl / z_true
    xs = xgrid + disp
    x0 = np.floor(xs).astype(int)
    frac = (xs - x0).astype(np.float32)
    x0c, x1c = np.clip(x0, 0, W - 1), np.clip(x0 + 1, 0, W - 1)
    im_r = (im_l[:, x0c] * (1 - frac)[None, :, None] +
            im_l[:, x1c] * frac[None, :, None])

    w_m, h_m = 3.0, 2.0
    u_half = f * (w_m / 2) / z_true
    v_half = f * (h_m / 2) / z_true
    box = np.array([[cx - u_half, cy - v_half, cx + u_half, cy + v_half]],
                   np.float32)
    borders = box[:, [0, 2]]
    z_start = 14.0
    poses = np.array([[0.0, h_m / 2, z_start, w_m, h_m, 0.05, 0.0]],
                     np.float32)

    p2 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]], np.float32)
    p3 = p2.copy()
    p3[0, 3] = -f * bl
    calib = types.SimpleNamespace(p2=p2, p3=p3)
    opt = types.SimpleNamespace(mean=[0.0, 0.0, 0.0], std=[1.0, 1.0, 1.0])

    status_ref, dis_ref = ref_da.align_parallel(
        calib, opt, im_l, im_r, t.tensor(box), t.tensor(borders),
        t.tensor(poses))

    norm_l = im_l / 255.0
    norm_r = im_r / 255.0
    im_l2 = DA.upsample2x(norm_l)
    im_r2 = DA.upsample2x(norm_r)
    status, dis = DA.align_depths(
        jnp.asarray(im_l2), jnp.asarray(im_r2), jnp.float32(f * 2),
        jnp.float32(bl), jnp.float32(cx * 2), jnp.float32(cy * 2),
        jnp.asarray(box * 2), jnp.asarray(borders * 2),
        jnp.asarray(poses), jnp.asarray([True]))

    assert int(status[0]) == int(status_ref[0]) == 1
    z_ref = f * bl / (float(dis_ref[0]) - 0.5)
    z_ours = f * bl / (float(dis[0]) - 0.5)
    assert abs(z_ref - z_true) < 0.2     # the oracle itself converged
    assert abs(z_ours - z_ref) < 0.11    # two fine steps (0.05 m each)


# ------------------------------------------ stereoDataset target parity
def _fake_pycocotools():
    """Minimal COCO-JSON reader standing in for pycocotools (absent in this
    image) — only the four methods stereoDataset uses (:53-54,74,147-148)."""
    import json
    import collections

    class COCO:
        def __init__(self, path):
            with open(path) as f:
                self.dataset = json.load(f)
            self.imgs = {im["id"]: im for im in self.dataset["images"]}
            self._by_img = collections.defaultdict(list)
            for i, a in enumerate(self.dataset["annotations"]):
                a.setdefault("id", i + 1)
                self._by_img[a["image_id"]].append(a)
            self.anns = {a["id"]: a for a in self.dataset["annotations"]}

        def getImgIds(self):
            return sorted(self.imgs)

        def loadImgs(self, ids):
            return [self.imgs[i] for i in ids]

        def getAnnIds(self, imgIds):
            return [a["id"] for i in imgIds for a in self._by_img[i]]

        def loadAnns(self, ids):
            return [self.anns[i] for i in ids]

    pkg = types.ModuleType("pycocotools")
    mod = types.ModuleType("pycocotools.coco")
    mod.COCO = COCO
    pkg.coco = mod
    sys.modules.setdefault("pycocotools", pkg)
    sys.modules.setdefault("pycocotools.coco", mod)


def test_dataset_target_parity(ref, fixture_root):
    """Run the REFERENCE StereoDataset.__getitem__ target path
    (stereoDataset.py:72-300) on our synthetic fixture with augmentation
    off, and compare every target tensor to ours."""
    _fake_pycocotools()
    from modules import stereoDataset as ref_sd
    from side_tpu.config import Config
    from side_tpu.data.dataset import StereoKitti

    cfg = Config(data_dir=fixture_root, input_h=128, input_w=384,
                 aug_ddd=0.0, no_color_aug=True, flip_train=False,
                 keep_res=False)
    ours = StereoKitti(cfg, "train")

    opt = types.SimpleNamespace(
        data_dir=fixture_root, kitti_split="3dop", flip_train=False,
        keep_res=False, input_w=cfg.input_w, input_h=cfg.input_h,
        output_w=cfg.output_w, output_h=cfg.output_h, aug_ddd=0.0,
        scale=cfg.scale, shift=cfg.shift, num_classes=cfg.num_classes,
        mse_loss=False, reg_bbox=True, reg_offset=True, debug=0)
    theirs = ref_sd.StereoDataset(opt, "train")

    assert len(theirs) == len(ours)
    id_to_idx = {img_id: i for i, img_id in enumerate(ours.images)}
    for ref_idx in range(len(theirs)):
        img_id = theirs.images[ref_idx]
        want = theirs[ref_idx]
        got = ours[id_to_idx[img_id]]

        # ours ships warped uint8 (device-normalised); apply the same
        # normalisation here — bit-equivalent for un-augmented samples
        got_inp = ((got["input"].astype(np.float32) / 255.0 - ours.mean)
                   / ours.std) if got["input"].dtype == np.uint8 \
            else got["input"]
        np.testing.assert_allclose(got_inp.transpose(2, 0, 1),
                                   want["input"], atol=1e-5)
        np.testing.assert_allclose(got["hm"], want["hm"], atol=1e-6)
        for key in ("wh", "reg", "dim", "orien", "depth", "kept",
                    "ind_float", "rot_mask", "trans", "trans_inv",
                    "p2", "p3"):
            np.testing.assert_allclose(
                np.asarray(got[key], np.float64),
                np.asarray(want[key], np.float64), atol=1e-4,
                err_msg=f"target '{key}' for image {img_id}")
        np.testing.assert_array_equal(got["ind"], want["ind"])
        assert float(got["fb"]) == pytest.approx(float(want["fb"]))
