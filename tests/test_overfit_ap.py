"""End-to-end acceptance: overfit the synthetic fixture, then close the full
accuracy loop — Detector -> process_frame -> save_kitti_results -> the C++
evaluator — and assert AP floors.

This is the reference's real acceptance path
(/root/reference/src/testVal.py:105 -> stereoDataset.run_eval:333-337 ->
tools/kitti_eval) in miniature: the only automated artifact that can catch a
sign/convention error anywhere in the assembled pipeline (e.g. in
post_process.py's x_shift/z_shift or theta +- pi/2 handling) that unit tests
on individual stages would miss.

The val split is rewritten to equal the train split, so a model that truly
learned the two scenes must detect their cars; thresholds are deliberately
loose (the point is catching broken conventions, not measuring quality).
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

import jax

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _build_eval_binary():
    binary = os.path.join(TOOLS, "kitti_eval", "evaluate_object_3d_offline")
    if not os.path.exists(binary):
        subprocess.run(["make", "-C", os.path.join(TOOLS, "kitti_eval")],
                       check=True, capture_output=True)
    return binary


def run_overfit_ap(tmp, epochs=160, lr=1e-3, input_hw=(128, 384),
                   run_align=True, verbose=False, n_scenes=2,
                   batch_size=2, inject=None, ckpt=None, _capture=None):
    """Train on the synthetic fixture and close the full accuracy loop.

    n_scenes=2 is the round-2 overfit protocol (per-object assertions
    carry the load; AP is quantised to ~1 pt/object).  n_scenes=16 is the
    round-4 DISCRIMINATIVE protocol: mixed easy/occluded/truncated recipes
    (data/synthetic.py build_fixture), enough GT objects for meaningful
    AP3D/APBEV floors at Easy/Moderate/Hard.

    inject: deliberately corrupt predictions before saving, to calibrate
    that the floors actually break under convention bugs —
      "ry_flip"   : +pi/2 on every predicted rotation_y
      "depth_sign": negate the depth-induced x/z (z -> -z clamps to junk)

    ckpt: path to a model_last.npz from a previous identical-protocol run;
    skips training (used by the inject calibration runs, which corrupt
    predictions AFTER inference and so share the trained model).
    """
    from side_tpu.config import Config
    from side_tpu.data.dataset import StereoKitti
    from side_tpu.data.kitti import convert_split
    from side_tpu.data.loader import Loader
    from side_tpu.data.synthetic import build_fixture
    from side_tpu.models import create_model
    from side_tpu.models.stereo_net import init_stereo_net
    from side_tpu.runtime.detector import Detector
    from side_tpu.runtime.trainer import Trainer

    data_dir = os.path.join(tmp, "data")
    save_dir = os.path.join(tmp, "exp")
    os.makedirs(save_dir, exist_ok=True)
    build_fixture(data_dir, n_train=n_scenes, n_val=2, seed=0)
    base = os.path.join(data_dir, "kitti")
    # overfit protocol: val == train
    with open(os.path.join(base, "ImageSets_3dop", "train.txt")) as f:
        train_ids = f.read()
    with open(os.path.join(base, "ImageSets_3dop", "val.txt"), "w") as f:
        f.write(train_ids)
    convert_split(base, "3dop", "val",
                  os.path.join(base, "annotations_3d", "kitti_3dop_val.json"))

    cfg = Config(data_dir=data_dir, exp_dir=save_dir,
                 input_h=input_hw[0], input_w=input_hw[1],
                 batch_size=batch_size, lr=lr, lr_step=(10 ** 9,),
                 num_epochs=epochs, max_objs=16, K=16,
                 aug_ddd=0.0, no_color_aug=True, flip_train=False,
                 compute_dtype="float32", num_devices=1, uncert=False,
                 peak_thresh=0.25)

    if ckpt:
        from side_tpu.runtime import checkpoint as CK
        loaded = CK.load_checkpoint(ckpt)
        eval_variables = {"params": loaded["params"],
                          "batch_stats": loaded["batch_stats"]}
    else:
        train_ds = StereoKitti(cfg, "train")
        loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                        num_workers=2, drop_last=True, seed=0)
        model = create_model(cfg)
        variables = jax.jit(
            lambda r: init_stereo_net(model, r, cfg.input_h, cfg.input_w,
                                      cfg.max_objs))(jax.random.PRNGKey(0))
        trainer = Trainer(cfg, model, variables, steps_per_epoch=len(loader))
        for epoch in range(1, epochs + 1):
            stats = trainer.train(epoch, loader)
            if verbose and (epoch % 10 == 0 or epoch == 1):
                print(f"[overfit] epoch {epoch}: " +
                      " ".join(f"{k}={v:.3f}" for k, v in stats.items()),
                      flush=True)
        assert np.isfinite(stats["loss"])
        trainer.save(os.path.join(save_dir, "model_last.npz"), epochs)
        eval_variables = trainer.eval_variables

    # -------- inference on the (identical) val split, full tail ----------
    val_ds = StereoKitti(cfg, "val")
    detector = Detector(cfg, variables=eval_variables)
    results = {}
    results_raw = {}   # run_align=False: depth is the raw cost-volume z
    for img_id in val_ds.images:
        info = val_ds.coco.images[img_id]
        lp = os.path.join(val_ds.img_dir, info["file_name"])
        rp = os.path.join(val_ds.img_right_dir, info["file_name"])
        ret = detector.run([lp, rp], image_id=img_id, calib=info["calib"],
                           run_align=run_align)
        results[img_id] = ret["results"]
        raw = (detector.run([lp, rp], image_id=img_id, calib=info["calib"],
                            run_align=False) if run_align else ret)
        results_raw[img_id] = raw["results"]
        if verbose and run_align:
            for cls in ret["results"]:
                for ra, rb in zip(np.asarray(ret["results"][cls]),
                                  np.asarray(raw["results"][cls])):
                    print(f"[overfit] img {img_id} cls {cls}: "
                          f"z_cv={rb[10]:.2f} z_aligned={ra[10]:.2f} "
                          f"ry={ra[11]:+.2f}", flush=True)
    if _capture is not None:
        _capture.update(results=results, results_raw=results_raw, base=base,
                        save_dir=save_dir)
    aps, errors = _save_and_eval(results, results_raw, base, save_dir,
                                 inject=inject, verbose=verbose)
    return aps, errors


def run_overfit_variants(tmp, variants=("clean", "ry_flip", "depth_sign",
                                        "class_shift"),
                         **kw):
    """One train + ONE inference pass, evaluated once per variant.

    The inject corruptions apply to saved predictions, not to the model,
    so the clean and calibration runs can share the (expensive through
    the TPU relay) training + detector programs.  Returns
    {variant: (aps, errors)}."""
    kw.pop("inject", None)
    verbose = kw.get("verbose", False)
    store = {}

    # run the train+detect path once, capturing results via a hook
    aps0, errors0 = run_overfit_ap(tmp, inject=None,
                                   _capture=store, **kw)
    out = {"clean": (aps0, errors0)}
    base = store["base"]
    for variant in variants:
        if variant == "clean":
            continue
        vdir = os.path.join(tmp, f"variant_{variant}")
        os.makedirs(vdir, exist_ok=True)
        out[variant] = _save_and_eval(
            _copy_results(store["results"]), _copy_results(store["results_raw"]),
            base, vdir, inject=variant, verbose=verbose)
    return out


def _copy_results(results):
    return {img: {cls: np.array(rows, np.float64, copy=True)
                  for cls, rows in per_cls.items()}
            for img, per_cls in results.items()}


def _save_and_eval(results, results_raw, base, save_dir, inject=None,
                   verbose=False):
    """Corrupt (optionally) + save KITTI txt + run the C++ evaluator +
    per-object error extraction.  Shared by the single-run and variants
    protocols."""
    from side_tpu.config import CLASS_NAMES
    from side_tpu.postprocess.post_process import save_kitti_results

    if inject == "class_shift":
        # rotate every class bucket by one (Car->Van->Truck->Car): the
        # calibration for class-offset bugs in the per-class decode
        # bucketing / merge.  The evaluator only counts detections OF the
        # evaluated class, so car AP (2D included) must drop to 0.
        for img in list(results.keys()):
            per_cls = results[img]
            keys = sorted(per_cls.keys())
            results[img] = {keys[(i + 1) % len(keys)]: per_cls[k]
                            for i, k in enumerate(keys)}
    elif inject:
        # floor calibration: corrupt one convention and watch AP collapse
        # (row layout: [alpha, bbox x4, dim x3, loc x3, ry, score])
        for per_cls in results.values():
            for cls in per_cls:
                rows = np.array(per_cls[cls], np.float64, copy=True)
                if rows.size == 0:
                    continue
                if inject == "ry_flip":
                    rows[:, 11] += np.pi / 2
                elif inject == "depth_sign":
                    rows[:, 10] = -rows[:, 10]
                else:
                    raise ValueError(inject)
                per_cls[cls] = rows
    save_kitti_results(results, save_dir, CLASS_NAMES)
    raw_dir = os.path.join(save_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    save_kitti_results(results_raw, raw_dir, CLASS_NAMES)

    binary = _build_eval_binary()
    gt_dir = os.path.join(base, "training", "label_2")
    proc = subprocess.run([binary, gt_dir, os.path.join(save_dir, "results")],
                          capture_output=True, text=True, timeout=300)
    out = proc.stdout
    if verbose:
        print(out)
    aps = {}
    for line in out.splitlines():
        m = re.match(r"(\w+) AP: ([\d.]+) ([\d.]+) ([\d.]+)", line.strip())
        if m:
            aps[m.group(1)] = tuple(float(m.group(i)) for i in (2, 3, 4))

    # Per-object pred-vs-GT errors.  With a tiny fixture the evaluator's
    # recall sampling quantises AP to ~1 point per GT object (its threshold
    # list assumes KITTI-scale GT counts), so the discriminative assertions
    # are the direct per-object comparisons.
    errors = []
    with open(os.path.join(base, "ImageSets_3dop", "val.txt")) as f:
        val_ids = [ln.strip() for ln in f if ln.strip()]
    def _best_match(g, rows):
        best, best_iou = None, 0.0
        for p in rows:
            iou = _iou2d(g["bbox"], p["bbox"])
            if iou > best_iou:
                best, best_iou = p, iou
        return best, best_iou

    for vid in val_ids:
        gt_rows = _read_kitti(os.path.join(gt_dir, f"{vid}.txt"), ALL_CLASSES)
        pr_rows = _read_kitti(os.path.join(save_dir, "results",
                                           f"{vid}.txt"), ALL_CLASSES)
        raw_rows = _read_kitti(os.path.join(raw_dir, "results",
                                            f"{vid}.txt"), ALL_CLASSES)
        for g in gt_rows:
            # match by 2D IoU over ALL classes, then record whether the
            # predicted class is right (a class-confusion bug keeps the
            # boxes but flips cls_ok to False)
            best, best_iou = _best_match(g, pr_rows)
            braw, _ = _best_match(g, raw_rows)
            z_cv = (abs(g["loc"][2] - braw["loc"][2])
                    if braw is not None else np.inf)
            if best is None:
                errors.append({"iou": 0.0, "z": np.inf, "ry": np.inf,
                               "z_cv": z_cv, "gt_type": g["type"],
                               "cls_ok": False})
                continue
            ry_err = abs((g["ry"] - best["ry"] + np.pi) % (2 * np.pi) - np.pi)
            errors.append({"iou": best_iou,
                           "z": abs(g["loc"][2] - best["loc"][2]),
                           "ry": ry_err, "z_cv": z_cv,
                           "gt_type": g["type"],
                           "cls_ok": best["type"] == g["type"]})
    if verbose:
        for e in errors:
            print(f"[overfit] obj: iou2d={e['iou']:.3f} "
                  f"z_err={e['z']:.2f}m z_cv_err={e['z_cv']:.2f}m "
                  f"ry_err={e['ry']:.3f}rad", flush=True)
    return aps, errors


ALL_CLASSES = ("Car", "Van", "Truck")


def _read_kitti(path, classes=("Car",)):
    rows = []
    if not os.path.exists(path):
        return rows
    for ln in open(path):
        f = ln.split()
        if not f or f[0] not in classes:
            continue
        rows.append({"type": f[0],
                     "bbox": [float(v) for v in f[4:8]],
                     "dim": [float(v) for v in f[8:11]],
                     "loc": [float(v) for v in f[11:14]],
                     "ry": float(f[14])})
    return rows


def _iou2d(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


@pytest.mark.slow
def test_fixture_overfit_ap(tmp_path):
    epochs = int(os.environ.get("OVERFIT_EPOCHS", "160"))
    aps, errors = run_overfit_ap(str(tmp_path), epochs=epochs, verbose=True)
    # 2D AP >= one recall point proves a true positive at IoU 0.7 through
    # the full chain (detector -> unwarp -> txt -> C++ evaluator).  The
    # per-object assertions are the discriminative part: a convention error
    # (x/z shift, theta +- pi/2, depth sign) breaks them systematically,
    # which is what this test exists to catch.
    assert "car_detection" in aps, f"no car 2D AP in evaluator output: {aps}"
    assert aps["car_detection"][0] >= 9.0, aps
    assert errors, "no GT objects compared"
    ious = [e["iou"] for e in errors]
    z_errs = [e["z"] for e in errors]
    ry_errs = [e["ry"] for e in errors]
    assert min(ious) >= 0.6, errors           # every GT car detected in 2D
    # calibrated on TPU (600-epoch run): z errors [2.50, 0.51] m — the
    # cost-volume depth underfits the fixture and dense-align caps at its
    # +-12.5 m window; floors catch systematic breaks, not quality
    assert float(np.median(z_errs)) <= 2.5, errors
    assert max(z_errs) <= 5.0, errors
    assert max(ry_errs) <= 0.4, errors        # pi/2 flips are ~1.57
    # PRE-ALIGN cost-volume depth must itself have learned (round-2's
    # soft-argmin collapse put z_cv at the extreme bin, ~10+ m off, and
    # dense-align rescued it; the depth_bin_ce aux loss fixes the head) —
    # VERDICT r2 #1.  Calibrated on TPU: see STATUS.md round-3 numbers.
    z_cv_errs = [e["z_cv"] for e in errors]
    assert float(np.median(z_cv_errs)) <= 0.5, errors
    assert max(z_cv_errs) <= 2.0, errors


@pytest.mark.slow
def test_fixture_acceptance_16scene(tmp_path):
    """Round-4 DISCRIMINATIVE acceptance (VERDICT r3 missing #1): train on
    a 16-scene fixture mixing easy/occluded/truncated recipes
    (data/synthetic.build_fixture recipes :84-122), close the full
    detect -> KITTI txt -> C++ evaluator loop, and assert AP3D/APBEV
    floors that provably break under convention bugs: the same trained
    predictions re-evaluated with an injected +pi/2 ry flip or a negated
    depth drop AP3D/APBEV from ~12 to exactly 0.0 (calibrated on the TPU,
    240 epochs — see STATUS.md round-4 acceptance table).

    Reference protocol being mirrored: testVal.py:105 ->
    stereoDataset.run_eval:333-337 -> evaluate_object_3d_offline.cpp.
    """
    epochs = int(os.environ.get("ACC16_EPOCHS", "240"))
    out = run_overfit_variants(str(tmp_path), epochs=epochs, n_scenes=16,
                               batch_size=4, verbose=True)
    aps, errors = out["clean"]
    # clean-run reference numbers: see the round-5 acceptance table in
    # STATUS.md (3-class fixture: 22 Car + 8 Van + 5 Truck GT objects)
    assert "car_detection_3d" in aps, aps
    for metric in ("car_detection_3d", "car_detection_ground"):
        assert min(aps[metric]) >= 5.0, (metric, aps)
    assert len(errors) >= 24, f"expected ~35 GT objects, got {len(errors)}"
    assert all(e["iou"] > 0 for e in errors), "undetected GT object"
    assert min(e["iou"] for e in errors) >= 0.6, errors
    z_cv = [e["z_cv"] for e in errors]
    assert float(np.median(z_cv)) <= 1.0, errors
    assert max(e["ry"] for e in errors) <= 0.5, errors

    # multi-class coverage (VERDICT r4 missing #3): the fixture now mixes
    # Car/Van/Truck; every class must appear, be detected, and carry the
    # RIGHT predicted class through decode -> merge -> txt
    seen = {e["gt_type"] for e in errors}
    assert seen == {"Car", "Van", "Truck"}, seen
    for cls in sorted(seen):
        cls_errs = [e for e in errors if e["gt_type"] == cls]
        assert all(e["cls_ok"] for e in cls_errs), (cls, cls_errs)
        assert min(e["iou"] for e in cls_errs) >= 0.6, (cls, cls_errs)

    # floor calibration: each injected convention bug must zero AP3D/APBEV
    # while leaving 2D AP intact (proves the floor is discriminative, not
    # slack)
    for variant in ("ry_flip", "depth_sign"):
        v_aps, _ = out[variant]
        assert max(v_aps["car_detection_3d"]) == 0.0, (variant, v_aps)
        assert max(v_aps["car_detection_ground"]) == 0.0, (variant, v_aps)
        assert v_aps["car_detection"] == aps["car_detection"], (variant,
                                                                v_aps)
    # a class-offset bug (buckets rotated by one) must zero even the 2D
    # car AP (the evaluator only counts detections OF the evaluated class)
    # and flip cls_ok to False on every matched GT
    s_aps, s_errors = out["class_shift"]
    assert max(s_aps.get("car_detection", (0.0,))) == 0.0, s_aps
    assert not any(e["cls_ok"] for e in s_errors), s_errors


if __name__ == "__main__":
    import tempfile
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    # honour JAX_PLATFORMS (sitecustomize pre-imports jax on the TPU relay)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    tmp = tempfile.mkdtemp(prefix="overfit_ap_")
    epochs = int(os.environ.get("OVERFIT_EPOCHS", "160"))
    align = os.environ.get("OVERFIT_ALIGN", "1") == "1"
    aps, errors = run_overfit_ap(
        tmp, epochs=epochs, run_align=align, verbose=True,
        n_scenes=int(os.environ.get("OVERFIT_SCENES", "2")),
        batch_size=int(os.environ.get("OVERFIT_BATCH", "2")),
        inject=os.environ.get("OVERFIT_INJECT") or None,
        ckpt=os.environ.get("OVERFIT_CKPT") or None)
    print("APs:", aps)
    print("errors:", errors)
    print("checkpoint + results under:", tmp)
