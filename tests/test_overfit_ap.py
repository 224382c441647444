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
                   run_align=True, verbose=False):
    from side_tpu.config import CLASS_NAMES, Config
    from side_tpu.data.dataset import StereoKitti
    from side_tpu.data.kitti import convert_split
    from side_tpu.data.loader import Loader
    from side_tpu.data.synthetic import build_fixture
    from side_tpu.models import create_model
    from side_tpu.models.stereo_net import init_stereo_net
    from side_tpu.postprocess.post_process import save_kitti_results
    from side_tpu.runtime.detector import Detector
    from side_tpu.runtime.trainer import Trainer

    data_dir = os.path.join(tmp, "data")
    save_dir = os.path.join(tmp, "exp")
    os.makedirs(save_dir, exist_ok=True)
    build_fixture(data_dir, n_train=2, n_val=2, seed=0)
    base = os.path.join(data_dir, "kitti")
    # overfit protocol: val == train (ids 000000, 000001 — one easy car each)
    with open(os.path.join(base, "ImageSets_3dop", "train.txt")) as f:
        train_ids = f.read()
    with open(os.path.join(base, "ImageSets_3dop", "val.txt"), "w") as f:
        f.write(train_ids)
    convert_split(base, "3dop", "val",
                  os.path.join(base, "annotations_3d", "kitti_3dop_val.json"))

    cfg = Config(data_dir=data_dir, exp_dir=save_dir,
                 input_h=input_hw[0], input_w=input_hw[1],
                 batch_size=2, lr=lr, lr_step=(10 ** 9,),
                 num_epochs=epochs, max_objs=16, K=16,
                 aug_ddd=0.0, no_color_aug=True, flip_train=False,
                 compute_dtype="float32", num_devices=1, uncert=False,
                 peak_thresh=0.25)

    train_ds = StereoKitti(cfg, "train")
    loader = Loader(train_ds, cfg.batch_size, shuffle=True, num_workers=2,
                    drop_last=True, seed=0)
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

    # -------- inference on the (identical) val split, full tail ----------
    val_ds = StereoKitti(cfg, "val")
    detector = Detector(cfg, variables=trainer.eval_variables)
    results = {}
    for img_id in val_ds.images:
        info = val_ds.coco.images[img_id]
        lp = os.path.join(val_ds.img_dir, info["file_name"])
        rp = os.path.join(val_ds.img_right_dir, info["file_name"])
        ret = detector.run([lp, rp], image_id=img_id, calib=info["calib"],
                           run_align=run_align)
        results[img_id] = ret["results"]
    save_kitti_results(results, save_dir, CLASS_NAMES)

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
    return aps


@pytest.mark.slow
def test_fixture_overfit_ap(tmp_path):
    aps = run_overfit_ap(str(tmp_path), verbose=True)
    # 2D AP proves detection + decode + unwarp; 3D/BEV AP additionally prove
    # instance depth, the Gauss-Newton pose solve, and every sign convention
    # in post_process.  Floors are loose on purpose: a convention error
    # drives these to ~0, which is what this test exists to catch.
    assert "car_detection" in aps, f"no car 2D AP in evaluator output: {aps}"
    assert aps["car_detection"][0] >= 60.0, aps
    assert "car_detection_ground" in aps, aps
    assert aps["car_detection_ground"][0] >= 20.0, aps
    assert "car_detection_3d" in aps, aps
    assert aps["car_detection_3d"][0] >= 10.0, aps


if __name__ == "__main__":
    import tempfile
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    # honour JAX_PLATFORMS (sitecustomize pre-imports jax on the TPU relay)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    tmp = tempfile.mkdtemp(prefix="overfit_ap_")
    epochs = int(os.environ.get("OVERFIT_EPOCHS", "160"))
    align = os.environ.get("OVERFIT_ALIGN", "1") == "1"
    aps = run_overfit_ap(tmp, epochs=epochs, run_align=align, verbose=True)
    print("APs:", aps)
