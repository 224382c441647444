#!/usr/bin/env python
"""Clamp-finetune recipe for imported reference weights (VERDICT r3 #7).

Reference-trained DCN offsets are unbounded (dcn_v2_im2col_cuda.cu:125);
the production TPU kernels clamp offsets to ±R (R=1).  The offset audit
(tools/offset_audit.py) showed trained offsets saturate the clamp, i.e.
unbounded checkpoints CANNOT be evaluated with the windowed kernels —
previously the only options were SIDE_TPU_DCN=exact (4-6x slower) or a
full retrain.  This script demonstrates the third path end-to-end:

  A. train a model with the EXACT (unbounded) kernels on the fixture —
     the hermetic stand-in for "weights imported from a reference
     checkpoint via tools/convert_reference_weights.py";
  B. evaluate that checkpoint naively under the clamped production
     kernels (expected: broken — quantifies why the recipe is needed);
  C. finetune briefly (epochs_ft << epochs_a) under the clamp starting
     from A's weights, then evaluate with the production kernels:
     the overfit-acceptance per-object floors must pass.

Run on TPU (clamped = pallas) or CPU (clamped = windowed; identical
semantics, parity-tested):

    python tools/finetune_clamp.py --epochs 160 --epochs_ft 40
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def _train(cfg, out_path, epochs, load=None, verbose=False):
    import jax
    from side_tpu.data.dataset import StereoKitti
    from side_tpu.data.loader import Loader
    from side_tpu.models import create_model
    from side_tpu.models.stereo_net import init_stereo_net
    from side_tpu.runtime.trainer import Trainer

    train_ds = StereoKitti(cfg, "train")
    loader = Loader(train_ds, cfg.batch_size, shuffle=True, num_workers=2,
                    drop_last=True, seed=0)
    model = create_model(cfg)
    variables = jax.jit(
        lambda r: init_stereo_net(model, r, cfg.input_h, cfg.input_w,
                                  cfg.max_objs))(jax.random.PRNGKey(0))
    trainer = Trainer(cfg, model, variables, steps_per_epoch=len(loader))
    if load:
        trainer.load(load)
    stats = {}
    for epoch in range(1, epochs + 1):
        stats = trainer.train(epoch, loader)
        if verbose and (epoch % 20 == 0 or epoch == 1):
            print(f"  epoch {epoch}: loss={stats['loss']:.3f}", flush=True)
    assert np.isfinite(stats["loss"])
    trainer.save(out_path, epochs)
    return out_path


def run_recipe(out_dir, epochs=160, epochs_ft=40, verbose=False):
    """Returns {phase: error summary}; phases 'naive' and 'finetuned' are
    both evaluated under the clamped production kernels."""
    import jax
    from side_tpu.config import Config
    from side_tpu.data.kitti import convert_split
    from side_tpu.data.synthetic import build_fixture
    from side_tpu.ops import deform_conv as dc
    from test_overfit_ap import run_overfit_ap

    clamped_mode = "pallas" if jax.default_backend() == "tpu" else "windowed"

    data_dir = os.path.join(out_dir, "data")
    build_fixture(data_dir, n_train=2, n_val=2, seed=0)
    base = os.path.join(data_dir, "kitti")
    with open(os.path.join(base, "ImageSets_3dop", "train.txt")) as f:
        train_ids = f.read()
    with open(os.path.join(base, "ImageSets_3dop", "val.txt"), "w") as f:
        f.write(train_ids)
    convert_split(base, "3dop", "val",
                  os.path.join(base, "annotations_3d",
                               "kitti_3dop_val.json"))

    cfg = Config(data_dir=data_dir, exp_dir=os.path.join(out_dir, "exp"),
                 input_h=128, input_w=384, batch_size=2, lr=1e-3,
                 lr_step=(10 ** 6,), num_epochs=epochs, max_objs=16, K=16,
                 aug_ddd=0.0, no_color_aug=True, flip_train=False,
                 compute_dtype="float32", num_devices=1, uncert=False,
                 peak_thresh=0.25)

    # A: "imported reference weights" — trained unbounded
    print(f"[finetune-clamp] A: training {epochs} epochs with EXACT "
          f"(unbounded) DCN", flush=True)
    dc.set_dcn_mode("exact")
    ckpt_exact = _train(cfg, os.path.join(out_dir, "model_exact.npz"),
                        epochs, verbose=verbose)

    # B: naive eval of unbounded weights under the clamp
    print(f"[finetune-clamp] B: naive eval under {clamped_mode} R="
          f"{dc._DCN_RADIUS}", flush=True)
    dc.set_dcn_mode(clamped_mode)
    summaries = {}
    for tag, ckpt in (("naive", ckpt_exact),):
        _, errors = run_overfit_ap(os.path.join(out_dir, tag),
                                   ckpt=ckpt, verbose=verbose)
        summaries[tag] = _summary(errors)
        print(json.dumps({tag: summaries[tag]}), flush=True)

    # C: brief finetune under the clamp, then the same eval
    print(f"[finetune-clamp] C: finetuning {epochs_ft} epochs under the "
          f"clamp", flush=True)
    ckpt_ft = _train(cfg, os.path.join(out_dir, "model_ft.npz"),
                     epochs_ft, load=ckpt_exact, verbose=verbose)
    _, errors = run_overfit_ap(os.path.join(out_dir, "finetuned"),
                               ckpt=ckpt_ft, verbose=verbose)
    summaries["finetuned"] = _summary(errors)
    print(json.dumps({"finetuned": summaries["finetuned"]}), flush=True)
    return summaries


def _summary(errors):
    fin = [e for e in errors if np.isfinite(e["z"])]
    return {
        "n_objects": len(errors),
        "detected": sum(1 for e in errors if e["iou"] > 0),
        "iou_min": float(min((e["iou"] for e in errors), default=0.0)),
        "z_med": float(np.median([e["z"] for e in fin])) if fin else None,
        "z_max": float(max(e["z"] for e in fin)) if fin else None,
        "ry_max": float(max(e["ry"] for e in fin)) if fin else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=160)
    ap.add_argument("--epochs_ft", type=int, default=40)
    ap.add_argument("--out", default="/tmp/finetune_clamp")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    os.makedirs(args.out, exist_ok=True)
    summaries = run_recipe(args.out, args.epochs, args.epochs_ft,
                           verbose=args.verbose)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summaries, f, indent=2)


if __name__ == "__main__":
    main()
