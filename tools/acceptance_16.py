#!/usr/bin/env python
"""Round-4 discriminative acceptance protocol (VERDICT r3 missing #1).

Runs the FULL mixed-recipe acceptance in one process:

  1. train on a 16-scene fixture mixing easy / occluded / truncated
     recipes (data/synthetic.build_fixture), val split == train split;
  2. inference -> KITTI txt -> C++ evaluator, record AP3D/APBEV/AP2D at
     Easy/Moderate/Hard plus per-object errors (clean run);
  3. floor calibration: re-run the save/eval step from the SAME trained
     checkpoint with an injected +pi/2 ry flip and with a negated depth,
     recording how far each AP falls — proving the clean floors are
     discriminative against exactly the convention bugs the reference's
     full-split acceptance (testVal.py:105) would catch.

Prints one JSON line per run so STATUS.md numbers are reproducible:
  python tools/acceptance_16.py --epochs 240 --out /tmp/acc16
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="/tmp/acc16")
    ap.add_argument("--ckpt", default=None,
                    help="skip training, reuse a trained model_last.npz")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from test_overfit_ap import run_overfit_variants

    os.makedirs(args.out, exist_ok=True)
    out = run_overfit_variants(
        args.out, epochs=args.epochs, n_scenes=args.scenes,
        batch_size=args.batch, ckpt=args.ckpt, verbose=args.verbose)
    runs = {}
    for tag, (aps, errors) in out.items():
        summary = {
            "run": tag,
            "aps": {k: list(v) for k, v in aps.items()},
            "n_objects": len(errors),
            "detected": sum(1 for e in errors if e["iou"] > 0),
            "iou_min": float(min((e["iou"] for e in errors), default=0.0)),
            "z_med": float(_med([e["z"] for e in errors])),
            "z_max": float(_fmax([e["z"] for e in errors])),
            "z_cv_med": float(_med([e["z_cv"] for e in errors])),
            "ry_max": float(_fmax([e["ry"] for e in errors])),
            "per_class": {
                cls: {"n": len(ce),
                      "detected": sum(1 for e in ce if e["iou"] > 0),
                      "cls_ok": sum(1 for e in ce if e.get("cls_ok"))}
                for cls in sorted({e.get("gt_type", "Car") for e in errors})
                for ce in [[e for e in errors
                            if e.get("gt_type", "Car") == cls]]},
        }
        runs[tag] = summary
        print(json.dumps(summary), flush=True)

    # _med/_fmax return inf for non-finite per-object errors (e.g. an
    # undetected GT); json.dump would emit the non-standard token Infinity,
    # so serialize non-finite floats as null for strict parsers.
    def _jsonable(v):
        if isinstance(v, float) and not math.isfinite(v):
            return None
        if isinstance(v, dict):
            return {k: _jsonable(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_jsonable(x) for x in v]
        return v

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(_jsonable(runs), f, indent=2)
    print("checkpoint:", os.path.join(args.out, "exp", "model_last.npz"))


def _med(vals):
    import numpy as np
    fin = [v for v in vals if np.isfinite(v)]
    return np.median(fin) if fin else float("inf")


def _fmax(vals):
    import numpy as np
    fin = [v for v in vals if np.isfinite(v)]
    return max(fin) if len(fin) == len(vals) and fin else float("inf")


if __name__ == "__main__":
    main()
