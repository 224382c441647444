"""Checkpointing with shape-tolerant partial restore.

Mirrors the reference's save/load semantics
(/root/reference/src/lib/models/model.py:30-98): a checkpoint stores
{epoch, params, batch_stats, opt_state, loss_weight}; on restore, params
whose shape mismatches (or that are missing) are back-filled from the fresh
model with a warning — the mechanism the reference relies on for
fine-tuning from CenterNet weights — and `resume` additionally restores the
optimizer and replays the lr schedule.

Format: a single .npz of flattened path->array plus a JSON meta blob (no
pickle, no torch)."""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def dcn_radius_tag() -> int:
    """The active DCN offset-bound this process trains/evals with: the
    window radius for the windowed/pallas kernels, -1 for the exact
    (unbounded, reference-faithful) gather path.  Stored in checkpoints
    because the clamp is part of the trained function class (see
    STATUS.md: trained offsets saturate the bound, so a checkpoint must
    be evaluated with the radius it was trained with)."""
    from ..ops import deform_conv as dc
    return -1 if dc._resolve_mode() == "exact" else dc._DCN_RADIUS


def save_checkpoint(path: str, epoch: int, params, batch_stats,
                    opt_state_flat: Optional[Dict[str, np.ndarray]] = None,
                    loss_weight=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blobs: Dict[str, np.ndarray] = {}
    for name, tree in (("params", params), ("batch_stats", batch_stats)):
        for k, v in _flatten(jax.device_get(tree)).items():
            blobs[f"{name}::{k}"] = v
    if opt_state_flat:
        for k, v in opt_state_flat.items():
            blobs[f"opt::{k}"] = v
    if loss_weight is not None:
        blobs["loss_weight::lw"] = np.asarray(jax.device_get(loss_weight))
    blobs["meta::epoch"] = np.asarray(epoch)
    blobs["meta::dcn_radius"] = np.asarray(dcn_radius_tag())
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **blobs)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    data = np.load(path, allow_pickle=False)
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        group, sub = key.split("::", 1)
        groups.setdefault(group, {})[sub] = data[key]
    out: Dict[str, Any] = {
        "epoch": int(groups.get("meta", {}).get("epoch", 0)),
        "params": _unflatten(groups.get("params", {})),
        "batch_stats": _unflatten(groups.get("batch_stats", {})),
        "opt": groups.get("opt", None),
    }
    if "loss_weight" in groups:
        out["loss_weight"] = groups["loss_weight"]["lw"]
    if "dcn_radius" in groups.get("meta", {}):
        out["dcn_radius"] = int(groups["meta"]["dcn_radius"])
    return out


def warn_radius_mismatch(loaded: Dict[str, Any], log=print) -> None:
    """Warn when a checkpoint is run under a different DCN offset bound
    than it was trained with (checkpoints from before the tag was added
    carry no radius and are skipped)."""
    stored = loaded.get("dcn_radius")
    if stored is None:
        return
    active = dcn_radius_tag()
    if stored != active:
        def name(r):
            return "exact (unbounded)" if r == -1 else f"windowed R={r}"
        log(f"WARNING: checkpoint trained with DCN {name(stored)} but "
            f"running with {name(active)} — the offset clamp is part of "
            f"the trained function; set SIDE_TPU_DCN/SIDE_TPU_DCN_RADIUS "
            f"to match (see STATUS.md).")


def merge_restore(fresh, loaded, log=print) -> Any:
    """Shape-tolerant merge (model.py:51-63): loaded leaves replace fresh
    ones when the path exists and the shape matches; otherwise the fresh
    value is kept and a message printed."""
    fresh_flat = _flatten(jax.device_get(fresh))
    loaded_flat = _flatten(loaded)
    merged = {}
    for k, v in fresh_flat.items():
        if k in loaded_flat:
            lv = loaded_flat[k]
            if tuple(lv.shape) == tuple(v.shape):
                merged[k] = lv.astype(v.dtype)
            else:
                log(f"Skip loading parameter {k}: required "
                    f"{v.shape}, loaded {lv.shape}")
                merged[k] = v
        else:
            log(f"No param {k} in checkpoint; keeping fresh init.")
            merged[k] = v
    for k in loaded_flat:
        if k not in fresh_flat:
            log(f"Drop parameter {k} (not in model).")
    return _unflatten(merged)
