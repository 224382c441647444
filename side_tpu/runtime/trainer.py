"""Training engine: SPMD data-parallel Adam with uncertainty weighting.

Functional replacement of the reference trainer
(/root/reference/src/lib/modules/stereoTrainer.py:146-325 and
testTrain.py:21-117): one jitted `train_step` computes the forward (GT RoIs
feed the cost volume, stereoTrainer.py:40-63), the 7-component loss, and an
Adam update; the batch is sharded over the "data" mesh axis so XLA emits the
gradient all-reduce over ICI (replacing chunked DataParallel).

The Kendall uncertainty weights (testTrain.py:34-44) live inside the
optimised parameter tree as `loss_weight`, initialised to -1."""

from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..ops.decode import boxes_from_targets
from ..ops.losses import stereo_loss
from ..parallel.mesh import make_mesh, replicate, shard_batch
from . import checkpoint as ckpt
from .logger import AverageMeter, Logger


class TrainState(NamedTuple):
    params: Dict[str, Any]       # {"model": ..., ["loss_weight": (7,)]}
    batch_stats: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


BATCH_KEYS = ("input", "input_right", "hm", "wh", "reg", "dim", "orien",
              "depth", "kept", "ind", "ind_float", "rot_mask", "fb",
              "p2", "p3", "trans", "trans_inv")


def normalize_images(batch, mean, std):
    """On-device normalisation of uint8-transported images (cfg.uint8_images):
    (x/255 - mean)/std in f32, fused by XLA into the first conv.  float
    inputs pass through (already normalised on host)."""
    out = dict(batch)
    for k in ("input", "input_right"):
        x = out.get(k)
        if x is not None and x.dtype == jnp.uint8:
            out[k] = (x.astype(jnp.float32) / 255.0 - mean) / std
    return out


class Trainer:
    def __init__(self, cfg: Config, model, variables, steps_per_epoch: int,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_devices)
        self.steps_per_epoch = max(1, steps_per_epoch)

        # lr schedule: x0.1 at each lr_step epoch (testTrain.py:104-110).
        # Boundaries clamp to int32 range: the schedule's step counter is
        # int32 under jit, and "never decay" protocols pass lr_step=(1e9,)
        # which overflows once multiplied by steps_per_epoch.
        boundaries = {min(e * self.steps_per_epoch, 2**31 - 1): 0.1
                      for e in cfg.lr_step}
        self.lr_schedule = optax.piecewise_constant_schedule(cfg.lr,
                                                             boundaries)
        self.tx = optax.adam(self.lr_schedule)

        params: Dict[str, Any] = {"model": variables["params"]}
        if cfg.uncert:
            params["loss_weight"] = jnp.full((7,), -1.0, jnp.float32)
        state = TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        self.state = replicate(state, self.mesh)

        self.loss_states = ["loss", "hm_loss", "wh_loss", "off_loss",
                            "dim_loss", "orien_loss", "kept_loss"]
        if cfg.cost_volume:
            self.loss_states.append("depth_loss")

        self._train_step = jax.jit(self._make_step(train=True),
                                   donate_argnums=(0,))
        self._val_step = jax.jit(self._make_step(train=False))

    # ------------------------------------------------------------------ steps
    def _loss_fn(self, params, batch_stats, batch, train: bool,
                 step=None):
        cfg = self.cfg
        batch = normalize_images(batch, jnp.asarray(cfg.mean, jnp.float32),
                                 jnp.asarray(cfg.std, jnp.float32))
        target = boxes_from_targets(batch["ind_float"], batch["wh"],
                                    batch["reg"], cfg.output_w, cfg.wh_scale)
        variables = {"params": params["model"], "batch_stats": batch_stats}
        if train:
            # per-step dropout rng (the voxel variant's PointNetDepth uses
            # nn.Dropout(0.3), pointNet.py:45-82); harmless for dropout-free
            # models
            rngs = {"dropout": jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed),
                step if step is not None else 0)}
            out, mut = self.model.apply(
                variables, batch, use_cost_volume=cfg.cost_volume,
                target=target, train=True, mutable=["batch_stats"],
                rngs=rngs)
            new_bs = mut["batch_stats"]
        else:
            out = self.model.apply(variables, batch,
                                   use_cost_volume=cfg.cost_volume,
                                   target=target, train=False)
            new_bs = batch_stats
        lw = params.get("loss_weight", jnp.asarray(cfg.loss_weight))
        total, stats = stereo_loss(out, batch, lw, cfg.grid, cfg.uncert,
                                   cfg.cost_volume,
                                   depth_aux_weight=cfg.depth_aux_weight,
                                   mse_loss=cfg.mse_loss)
        return total, (stats, new_bs)

    def _make_step(self, train: bool):
        if train:
            def step(state: TrainState, batch):
                grad_fn = jax.value_and_grad(
                    lambda p: self._loss_fn(p, state.batch_stats, batch,
                                            True, step=state.step),
                    has_aux=True)
                (_, (stats, new_bs)), grads = grad_fn(state.params)
                updates, new_opt = self.tx.update(grads, state.opt_state,
                                                  state.params)
                new_params = optax.apply_updates(state.params, updates)
                new_state = TrainState(new_params, new_bs, new_opt,
                                       state.step + 1)
                return new_state, stats
            return step

        def val_step(state: TrainState, batch):
            _, (stats, _) = self._loss_fn(state.params, state.batch_stats,
                                          batch, False)
            return stats
        return val_step

    # ------------------------------------------------------------------ epoch
    def run_epoch(self, phase: str, epoch: int, loader,
                  logger: Optional[Logger] = None) -> Dict[str, float]:
        cfg = self.cfg
        meters = {l: AverageMeter() for l in self.loss_states}
        data_time, batch_time = AverageMeter(), AverageMeter()
        num_iters = len(loader) if cfg.num_iters < 0 else cfg.num_iters
        end = time.time()
        stats = None
        for it, batch in enumerate(loader):
            if it >= num_iters:
                break
            data_time.update(time.time() - end)
            n = batch["input"].shape[0]
            batch = {k: batch[k] for k in BATCH_KEYS if k in batch}
            batch = shard_batch(batch, self.mesh)
            if phase == "train":
                self.state, stats = self._train_step(self.state, batch)
            else:
                stats = self._val_step(self.state, batch)
            stats = jax.device_get(stats)
            for l in meters:
                meters[l].update(float(stats[l]), n)
            batch_time.update(time.time() - end)
            end = time.time()

            if cfg.print_iter > 0 and it % cfg.print_iter == 0:
                msg = f"{cfg.task}/{cfg.exp_id} {phase} [{epoch}][{it}/{num_iters}]"
                for l in meters:
                    msg += f"|{l} {meters[l].avg:.4f} "
                if cfg.uncert:
                    lw = np.asarray(jax.device_get(
                        self.state.params["loss_weight"]))
                    msg += "|lw " + ",".join(f"{w:.3f}" for w in lw)
                if not cfg.hide_data_time:
                    msg += (f"|Data {data_time.val:.3f}s({data_time.avg:.3f}s)"
                            f"|Net {batch_time.avg:.3f}s")
                print(msg, flush=True)

        ret = {l: m.avg for l, m in meters.items()}
        ret["time"] = batch_time.sum / 60.0
        return ret

    def train(self, epoch: int, loader, logger=None):
        return self.run_epoch("train", epoch, loader, logger)

    def val(self, epoch: int, loader, logger=None):
        return self.run_epoch("val", epoch, loader, logger)

    # ------------------------------------------------------------- checkpoint
    def save(self, path: str, epoch: int):
        if jax.process_index() != 0:   # params replicated: host 0 writes
            return
        state = jax.device_get(self.state)
        lw = state.params.get("loss_weight")
        # flatten adam moments for exact resume
        opt_flat = {}
        for i, leaf in enumerate(jax.tree.leaves(state.opt_state)):
            opt_flat[f"leaf_{i}"] = np.asarray(leaf)
        ckpt.save_checkpoint(path, epoch, state.params["model"],
                             state.batch_stats, opt_flat, lw)

    def load(self, path: str, resume: bool = False) -> int:
        loaded = ckpt.load_checkpoint(path)
        ckpt.warn_radius_mismatch(loaded)
        state = jax.device_get(self.state)
        merged = ckpt.merge_restore(state.params["model"], loaded["params"])
        bs = ckpt.merge_restore(state.batch_stats, loaded["batch_stats"]) \
            if loaded["batch_stats"] else state.batch_stats
        params = dict(state.params)
        params["model"] = merged
        start_epoch = 0
        if self.cfg.uncert and loaded.get("loss_weight") is not None:
            params["loss_weight"] = jnp.asarray(loaded["loss_weight"])
        opt_state = state.opt_state
        step = state.step
        if resume and loaded.get("opt"):
            leaves, treedef = jax.tree.flatten(state.opt_state)
            try:
                new_leaves = [loaded["opt"][f"leaf_{i}"].astype(l.dtype)
                              if hasattr(l, "dtype") else loaded["opt"][f"leaf_{i}"]
                              for i, l in enumerate(leaves)]
                opt_state = jax.tree.unflatten(treedef, new_leaves)
                start_epoch = loaded["epoch"]
                step = jnp.asarray(start_epoch * self.steps_per_epoch,
                                   jnp.int32)
                print(f"Resumed optimizer at epoch {start_epoch}")
            except Exception as e:  # shape drift: keep fresh optimizer
                print(f"Could not restore optimizer state ({e}); reinit.")
        new_state = TrainState(params, bs, opt_state, step)
        self.state = replicate(jax.device_get(new_state), self.mesh)
        return start_epoch

    @property
    def eval_variables(self):
        state = jax.device_get(self.state)
        return {"params": state.params["model"],
                "batch_stats": state.batch_stats}
