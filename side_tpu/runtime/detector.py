"""Inference engine with per-stage timing.

Replaces the reference detector
(/root/reference/src/lib/modules/stereoDetector.py:22-220): `pre_process`
runs the same affine pipeline as the dataset without augmentation (:45-82),
`process` is ONE jitted device program (forward + sigmoid + ddd_decode +
cost-volume depth, :84-103 — the reference decodes outside the model), and
`run` reports the same tot/load/pre/net/dec/post/merge wall-clock stages
(:146-220) with `block_until_ready` fences instead of cuda.synchronize."""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import geometry as G
from ..models import create_model
from ..models.stereo_net import init_stereo_net
from ..ops import decode as dec
from ..postprocess.post_process import process_frame
from . import checkpoint as ckpt

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class Detector:
    def __init__(self, cfg: Config, variables: Optional[dict] = None):
        self.cfg = cfg
        self.model = create_model(cfg)
        if variables is None:
            variables = jax.jit(
                functools.partial(init_stereo_net, self.model,
                                  input_h=cfg.input_h, input_w=cfg.input_w,
                                  max_objs=cfg.max_objs)
            )(jax.random.PRNGKey(0))
            if cfg.load_model:
                loaded = ckpt.load_checkpoint(cfg.load_model)
                ckpt.warn_radius_mismatch(loaded)
                params = ckpt.merge_restore(variables["params"],
                                            loaded["params"])
                bs = ckpt.merge_restore(variables["batch_stats"],
                                        loaded["batch_stats"]) \
                    if loaded["batch_stats"] else variables["batch_stats"]
                variables = {"params": params, "batch_stats": bs}
        self.variables = jax.device_put(variables)
        self.mean = np.asarray(cfg.mean, np.float32).reshape(1, 1, 3)
        self.std = np.asarray(cfg.std, np.float32).reshape(1, 1, 3)

        cost_volume = cfg.cost_volume
        mean_c = self.mean
        std_c = self.std

        def _norm(x):
            # host pre_process ships warped uint8 (4x smaller H2D than f32);
            # normalisation runs on device where it fuses into the first conv
            if x.dtype == jnp.uint8:
                return (x.astype(jnp.float32) / 255.0 - mean_c) / std_c
            return x

        @jax.jit
        def _process(variables, batch):
            batch = dict(batch)
            batch["input"] = _norm(batch["input"])
            batch["input_right"] = _norm(batch["input_right"])
            out = self.model.apply(variables, batch,
                                   use_cost_volume=cost_volume,
                                   target=None, train=False)
            hm = jax.nn.sigmoid(out["hm"])
            dets, dets_r, info = dec.ddd_decode(
                hm, out["kept_type"], out["dim"], out["orien"],
                out["wh"], out["reg"], grid_size=cfg.grid, K=cfg.K)
            if cost_volume:
                info = jnp.concatenate([info, out["depth"]], axis=2)
            return dets, dets_r, info

        self._process = _process

    # -------------------------------------------------------------- stages
    def pre_process(self, image, image_right, calib):
        cfg = self.cfg
        height, width = image.shape[:2]
        c = np.array([width / 2.0, height / 2.0], np.float32)
        if cfg.keep_res:
            s = np.array([cfg.input_w, cfg.input_h], np.int32)
        else:
            s = np.array([width, height], np.int32)
        trans = G.get_affine_transform(c, s, 0, [cfg.input_w, cfg.input_h])

        def prep(im):
            from ..data.dataset import warp_affine
            x = warp_affine(im, trans, cfg.input_w, cfg.input_h)
            return x[None]  # NHWC uint8; normalised on device in _process

        trans_out = G.get_affine_transform(
            c, s, 0, [cfg.output_w, cfg.output_h])
        trans_inv = G.get_affine_transform(
            c, s, 0, [cfg.output_w, cfg.output_h], inv=True)
        meta = {"c": c, "s": s, "calib": calib, "trans": trans_out,
                "trans_inv": trans_inv}
        return prep(image), prep(image_right), meta

    def process(self, batch):
        dets, dets_r, info = self._process(self.variables, batch)
        jax.block_until_ready(info)
        return dets, dets_r, info

    def merge_outputs(self, results: Dict[int, np.ndarray]):
        """Per-class peak_thresh filter (stereoDetector.py:118-124)."""
        out = {}
        for cls, rows in results.items():
            rows = np.asarray(rows)
            out[cls] = rows[rows[:, -1] > self.cfg.peak_thresh] \
                if len(rows) else rows
        return out

    # --------------------------------------------------- pipelined stages
    def load_and_pre(self, images_or_paths, calib):
        """Host stages: image load + affine pre-process.  Runs fine on a
        worker thread (reference: PrefetchDataset workers running
        detector.pre_process, testVal.py:25-53)."""
        t0 = time.time()
        if isinstance(images_or_paths, (list, tuple)) and \
                isinstance(images_or_paths[0], str):
            image = cv2.imread(images_or_paths[0])
            image_right = cv2.imread(images_or_paths[1])
        else:
            image, image_right = images_or_paths
        t_load = time.time()
        inp, inp_right, meta = self.pre_process(image, image_right, calib)
        batch = {
            "input": jnp.asarray(inp),
            "input_right": jnp.asarray(inp_right),
            "fb": jnp.asarray(
                [np.float32(_fb_from_calib(calib))], jnp.float32),
            "p2": jnp.asarray(np.asarray(calib[2], np.float32)[None]),
            "p3": jnp.asarray(np.asarray(calib[3], np.float32)[None]),
            "trans": jnp.asarray(meta["trans"].astype(np.float32)[None]),
            "trans_inv": jnp.asarray(
                meta["trans_inv"].astype(np.float32)[None]),
        }
        t_pre = time.time()
        return {"batch": batch, "meta": meta, "image": image,
                "image_right": image_right, "t0": t0,
                "load": t_load - t0, "pre": t_pre - t_load}

    def dispatch(self, pre, run_align: bool = True) -> Dict:
        """Enqueue the device programs WITHOUT waiting (JAX dispatch is
        async): the chip computes frame i while the host post-processes
        frame i-1 and a worker pre-processes frame i+1.

        By default the ENTIRE tail (unwarp + solve + dense align +
        re-solve, see postprocess/device_tail.py) is chained onto the
        decode outputs on device, so `finish` fetches one (K, 13) array
        instead of three decode tensors + two more per-frame dispatches
        (round-2's 90 ms dec + 100 ms post host tail).  Set
        SIDE_TPU_HOST_TAIL=1 to fall back to the host numpy tail."""
        import os
        t = time.time()
        dets, dets_r, info = self._process(self.variables, pre["batch"])
        if os.environ.get("SIDE_TPU_HOST_TAIL", "0") == "1":
            pre.update(handles=(dets, dets_r, info), fused=False,
                       run_align=run_align, t_dispatch=time.time() - t)
            return pre
        from ..postprocess.device_tail import run_tail
        rows, classes = run_tail(dets[0], dets_r[0], info[0], pre["image"],
                                 pre["image_right"], pre["meta"], self.cfg,
                                 run_align=run_align)
        pre.update(handles=(rows, classes), fused=True, run_align=run_align,
                   t_dispatch=time.time() - t)
        return pre

    def finish(self, pending, run_align=None) -> Dict:
        """Fetch the device outputs and finish the post-processing tail."""
        if run_align is not None and run_align != pending["run_align"] \
                and pending["fused"]:
            # caller changed its mind after dispatch: re-dispatch fused tail
            pending = self.dispatch(pending, run_align=run_align)
        t_net0 = time.time()
        if pending["fused"]:
            rows, classes = pending["handles"]
            jax.block_until_ready(rows)
            t_net = time.time()
            rows = np.asarray(rows)
            classes = np.asarray(classes)
            t_dec = time.time()
            keep = rows[:, 12] > self.cfg.peak_thresh
            results = {}
            for cls in range(self.cfg.num_classes):
                sel = keep & (classes == cls)
                results[cls + 1] = rows[sel]
            t_post = time.time()
        else:
            dets, dets_r, info = pending["handles"]
            jax.block_until_ready(info)
            t_net = time.time()
            dets = np.asarray(dets[0])
            dets_r = np.asarray(dets_r[0])
            info = np.asarray(info[0])
            t_dec = time.time()
            results = process_frame(
                dets, dets_r, info, pending["meta"], self.cfg,
                img_left=pending["image"],
                img_right=pending["image_right"],
                run_align=pending["run_align"])
            t_post = time.time()
        results = self.merge_outputs(results)
        t_end = time.time()
        return {
            "results": results,
            "tot": t_end - pending["t0"], "load": pending["load"],
            "pre": pending["pre"], "net": t_net - t_net0,
            "dec": t_dec - t_net, "post": t_post - t_dec,
            "merge": t_end - t_post,
        }

    # --------------------------------------------------- batched pipeline
    def dispatch_batch(self, pres, run_align: bool = True) -> Dict:
        """Batched dispatch: ONE device program forward+decodes B frames and
        ONE fused tail post-processes them (the reference eval loop is
        frame-at-a-time, stereoDetector.py:146-220; the batch axis is free
        TPU parallelism).  `pres` is a list of `load_and_pre` outputs."""
        t = time.time()
        batch = {k: jnp.concatenate([p["batch"][k] for p in pres], axis=0)
                 for k in pres[0]["batch"]}
        dets, dets_r, info = self._process(self.variables, batch)
        from ..postprocess.device_tail import run_tail_batch
        rows, classes = run_tail_batch(
            dets, dets_r, info,
            [p["image"] for p in pres], [p["image_right"] for p in pres],
            [p["meta"] for p in pres], self.cfg, run_align=run_align)
        return {"handles": (rows, classes), "pres": pres,
                "t_dispatch": time.time() - t}

    def finish_batch(self, pending) -> list:
        """Fetch the batched outputs; returns one result dict per frame."""
        pres = pending["pres"]
        t_net0 = time.time()
        rows_b, classes_b = pending["handles"]
        jax.block_until_ready(rows_b)
        t_net = time.time()
        rows_b = np.asarray(rows_b)
        classes_b = np.asarray(classes_b)
        t_dec = time.time()
        outs = []
        for i, pre in enumerate(pres):
            rows, classes = rows_b[i], classes_b[i]
            keep = rows[:, 12] > self.cfg.peak_thresh
            results = {}
            for cls in range(self.cfg.num_classes):
                sel = keep & (classes == cls)
                results[cls + 1] = rows[sel]
            t_post = time.time()
            results = self.merge_outputs(results)
            t_end = time.time()
            outs.append({
                "results": results,
                "tot": t_end - pre["t0"], "load": pre["load"],
                "pre": pre["pre"],
                "net": (t_net - t_net0) / len(pres),
                "dec": (t_dec - t_net) / len(pres),
                "post": t_post - t_dec, "merge": t_end - t_post,
            })
        return outs

    # ------------------------------------------------------------------ run
    def run(self, images_or_paths, image_id=None, calib=None,
            run_align: bool = True) -> Dict:
        pre = self.load_and_pre(images_or_paths, calib)
        return self.finish(self.dispatch(pre, run_align=run_align))


def _fb_from_calib(calib) -> float:
    p2 = np.asarray(calib[2], np.float64).reshape(3, 4)
    p3 = np.asarray(calib[3], np.float64).reshape(3, 4)
    return float(p2[0, 3] - p3[0, 3])
