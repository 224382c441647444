#!/usr/bin/env python
"""Profile the jitted train step on TPU and print top ops by self time.

    python tools/train_profile.py [--steps 3] [--fwd_only]

Falls back to printing only wall-clock if the device trace is empty
(the remote-execution relay does not always forward device traces).
"""

import argparse
import glob
import os
import sys
import time

# tensorboard_plugin_profile's protos predate the C++ descriptor pool
# check; the pure-python implementation accepts them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build(batch_size, fwd_only):
    import jax
    import jax.numpy as jnp
    from side_tpu.config import Config
    from side_tpu.models.stereo_net import StereoNet, init_stereo_net
    from side_tpu.parallel.mesh import make_mesh, shard_batch
    from side_tpu.runtime.trainer import Trainer

    cfg = Config(batch_size=batch_size, uncert=True, num_devices=1)
    model = StereoNet(heads=dict(cfg.heads), roi_size=cfg.roi_size,
                      max_objs=cfg.max_objs, topk=cfg.K,
                      down_ratio=cfg.down_ratio, input_w=cfg.input_w,
                      dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda rng: init_stereo_net(model, rng, cfg.input_h, cfg.input_w,
                                    cfg.max_objs)
    )(jax.random.PRNGKey(0))
    mesh = make_mesh(1)
    trainer = Trainer(cfg, model, variables, steps_per_epoch=1000, mesh=mesh)

    rng = np.random.RandomState(0)
    B, K = batch_size, cfg.max_objs
    Ho, Wo = cfg.output_h, cfg.output_w
    hm = np.zeros((B, 3, Ho, Wo), np.float32)
    hm[:, 0, Ho // 2, Wo // 2] = 1.0
    ind = np.full((B, K), (Ho // 2) * Wo + Wo // 2, np.int64)
    batch = {
        "input": rng.randn(B, cfg.input_h, cfg.input_w, 3).astype(np.float32),
        "input_right": rng.randn(B, cfg.input_h, cfg.input_w,
                                 3).astype(np.float32),
        "hm": hm, "ind": ind, "ind_float": ind.astype(np.float32),
        "rot_mask": np.ones((B, K), np.uint8),
        "wh": np.full((B, K, 3), 12.0, np.float32),
        "reg": rng.rand(B, K, 3).astype(np.float32),
        "dim": np.full((B, K, 3), 1.5, np.float32),
        "orien": np.tile([0.0, 1.0], (B, K, 1)).astype(np.float32),
        "depth": np.full((B, K, 1), 15.0, np.float32),
        "kept": (rng.rand(B, K, 6) * 4).astype(np.float32),
        "fb": np.full((B,), 380.0, np.float32),
    }
    batch = shard_batch(batch, mesh)

    if fwd_only:
        @jax.jit
        def step(state, b):
            loss, _ = trainer._loss_fn(state.params, state.batch_stats, b,
                                       True)
            return state, {"loss": loss}
        return trainer, step, batch
    return trainer, trainer._train_step, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--trace_dir", default="/tmp/train_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    trainer, step_fn, batch = build(args.batch, args.fwd_only)
    state = trainer.state

    t0 = time.time()
    state, stats = step_fn(state, batch)
    float(jnp.asarray(stats["loss"]))
    print(f"compile+first step: {time.time()-t0:.1f}s", flush=True)

    def run_n(n, state):
        t0 = time.perf_counter()
        for _ in range(n):
            state, stats = step_fn(state, batch)
        float(jnp.asarray(stats["loss"]))
        return time.perf_counter() - t0, state

    t2, state = run_n(2, state)
    t10, state = run_n(10, state)
    per = (t10 - t2) / 8
    print(f"[train-profile] {'fwd' if args.fwd_only else 'fwd+bwd+adam'}: "
          f"{per*1e3:.1f} ms/step", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        _, state = run_n(args.steps, state)
    print_xplane_ops(args.trace_dir)


def print_xplane_ops(trace_dir, top=25, tag="train-profile"):
    """Best-effort xplane parse for device op totals (shared with
    tools/infer_profile.py)."""
    try:
        files = glob.glob(os.path.join(
            trace_dir, "**", "*.xplane.pb"), recursive=True)
        if not files:
            print(f"[{tag}] no xplane captured", flush=True)
            return
        try:
            from tensorboard_plugin_profile.convert import \
                raw_to_tool_data as r2t
            data, _ = r2t.xspace_to_tool_data(files, "op_profile", {})
        except (ImportError, AttributeError):
            # newer tf moved the converter to _pywrap_profiler_plugin
            from tensorflow.python.profiler.internal import \
                _pywrap_profiler_plugin as _pp
            data, _ = _pp.xspace_to_tools_data(files, "op_profile", {})
        import json
        prof = json.loads(data)

        def walk(node, out):
            m = node.get("metrics", {})
            if node.get("name") and m.get("rawTime"):
                out.append((node["name"], m.get("rawTime", 0)))
            for ch in node.get("children", []):
                walk(ch, out)
        out = []
        walk(prof.get("byProgram", prof), out)
        out.sort(key=lambda kv: -kv[1])
        for name, t in out[:top]:
            print(f"  {t/1e9*1000:10.3f} ms  {name}", flush=True)
    except Exception as e:
        print(f"[{tag}] xplane parse failed: {e}", flush=True)


if __name__ == "__main__":
    main()
