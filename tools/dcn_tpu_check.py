#!/usr/bin/env python
"""In-model TPU validation + timing of the Pallas windowed DCN.

Round-1 blocker: the Pallas DCN kernel compiled standalone at every layer
shape but tripped Mosaic's default 16M scoped-vmem budget inside the full
backbone.  Round 2 raises the per-kernel budget (SIDE_TPU_DCN_VMEM); this
script proves the fix on the real chip:

  1. numerics: full backbone+heads forward with SIDE_TPU_DCN=pallas vs the
     exact gather path, with offset_mask params perturbed so every DCN layer
     sees non-zero fractional offsets (|offset| < radius, where windowed is
     mathematically exact — see ops/deform_conv.py:deform_conv2d_windowed);
  2. timing: two-length fetch-synced scan of the full model (net+dec path)
     in pallas mode (same protocol as bench.py).

Run on the TPU (several remote compiles, ~minutes each):
    python tools/dcn_tpu_check.py [--skip_parity] [--skip_timing]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_parity", action="store_true")
    ap.add_argument("--skip_timing", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--modes", default="pallas,exact")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from side_tpu.config import Config
    from side_tpu.models.stereo_net import StereoNet, init_stereo_net
    from side_tpu.ops import deform_conv

    print("devices:", jax.devices(), flush=True)

    B = args.batch
    cfg = Config()
    rng = np.random.RandomState(0)
    batch = {
        "input": jnp.asarray(rng.randn(B, cfg.input_h, cfg.input_w, 3),
                             jnp.float32),
        "input_right": jnp.asarray(
            rng.randn(B, cfg.input_h, cfg.input_w, 3), jnp.float32),
        "fb": jnp.full((B,), 380.0, jnp.float32),
    }

    model = StereoNet(heads=dict(cfg.heads), roi_size=16, max_objs=50,
                      topk=cfg.K, down_ratio=4, input_w=cfg.input_w,
                      dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: init_stereo_net(
        model, r, cfg.input_h, cfg.input_w, 50))(jax.random.PRNGKey(0))

    # Perturb every offset_mask conv so DCN offsets are non-zero (bias in
    # [-1.2, 1.2] pixels + small kernel noise => |offset| safely < radius 2,
    # where the windowed decomposition is exact).
    def perturb(path, leaf):
        name = "/".join(str(p) for p in path)
        if "offset_mask" in name:
            r = np.random.RandomState(abs(hash(name)) % (2 ** 31))
            if leaf.ndim == 1:           # bias (27,): offsets, not masks
                noise = r.uniform(-1.2, 1.2, leaf.shape)
                noise = noise.reshape(9, 3)
                noise[:, 2] = 0.0
                return leaf + jnp.asarray(noise.reshape(-1), leaf.dtype)
            return leaf + jnp.asarray(
                0.02 * r.randn(*leaf.shape), leaf.dtype)
        return leaf
    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    def fwd_full(v, b):
        out = model.apply(v, b, use_cost_volume=True, target=None,
                          train=False)
        return out

    if not args.skip_parity:
        outs = {}
        for mode in args.modes.split(","):
            deform_conv._DCN_MODE = mode
            t0 = time.time()
            out = jax.jit(fwd_full)(variables, batch)
            out = {k: np.asarray(v, np.float32) for k, v in out.items()}
            print(f"[parity] {mode}: ran in {time.time()-t0:.1f}s "
                  f"(compile+exec)", flush=True)
            outs[mode] = out
        ref_mode = args.modes.split(",")[-1]
        ok = True
        for k in outs[ref_mode]:
            a, b = None, None
            for mode in args.modes.split(",")[:-1]:
                a = outs[mode][k]
                b = outs[ref_mode][k]
                err = np.max(np.abs(a - b))
                scale = max(np.max(np.abs(b)), 1e-6)
                rel = err / scale
                status = "OK" if rel < 2e-2 else "FAIL"
                ok &= rel < 2e-2
                print(f"[parity] {mode} vs {ref_mode} {k}: max_abs={err:.4g}"
                      f" rel={rel:.4g} {status}", flush=True)
        print(f"[parity] overall: {'OK' if ok else 'FAIL'}", flush=True)

    if not args.skip_timing:
        mode = deform_conv._resolve_mode()
        print(f"[timing] DCN mode: {mode}", flush=True)

        def net_dec(v, b):
            out = model.apply(v, b, use_cost_volume=True, target=None,
                              train=False)
            return (out["hm"].astype(jnp.float32).sum() +
                    out["depth"].astype(jnp.float32).sum())

        def chained(v, b, n):
            def step(carry, _):
                bb = dict(b)
                bb["input"] = b["input"] + carry
                s = net_dec(v, bb)
                return (s * 1e-6).astype(b["input"].dtype), s
            _, ss = jax.lax.scan(step, jnp.zeros((), b["input"].dtype),
                                 None, length=n)
            return ss

        run = jax.jit(chained, static_argnames=("n",))
        n_small, n_big = 5, 25
        c_s = run.lower(variables, batch, n=n_small).compile()
        c_b = run.lower(variables, batch, n=n_big).compile()

        def t(c):
            t0 = time.perf_counter()
            float(jnp.sum(c(variables, batch)))
            return time.perf_counter() - t0

        t(c_s)
        ts = min(t(c_s) for _ in range(2))
        tb = min(t(c_b) for _ in range(2))
        per = (tb - ts) / (n_big - n_small)
        print(f"[timing] {mode} full model: {per*1e3:.2f} ms/iter "
              f"({B/per:.2f} pairs/s)  ts={ts:.3f} tb={tb:.3f}", flush=True)


if __name__ == "__main__":
    main()
