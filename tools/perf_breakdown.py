#!/usr/bin/env python
"""TPU time breakdown: full model vs no-cost-volume vs plain-conv backbone.

Uses the fetch-synced two-length scan timing (see bench.py — on this
infrastructure only host fetches synchronise).  Each variant costs one
remote compile (~minutes); run in the background.

    python tools/perf_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed_variant(name, fn, variables, batch, n_small=5, n_big=25):
    import jax
    import jax.numpy as jnp

    def chained(variables, batch, n):
        def step(carry, _):
            b = dict(batch)
            b["input"] = batch["input"] + carry
            out = fn(variables, b)
            return (out * 1e-6).astype(batch["input"].dtype), out
        _, outs = jax.lax.scan(step, jnp.zeros((), batch["input"].dtype),
                               None, length=n)
        return outs

    run = jax.jit(chained, static_argnames=("n",))
    c_s = run.lower(variables, batch, n=n_small).compile()
    c_b = run.lower(variables, batch, n=n_big).compile()

    def t(c):
        t0 = time.perf_counter()
        float(jnp.sum(c(variables, batch)))
        return time.perf_counter() - t0

    t(c_s)  # absorb cold transfer
    ts = min(t(c_s) for _ in range(2))
    tb = min(t(c_b) for _ in range(2))
    per_iter = (tb - ts) / (n_big - n_small)
    print(f"{name}: {per_iter * 1e3:.2f} ms/iter  (ts={ts:.3f} tb={tb:.3f})",
          flush=True)
    return per_iter


def main():
    import jax
    import jax.numpy as jnp
    from side_tpu.config import Config
    from side_tpu.models.stereo_net import StereoNet, init_stereo_net
    from side_tpu.ops import deform_conv

    B = int(os.environ.get("BD_BATCH", "2"))
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

    def fwd_full(v, b):
        out = model.apply(v, b, use_cost_volume=True, target=None,
                          train=False)
        return out["hm"].astype(jnp.float32).sum() + out["depth"].sum()

    def fwd_nocv(v, b):
        out = model.apply(v, b, use_cost_volume=False, train=False)
        return out["hm"].astype(jnp.float32).sum()

    t_full = timed_variant("full (backbone+heads+costvol+depth)", fwd_full,
                           variables, batch)
    t_nocv = timed_variant("no cost volume (backbone+heads)", fwd_nocv,
                           variables, batch)

    # plain-conv stand-in for every DCN: quantifies the gather overhead
    orig = deform_conv.deform_conv2d

    def plain_dcn(x, offset, mask, weight, bias=None, stride=1, padding=1,
                  dilation=1):
        return deform_conv.plain_conv2d(x, weight, bias, stride, padding,
                                        dilation)

    deform_conv.deform_conv2d = plain_dcn
    import side_tpu.models.dla as dla_mod
    dla_mod.deform_conv2d = plain_dcn
    try:
        t_plain = timed_variant("no cost volume, plain conv (no DCN gather)",
                                fwd_nocv, variables, batch)
    finally:
        deform_conv.deform_conv2d = orig
        dla_mod.deform_conv2d = orig

    print(f"\ncost volume path: {(t_full - t_nocv) * 1e3:.2f} ms/iter")
    print(f"DCN gather overhead: {(t_nocv - t_plain) * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
