#!/usr/bin/env python
"""Time the backbone+heads (no cost volume) on TPU with a chosen DCN mode.

    SIDE_TPU_DCN=pallas python tools/dcn_bench2.py
Env: SIDE_TPU_DCN (exact|windowed|pallas), SIDE_TPU_DCN_RADIUS,
     SIDE_TPU_DCN_UNROLL (full|fori), BD_BATCH.
Round-1 reference points (batch 2, bf16): plain-conv 10.4 ms, exact-gather
DCN ~225 ms for this same fwd_nocv program.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from side_tpu.config import Config
    from side_tpu.models.stereo_net import StereoNet, init_stereo_net

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

    # ONE compiled program; the measurement loop chains dispatches through a
    # scalar carry (data-dependency-serial like the scan protocol, but the
    # scan versions compile the body n times slower with Pallas kernels)
    @jax.jit
    def step(v, b, carry):
        bb = dict(b)
        bb["input"] = b["input"] + carry
        out = model.apply(v, bb, use_cost_volume=False, train=False)
        s = out["hm"].astype(jnp.float32).sum()
        return (s * 1e-6).astype(b["input"].dtype)

    t0 = time.time()
    carry = step(variables, batch, jnp.zeros((), batch["input"].dtype))
    float(carry)
    print(f"compiled+first-run in {time.time()-t0:.0f}s", flush=True)

    def t(n):
        carry = jnp.zeros((), batch["input"].dtype)
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(variables, batch, carry)
        float(carry)
        return time.perf_counter() - t0

    n_small, n_big = 5, 25
    t(2)
    ts = min(t(n_small) for _ in range(2))
    tb = min(t(n_big) for _ in range(2))
    per = (tb - ts) / (n_big - n_small)
    mode = os.environ.get("SIDE_TPU_DCN", "exact")
    r = os.environ.get("SIDE_TPU_DCN_RADIUS", "2")
    u = os.environ.get("SIDE_TPU_DCN_UNROLL", "full")
    print(f"[dcn_bench2] mode={mode} r={r} unroll={u} batch={B}: "
          f"{per*1e3:.2f} ms/iter  ts={ts:.3f} tb={tb:.3f}", flush=True)


if __name__ == "__main__":
    main()
