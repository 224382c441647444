"""Fast (non-slow) trainer smoke: catches Trainer regressions in the
default `pytest -m "not slow"` run (VERDICT r2 weak #5 / next #10).

Uses a tiny stub model emitting the reference head spec from one conv so
the full DLA init (~25 s on CPU) is avoided; the heavyweight end-to-end
trainer tests remain in test_trainer.py behind @slow."""

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from side_tpu.config import Config
from side_tpu.runtime.trainer import Trainer

from test_trainer import _fake_batch, _ListLoader, H, W, K


class _StubNet(nn.Module):
    """Minimal stand-in with the stereo head spec + a BatchNorm (so the
    mutable batch_stats path is exercised) and a depth output."""
    heads: Dict[str, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, use_cost_volume=True, target=None,
                 train=False):
        x = jnp.concatenate([batch["input"], batch["input_right"]], axis=-1)
        x = nn.avg_pool(x, (4, 4), (4, 4))
        x = nn.Conv(8, (3, 3), padding=1, name="trunk")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        x = nn.relu(x)
        out = {}
        for name, ch in self.heads.items():
            out[name] = nn.Conv(ch, (1, 1), name=name)(x)
        if use_cost_volume:
            Kc = batch["ind"].shape[1]
            pooled = jnp.mean(x, axis=(1, 2))           # (B, 8)
            d = nn.Dense(Kc, name="depth_fc")(pooled)
            out["depth"] = (10.0 + d)[..., None]        # (B, K, 1)
        return out


def test_fast_train_step_smoke():
    cfg = Config(input_h=H, input_w=W, compute_dtype="float32", max_objs=K,
                 batch_size=8, lr=1e-3, print_iter=0, num_devices=0)
    model = _StubNet(heads=dict(cfg.heads))
    rng = np.random.RandomState(0)
    batch = _fake_batch(rng)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jbatch, train=False)
    trainer = Trainer(cfg, model, variables, steps_per_epoch=2)
    assert trainer.mesh.devices.size == 8

    loader = _ListLoader([batch] * 2)
    first = trainer.train(1, loader)
    second = trainer.train(1, loader)
    for k in ("loss", "hm_loss", "depth_loss"):
        assert np.isfinite(first[k]), k
    assert second["loss"] < first["loss"]
    v = trainer.val(1, _ListLoader([batch]))
    assert np.isfinite(v["loss"])
