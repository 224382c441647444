"""Multi-host SPMD: 2-process CPU cluster through the real mesh helpers.

Validates the `--distributed` wiring (parallel/mesh.py: init_distributed +
process-local shard_batch): two OS processes each holding half the global
batch must compute identical global reductions — the CPU stand-in for a
multi-host TPU pod (SURVEY.md §2.3).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from side_tpu.parallel.mesh import (init_distributed, make_mesh, replicate,
                                    shard_batch)

pid, port = int(sys.argv[1]), sys.argv[2]
init_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
mesh = make_mesh()
assert mesh.devices.size == 4, mesh.devices

# each host contributes 2 rows of the global batch of 4
x = np.full((2, 3), float(pid + 1), np.float32)
batch = shard_batch({"x": x}, mesh)
assert batch["x"].shape == (4, 3)
w = replicate(jnp.ones((3,), jnp.float32), mesh)

@jax.jit
def step(w, b):
    return jnp.mean(jnp.sum(b["x"] * w, axis=1))

val = float(step(w, batch))          # mean over [3,3,6,6] = 4.5
assert abs(val - 4.5) < 1e-6, val
print(f"proc{pid} OK {val}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_cluster():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(i), str(port)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK 4.5" in out, out
