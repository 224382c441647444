"""side_tpu — a TPU-native stereo 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SIDE
("Center-based Stereo 3D Detector with Structure-aware Instance Depth
Estimation", WACV 2022; reference implementation studied at
/root/reference).  Nothing in here is a port: the compute path is built
for TPU (static shapes, masked decode, fused gather kernels, SPMD data
parallelism over a `jax.sharding.Mesh`), and the host path is a plain
NumPy/OpenCV pipeline feeding fixed-shape batches.

Layout:
    side_tpu.config       flat experiment config (reference: src/lib/opts.py)
    side_tpu.data         KITTI parsing, targets, loader (src/lib/modules/stereoDataset.py)
    side_tpu.ops          decode / losses / deformable conv / RoIAlign kernels
    side_tpu.models       DLA-34 backbone, heads, stereo cost-volume network
    side_tpu.postprocess  box solver, dense alignment, KITTI output
    side_tpu.runtime      trainer, detector, checkpointing, logging
    side_tpu.parallel     mesh + sharding helpers
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_cache() -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    The Mosaic DCN kernels take minutes to compile at the big DLA shapes
    (the factored d_coord measured 349 s); with the cache every process
    after the first reuses the compiled executables, so benches, tests and
    training restarts skip straight to steady state.  Opt out with
    SIDE_TPU_XLA_CACHE=0; relocate with SIDE_TPU_XLA_CACHE=<dir>."""
    want = _os.environ.get("SIDE_TPU_XLA_CACHE", "1")
    if want == "0":
        return
    if want == "1":
        cache_dir = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".xla_cache")
    else:
        cache_dir = want
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass    # never let cache setup break an import


_enable_persistent_cache()
