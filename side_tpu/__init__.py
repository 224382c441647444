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
