"""Model factory (reference: /root/reference/src/lib/models/model.py:16-28).

Arch strings follow the reference convention '<family>_<num_layers>':
    dla_34    — DLA-34 + DCN + cost volume (the flagship, stereo_network)
    resdcn_N  — ResNet-N + DCN deconv stereo backbone (stereo_resnet_dcn)
    dlav0_34  — vanilla-DLA CenterNet pose net (monocular legacy)
    res_N     — MSRA ResNet pose net (monocular legacy)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..config import Config
from .stereo_net import StereoNet


def create_model(cfg: Config):
    """Build the model definition for cfg.arch."""
    family = cfg.arch.split("_")[0]
    num_layers = int(cfg.arch.split("_")[1]) if "_" in cfg.arch else 0
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if family == "dla":
        if cfg.depth_variant == "voxel":
            from .voxel_net import StereoVoxelNet
            return StereoVoxelNet(heads=dict(cfg.heads),
                                  max_objs=cfg.max_objs, topk=cfg.K,
                                  down_ratio=cfg.down_ratio,
                                  input_w=cfg.input_w, input_h=cfg.input_h,
                                  dtype=dtype)
        return StereoNet(heads=dict(cfg.heads), roi_size=cfg.roi_size,
                         max_objs=cfg.max_objs, topk=cfg.K,
                         down_ratio=cfg.down_ratio, input_w=cfg.input_w,
                         wh_scale=cfg.wh_scale, dtype=dtype,
                         remat=cfg.remat, cv_topk=cfg.cv_topk)
    if family == "resdcn":
        from .resnet_dcn import StereoResNet
        return StereoResNet(heads=dict(cfg.heads), num_layers=num_layers,
                            head_conv=cfg.head_conv, dtype=dtype)
    if family == "dlaseg":
        from .dla_seg import StereoDLASeg
        return StereoDLASeg(heads=dict(cfg.heads),
                            down_ratio=cfg.down_ratio, dtype=dtype)
    if family == "res":
        from .legacy import MonoResNet
        return MonoResNet(heads=dict(cfg.heads), num_layers=num_layers,
                          head_conv=cfg.head_conv, dtype=dtype)
    if family == "dlav0":
        from .legacy import MonoDLA
        return MonoDLA(heads=dict(cfg.heads), head_conv=cfg.head_conv,
                       down_ratio=cfg.down_ratio, dtype=dtype)
    raise ValueError(f"unknown arch {cfg.arch!r}")
