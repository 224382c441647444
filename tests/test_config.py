"""Config.cli must mirror the reference's flag surface (opts.py parity)."""

import pytest

from side_tpu.config import Config


def test_defaults_match_reference_recipe():
    cfg = Config.cli(["stereo"])
    assert cfg.task == "stereo"
    assert cfg.lr == 2.5e-4
    assert cfg.lr_step == (45, 60)
    assert cfg.K == 100
    assert cfg.peak_thresh == 0.2
    assert cfg.aug_ddd == 0.35
    assert cfg.shift == 0.1 and cfg.scale == 0.4
    assert cfg.grid == 28
    assert cfg.cost_volume and cfg.reg_bbox and cfg.reg_offset
    assert cfg.head_conv == 256  # dla default
    assert cfg.kitti_split == "3dop"


def test_heads_spec():
    cfg = Config.cli(["stereo"])
    assert cfg.heads == {"hm": 3, "dim": 3, "orien": 2,
                         "kept_type": 6 * 28, "wh": 3, "reg": 3}
    cfg2 = Config.cli(["stereo", "--not_reg_bbox", "--not_reg_offset"])
    assert "wh" not in cfg2.heads and "reg" not in cfg2.heads


def test_negation_flags():
    cfg = Config.cli(["stereo", "--not_cost_volume", "--uncert",
                      "--wh_scale", "1.5"])
    assert not cfg.cost_volume
    assert cfg.uncert
    assert cfg.wh_scale == 1.5


def test_loss_weight_vector_order():
    cfg = Config.cli(["stereo", "--hm_weight", "2", "--depth_weight", "3"])
    # [hm, wh, off, depth, dim, orien, kept] (opts.py:291-292)
    assert cfg.loss_weight == (2.0, 1.0, 1.0, 3.0, 1.0, 1.0, 1.0)


def test_resolution_and_derived():
    cfg = Config.cli(["stereo", "--input_h", "256", "--input_w", "512"])
    assert (cfg.output_h, cfg.output_w) == (64, 128)
    cfg2 = Config.cli(["stereo", "--input_res", "384"])
    assert cfg2.input_h == 384 and cfg2.input_w == 384
    # head_conv default for non-dla arch
    cfg3 = Config.cli(["stereo", "--arch", "res_18"])
    assert cfg3.head_conv == 64


def test_trainval_disables_val_intervals():
    cfg = Config.cli(["stereo", "--trainval"])
    assert cfg.val_intervals >= 10 ** 8


def test_depth_variant_choices():
    cfg = Config.cli(["stereo", "--depth_variant", "voxel"])
    assert cfg.depth_variant == "voxel"
    with pytest.raises(SystemExit):
        Config.cli(["stereo", "--depth_variant", "bogus"])


def test_reference_exact_preset():
    """--reference_exact flips every individually-flagged default
    deviation back to reference semantics in one switch (VERDICT r3
    weak #3: flag drift protection)."""
    from side_tpu.config import Config
    c = Config.cli(["stereo", "--reference_exact"])
    assert c.depth_aux_weight == 0.0
    assert c.cv_topk == 0
    assert c.align_topk == 0
    assert c.uint8_images is False
    d = Config.cli(["stereo"])   # the TPU-first defaults stay on without it
    assert d.depth_aux_weight > 0 and d.cv_topk > 0 and d.align_topk > 0
    assert d.uint8_images is True
