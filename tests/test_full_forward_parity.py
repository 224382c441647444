"""Full-model forward golden parity (VERDICT r3 next #8).

Instantiates the REFERENCE stereo_network (stereo_network_old.py:261-396)
on torch CPU with its DCN layers stubbed to their documented zero-offset
behaviour (zero-init conv_offset_mask, dcn_v2.py:105-116: plain 3x3 conv
with each sampled tap modulated by sigmoid(0) = 0.5), randomises EVERY
weight and BN running stat, converts the full state dict with
tools/convert_reference_weights.py, and asserts end-to-end forward
agreement of all six heads, the GT-RoI cost-volume depth, and the
depth-bin hypotheses against our StereoNet in f32.

This catches wiring drift no stage-level test can: head sourcing
(left-only vs stereo-concat), feaRuduce placement, cost-volume
concat order (left / right / left-right), depth-bin order, soft-argmin
scatter alignment.

The torchvision RoIAlign (absent in this image) is replaced by an
independent vectorised NumPy implementation of the documented
aligned=False / sampling_ratio=2 semantics — the same contract our
ops/roi_align.py is separately validated against in
tests/test_roi_align.py::_numpy_oracle.
"""

import math
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.golden

REF_LIB = "/root/reference/src/lib"

H_IN, W_IN = 128, 384
K = 8  # GT slots


# --------------------------------------------------------------- stubs
def _roi_align_np(feat_nchw, rois, out_size=16, ratio=2):
    """torchvision RoIAlign(aligned=False, spatial_scale=1,
    sampling_ratio=2), vectorised: rois (N, 5) = [batch, x1, y1, x2, y2]."""
    N = rois.shape[0]
    B, C, H, W = feat_nchw.shape
    P = out_size
    if N == 0:
        return np.zeros((0, C, P, P), np.float32)
    b = rois[:, 0].astype(np.int64)
    x1, y1, x2, y2 = rois[:, 1], rois[:, 2], rois[:, 3], rois[:, 4]
    bw = np.maximum(x2 - x1, 1.0)[:, None] / P
    bh = np.maximum(y2 - y1, 1.0)[:, None] / P
    grid = (np.arange(P)[:, None] +
            (np.arange(ratio)[None, :] + 0.5) / ratio).reshape(-1)  # (P*r,)
    yy = y1[:, None] + bh * grid[None, :]                 # (N, P*r)
    xx = x1[:, None] + bw * grid[None, :]

    def axis_weights(coords, size):
        """(N, S) sample coords -> index/weight pairs with the border rule
        (outside [-1, size] contributes 0, else clamped)."""
        valid = (coords >= -1.0) & (coords <= size)
        c = np.clip(coords, 0.0, size - 1)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, size - 1)
        f = (c - lo) * valid
        return lo, hi, f, valid

    ylo, yhi, fy, vy = axis_weights(yy, H)
    xlo, xhi, fx, vx = axis_weights(xx, W)
    img = feat_nchw[b]                                    # (N, C, H, W)
    n_idx = np.arange(N)[:, None, None]
    out = np.zeros((N, C, P * ratio, P * ratio), np.float64)
    for wy, yi in (((1 - fy) * vy, ylo), (fy * vy, yhi)):
        for wx, xi in (((1 - fx) * vx, xlo), (fx * vx, xhi)):
            g = img[n_idx, :, yi[:, :, None], xi[:, None, :]]
            # fancy indexing puts the (S, S) axes first: (N, S, S, C)
            w = (wy[:, :, None] * wx[:, None, :] *
                 (vy[:, :, None] & vx[:, None, :]))
            out += (g * w[..., None]).transpose(0, 3, 1, 2)
    # average the ratio x ratio samples per bin
    out = out.reshape(N, C, P, ratio, P, ratio).mean(axis=(3, 5))
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def ref_model_cls():
    """Reference stereo_network with DCN + RoIAlign stubs installed."""
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.cuda.FloatTensor = torch.FloatTensor
    torch.Tensor.cuda = lambda self, *a, **k: self

    class DCN(nn.Module):
        """dcn_v2.DCN parameter layout; forward = zero-offset DCN: each
        3x3 tap sample modulated by the mask then contracted with the
        weights (general in the mask, exact for zero offsets)."""

        def __init__(self, chi, cho, kernel_size, stride=1, padding=1,
                     dilation=1, deformable_groups=1):
            super().__init__()
            ks = kernel_size if isinstance(kernel_size, tuple) \
                else (kernel_size, kernel_size)
            self.weight = nn.Parameter(torch.empty(cho, chi, *ks))
            self.bias = nn.Parameter(torch.zeros(cho))
            nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
            self.conv_offset_mask = nn.Conv2d(
                chi, deformable_groups * 27, ks, stride=stride,
                padding=padding, bias=True)
            self.conv_offset_mask.weight.data.zero_()
            self.conv_offset_mask.bias.data.zero_()

        def forward(self, x):
            om = self.conv_offset_mask(x)
            o = om[:, :18]
            assert float(o.abs().max()) == 0.0, \
                "stub only valid at zero offsets"
            mask = torch.sigmoid(om[:, 18:])          # (B, 9, H, W)
            B, C, H, W = x.shape
            cols = F.unfold(x, 3, padding=1).view(B, C, 9, H * W)
            cols = cols * mask.view(B, 1, 9, H * W)
            w = self.weight.view(self.weight.shape[0], -1)  # (O, C*9)
            out = torch.einsum("oi,biL->boL", w, cols.reshape(B, C * 9,
                                                              H * W))
            return out.view(B, -1, H, W) + self.bias[None, :, None, None]

    class RoIAlign(nn.Module):
        def __init__(self, out_size, spatial_scale=1, sampling_ratio=2):
            super().__init__()
            self.out = out_size[0] if isinstance(out_size, tuple) \
                else out_size
            self.ratio = sampling_ratio

        def forward(self, feat, rois):
            out = _roi_align_np(feat.detach().numpy(),
                                rois.detach().numpy(), self.out, self.ratio)
            return torch.from_numpy(out)

    pkg = types.ModuleType("models.networks.DCNv2")
    mod = types.ModuleType("models.networks.DCNv2.dcn_v2")
    mod.DCN = DCN
    sys.modules["models.networks.DCNv2"] = pkg
    sys.modules["models.networks.DCNv2.dcn_v2"] = mod
    tv = types.ModuleType("torchvision")
    tvo = types.ModuleType("torchvision.ops")
    tvo.RoIAlign = RoIAlign
    tvo.RoIPool = type("RoIPool", (), {"__init__":
                                       lambda self, *a, **k: None})
    tv.ops = tvo
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tvo

    from models.networks import feature_extraction_dla34 as ref_dla
    ref_dla.DLA.load_pretrained_model = lambda self, *a, **k: None
    from models.networks import stereo_network_old as ref_net
    return ref_net


def test_full_forward_parity(ref_model_cls, fixture_root):
    import torch
    import jax
    import jax.numpy as jnp
    from side_tpu.config import Config
    from side_tpu.data.dataset import StereoKitti
    from side_tpu.models.stereo_net import StereoNet
    from side_tpu.ops.decode import boxes_from_targets
    sys.path.insert(0, "tools")
    import convert_reference_weights as CRW

    heads = {"hm": 3, "wh": 3, "reg": 3, "dim": 3, "orien": 2,
             "kept_type": 6 * 28}
    tmodel = ref_model_cls.get_pose_net(34, heads, head_conv=256)
    tmodel.eval()

    # randomise every trainable weight and BN stat so the comparison
    # exercises real values (keep conv_offset_mask zero: stub contract)
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "conv_offset_mask" in name:
                continue
            p.copy_(0.1 * torch.randn(p.shape, generator=gen))
        for name, buf in tmodel.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=gen))
            elif name.endswith("running_var"):
                buf.copy_(1 + 0.3 * torch.rand(buf.shape, generator=gen))

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()
             if hasattr(v, "numpy")}
    params, stats = CRW.convert_full(state)

    # ---- fixture batch (host float path so both sides see identical data)
    cfg = Config(data_dir=fixture_root, input_h=H_IN, input_w=W_IN,
                 aug_ddd=0.0, no_color_aug=True, flip_train=False,
                 keep_res=False, uint8_images=False)
    ds = StereoKitti(cfg, "train")
    s = ds[0]
    n_obj = int(s["rot_mask"].sum())
    assert n_obj >= 1

    def np32(x):
        return np.asarray(x, np.float32)

    batch_np = {k: np32(s[k])[None] for k in
                ("input", "input_right", "fb", "p2", "p3", "trans",
                 "trans_inv", "ind_float", "wh", "reg")}
    batch_np["fb"] = batch_np["fb"].reshape(1)

    # GT RoIs from the shared slot tensors (stereoTrainer.py:40-61)
    bbox, bbox_right, valid = jax.device_get(boxes_from_targets(
        jnp.asarray(batch_np["ind_float"][:, :K]),
        jnp.asarray(batch_np["wh"][:, :K]),
        jnp.asarray(batch_np["reg"][:, :K]), cfg.output_w, 1.0))
    keep = np.asarray(valid[0])
    ref_rois = np.concatenate(
        [np.zeros((keep.sum(), 1), np.float32), bbox[0][keep]], axis=1)
    ref_rois_r = np.concatenate(
        [np.zeros((keep.sum(), 1), np.float32), bbox_right[0][keep]],
        axis=1)

    tbatch = {
        "input": torch.from_numpy(
            batch_np["input"].transpose(0, 3, 1, 2).copy()),
        "input_right": torch.from_numpy(
            batch_np["input_right"].transpose(0, 3, 1, 2).copy()),
        "fb": torch.from_numpy(batch_np["fb"]),
        "p2": torch.from_numpy(batch_np["p2"]),
        "p3": torch.from_numpy(batch_np["p3"]),
        "trans": torch.from_numpy(batch_np["trans"]),
        "trans_inv": torch.from_numpy(batch_np["trans_inv"]),
    }
    with torch.no_grad():
        [want] = tmodel(tbatch, useCostVolume=True,
                        target=(torch.from_numpy(ref_rois),
                                torch.from_numpy(ref_rois_r),
                                (1, K, 5)))

    model = StereoNet(heads=heads, roi_size=16, max_objs=K, topk=K,
                      down_ratio=4, input_w=W_IN, dtype=jnp.float32)
    target = (jnp.asarray(bbox), jnp.asarray(bbox_right), jnp.asarray(valid))
    got = jax.jit(
        lambda v, b: model.apply(v, b, use_cost_volume=True, target=target,
                                 train=False)
    )({"params": params, "batch_stats": stats},
      {k: jnp.asarray(v) for k, v in batch_np.items()})

    for name in heads:
        g = np.asarray(got[name]).transpose(0, 3, 1, 2)
        w = want[name].numpy()
        assert g.shape == w.shape, name
        scale = max(1.0, np.abs(w).max())
        np.testing.assert_allclose(g, w, atol=2e-3 * scale,
                                   err_msg=f"head '{name}'")

    # cost-volume instance depth: reference scatters kept rows in slot
    # order (stereo_network_old.py:378-383); ours keeps slot alignment
    w_depth = want["depth"].numpy()[0, :, 0]
    g_depth = np.asarray(got["depth"])[0, :, 0]
    np.testing.assert_allclose(g_depth[keep], w_depth[:keep.sum()],
                               atol=5e-2, err_msg="cost-volume depth")
    assert np.all(g_depth[~keep] == 0.0)
