"""DLA-34 backbone with deformable-conv aggregation upsampling, NHWC Flax.

Structure matches the reference trunk
(/root/reference/src/lib/models/networks/feature_extraction_dla34.py):
DLA-34 levels [1,1,1,2,2,1] x channels [16,32,64,128,256,512] built from
BasicBlocks and recursive Trees (:168-315), iterative deep aggregation
DLAUp/IDAUp (:360-413) whose project/node convs are DCNv2 deformable convs
(:345-357), and a final IDAUp fusing strides 4/8/16 into a 64-channel
1/4-resolution map (:427-453).

TPU-first choices: NHWC layout, bf16-friendly compute dtype, the deformable
conv as a gather+MXU `dot_general` (side_tpu.ops.deform_conv), and the
learnable depthwise transpose-conv upsampler expressed as an input-dilated
grouped convolution.
"""

from __future__ import annotations

import math
import os as _os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deform_conv import deform_conv2d_om

# torch BN defaults used by the reference (momentum 0.1 -> flax 0.9)
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# kaiming-uniform(a=sqrt(5)) equivalent — torch Conv2d default init
conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# msra fill used by the reference's hand-initialised conv stacks
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class FoldedBatchNorm(nn.Module):
    """Drop-in BatchNorm (identical param/batch_stats tree and statistics
    semantics to flax nn.BatchNorm: f32 biased batch variance clipped at 0,
    running stats blended with `momentum`) whose normalisation applies as
    ONE fused multiply-add in the compute dtype.

    flax's `_normalize` computes `x - mean` with mean promoted to f32, so
    the whole elementwise chain (and its VJP) runs at f32 width even under
    bf16 compute — at the full-res DLA stem this doubled elementwise
    bandwidth and forced bf16<->f32 layout copies between the convs and the
    BN chain (the three stem ConvBNs alone carried ~30 ms of the 284 ms
    batch-2 train step, tools/train_profile.py round 4).  Here the affine
    is folded per channel in f32 — a = scale*rsqrt(var+eps),
    b = bias - mean*a — and only the C-sized a/b are cast, so the (H,W)-
    sized apply y = x*a + b stays in the activation dtype end to end."""
    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Any = jnp.float32
    # >1: the channel axis is phase-packed as (phase, C) — lane p*C + c is
    # spatial phase p of original channel c (space-to-depth stem, see
    # DLA.__call__).  Params/stats stay (C,) and the statistics are EXACTLY
    # the full-resolution ones: every full-res position appears in exactly
    # one phase, so the per-c moments pooled over (batch, H', W', phase)
    # equal the full-res moments over (batch, H, W).
    phases: int = 1

    @nn.compact
    def __call__(self, x):
        P = self.phases
        C = x.shape[-1] // P
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # f32 reductions over the batch axes (XLA fuses the convert
            # into the reduce); under pjit the sharded-batch mean inserts
            # the cross-device collective automatically (sync-BN)
            xf = x.astype(jnp.float32)
            if P > 1:
                xf = xf.reshape(*x.shape[:-1], P, C)
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        if P > 1:
            a, b = jnp.tile(a, P), jnp.tile(b, P)   # lane p*C+c -> a[c]
        dt = jnp.dtype(self.dtype)
        if dt == jnp.float32:
            return x * a + b
        # The FMA itself must run in f32: b (= bias - mean*a) is large when
        # |mean| >> std, and a dt-precision product x*a rounds at magnitude
        # |b|, injecting absolute error ~|b|*2^-9 into the O(1) normalised
        # output (ADVICE r4).  Keeping a/b f32 promotes the fused
        # multiply-add to f32 with ONE final round to dt — still a single
        # FMA (vs flax _normalize's 4-op chain) and XLA fuses the converts,
        # so no f32 intermediates are materialised.  Parity-tested against
        # nn.BatchNorm at bf16 with large-mean/small-var inputs
        # (tests/test_model.py::test_folded_bn_bf16_large_mean_parity).
        return (x.astype(jnp.float32) * a + b).astype(dt)


def _space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel (py*2+px)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _depth_to_space(x):
    """Inverse of _space_to_depth."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 2, W * 2, C)


def _s2d_entries(K: int, stride: int):
    """Static scatter indices mapping a full-res KxK kernel into its
    space-to-depth equivalent (see DLA.__call__ s2d stem).

    stride 1: out phase (pi,pj) at full-res (2i+pi, 2j+pj); input s2d
    channel (py,px,c) at s2d (i+q, j+r) is full-res (2(i+q)+py, 2(j+r)+px),
    so kernel tap u = 2q + py - pi (|u| <= K//2) -> q = (u+pi-py)/2; every
    (u, pi) pair has exactly one (q, py).  Returns (S, pad, idx arrays).

    stride 2 (K odd, pad K//2): out (i,j) at full-res (2i, 2j); tap offset
    o = u - K//2 = 2q + py -> q = o//2, py = o - 2q; q in [o_min//2, o_max//2]
    with asymmetric s2d padding (-q_min, q_max)."""
    k2 = K // 2
    qs, rs, pin_, pout, us, vs = [], [], [], [], [], []
    if stride == 1:
        Q = (k2 + 1) // 2
        for pi in range(2):
            for pj in range(2):
                for u in range(-k2, k2 + 1):
                    for v in range(-k2, k2 + 1):
                        py = (u + pi) % 2
                        px = (v + pj) % 2
                        qs.append((u + pi - py) // 2 + Q)
                        rs.append((v + pj - px) // 2 + Q)
                        pin_.append(py * 2 + px)
                        pout.append(pi * 2 + pj)
                        us.append(u + k2)
                        vs.append(v + k2)
        S, pad = 2 * Q + 1, ((Q, Q), (Q, Q))
    else:
        qmin, qmax = (-k2) // 2, k2 // 2
        for u in range(-k2, k2 + 1):
            for v in range(-k2, k2 + 1):
                qs.append(u // 2 - qmin)
                rs.append(v // 2 - qmin)
                pin_.append((u - 2 * (u // 2)) * 2 + (v - 2 * (v // 2)))
                pout.append(0)
                us.append(u + k2)
                vs.append(v + k2)
        S, pad = qmax - qmin + 1, ((-qmin, qmax), (-qmin, qmax))
    arr = tuple(np.asarray(a) for a in (qs, rs, pin_, pout, us, vs))
    return S, pad, arr


def _s2d_kernel(w, stride: int, pout: int):
    """Expand (K, K, Cin, Cout) full-res weights into the space-to-depth
    kernel (S, S, 4*Cin, pout*Cout); linear in w, built by ONE static
    scatter so the VJP is a gather."""
    K, _, Cin, Cout = w.shape
    S, pad, (qs, rs, pin_, po, us, vs) = _s2d_entries(K, stride)
    k6 = jnp.zeros((S, S, 4, Cin, pout, Cout), w.dtype)
    k6 = k6.at[qs, rs, pin_, :, po, :].set(w[us, vs])
    return k6.reshape(S, S, 4 * Cin, pout * Cout), pad


class ConvBN(nn.Module):
    """conv (no bias) + BN + optional ReLU.

    `s2d_in`/`s2d_out` run the SAME convolution on a space-to-depth
    (half-res, 4x-channel) activation layout — parameters, shapes and
    math are unchanged (kernel expanded via _s2d_kernel; BN statistics
    phase-grouped), only the on-device layout differs.  Used by the DLA
    stem where full-res C=16 maps otherwise force XLA into spatially-
    reblocked layouts with ~25 ms/step of relayout copies (round-5
    train profile)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 s2d_in: bool = False, s2d_out: bool = False):
        if s2d_in:
            assert self.dilation == 1
            cin = x.shape[-1] // 4
            w = self.param2("Conv_0", "kernel",
                            (self.kernel, self.kernel, cin, self.features))
            if self.stride == 1:
                assert s2d_out
                kern, pad = _s2d_kernel(w, 1, 4)
            else:
                assert self.stride == 2 and not s2d_out
                kern, pad = _s2d_kernel(w, 2, 1)
            dt = jnp.dtype(self.dtype)
            x = jax.lax.conv_general_dilated(
                x.astype(dt), kern.astype(dt), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            pad = self.dilation * (self.kernel - 1) // 2
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=pad,
                        kernel_dilation=self.dilation, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype)(x)
        # BN statistics stay f32; the folded apply runs in the compute
        # dtype (name pinned so the param tree matches nn.BatchNorm)
        x = FoldedBatchNorm(use_running_average=not train,
                            dtype=self.dtype, name="BatchNorm_0",
                            phases=4 if (s2d_in and self.stride == 1) else 1
                            )(x)
        return nn.relu(x) if self.relu else x

    def param2(self, mod: str, name: str, shape):
        """Declare `mod/name` (the path nn.Conv would use) directly, so the
        s2d apply shares the identical parameter tree with the plain one."""
        holder = _ConvKernel(shape, name=mod)
        return holder()


class _ConvKernel(nn.Module):
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_init, self.shape, jnp.float32)


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual (feature_extraction_dla34.py:31-59)."""
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBN(self.features, 3, self.stride, self.dilation,
                     dtype=self.dtype)(x, train)
        out = ConvBN(self.features, 3, 1, self.dilation, relu=False,
                     dtype=self.dtype)(out, train)
        return nn.relu(out + residual.astype(out.dtype))


class Root(nn.Module):
    """1x1 fuse of tree children (feature_extraction_dla34.py:147-165)."""
    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.features, 1, relu=False, dtype=self.dtype)(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x).astype(self.dtype)


class Tree(nn.Module):
    """Recursive deep-aggregation tree (feature_extraction_dla34.py:168-221)."""
    levels: int
    in_features: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    dilation: int = 1
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim or 2 * self.features
        if self.level_root:
            root_dim += self.in_features
        children = [] if children is None else list(children)

        bottom = nn.max_pool(x, (self.stride, self.stride),
                             (self.stride, self.stride)) \
            if self.stride > 1 else x
        if self.in_features != self.features:
            residual = ConvBN(self.features, 1, relu=False,
                              dtype=self.dtype)(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.features, self.stride, self.dilation,
                            dtype=self.dtype)(x, residual, train)
            x2 = BasicBlock(self.features, 1, self.dilation,
                            dtype=self.dtype)(x1, train=train)
            return Root(self.features, self.root_residual,
                        dtype=self.dtype)([x2, x1] + children, train)

        x1 = Tree(self.levels - 1, self.in_features, self.features,
                  self.stride, dilation=self.dilation,
                  root_residual=self.root_residual,
                  dtype=self.dtype)(x, residual, train=train)
        children.append(x1)
        return Tree(self.levels - 1, self.features, self.features,
                    root_dim=root_dim + self.features,
                    dilation=self.dilation,
                    root_residual=self.root_residual,
                    dtype=self.dtype)(x1, children=children, train=train)


class DLA(nn.Module):
    """Six-level DLA trunk returning every level's features
    (feature_extraction_dla34.py:224-292)."""
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    residual_root: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        ch = self.channels
        # Space-to-depth stem (default): the three full-res stages run on a
        # (H/2, W/2, 4C) phase-packed layout — mathematically identical
        # (kernels expanded from the SAME parameters via _s2d_kernel, BN
        # statistics phase-grouped), but C=12/64 lanes instead of C=3/16,
        # which stops XLA spatially reblocking the convs and relayout-
        # copying between every op (58.8 -> ~6 ms/step of the 264 ms
        # batch-2 train step, round-5 profile).  Exactness vs the plain
        # stem is asserted by tests/test_model.py::test_s2d_stem_parity.
        # Stem layout policy (SIDE_TPU_STEM): "s2d" (default) = the packed
        # stem at EVAL only; training keeps the plain stem.  The two are
        # exactly equal math (parity test), so train-plain/eval-s2d is
        # consistent — and the batch-2 TRAIN program with the s2d kernel
        # expansion + its VJP pushes this image's relay compile helper
        # past its memory budget (SIGKILL; round-5 bisection — even with
        # the fori-row d_coord body), while the inference program
        # compiles fine and gains +17% (52.0 -> 60.7 pairs/s).
        # "s2d_always" opts training in on relays with more compile
        # headroom; "plain" disables it everywhere.
        _stem = _os.environ.get("SIDE_TPU_STEM", "s2d")
        s2d = (_stem in ("s2d", "s2d_always")
               and (not train or _stem == "s2d_always")
               and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
               and self.levels[0] == 1 and self.levels[1] == 1)
        if s2d:
            y = _space_to_depth(x)
            y = ConvBN(ch[0], 7, 1, dtype=self.dtype)(
                y, train, s2d_in=True, s2d_out=True)
            y = ConvBN(ch[0], 3, 1, dtype=self.dtype)(
                y, train, s2d_in=True, s2d_out=True)
            # level0 at full res is dead for down_ratio >= 2 (XLA DCEs it)
            outs = [_depth_to_space(y)]
            y = ConvBN(ch[1], 3, 2, dtype=self.dtype)(y, train, s2d_in=True)
            outs.append(y)
        else:
            x = ConvBN(ch[0], 7, 1, dtype=self.dtype)(x, train)
            outs = []
            # level0/level1: plain conv stages
            y = x
            for _ in range(self.levels[0]):
                y = ConvBN(ch[0], 3, 1, dtype=self.dtype)(y, train)
            outs.append(y)
            for i in range(self.levels[1]):
                y = ConvBN(ch[1], 3, 2 if i == 0 else 1,
                           dtype=self.dtype)(y, train)
            outs.append(y)
        # level2..5: trees
        y = Tree(self.levels[2], ch[1], ch[2], 2, level_root=False,
                 root_residual=self.residual_root, dtype=self.dtype)(
                     y, train=train)
        outs.append(y)
        for lvl, (n, c_in, c_out) in enumerate(
                [(self.levels[3], ch[2], ch[3]),
                 (self.levels[4], ch[3], ch[4]),
                 (self.levels[5], ch[4], ch[5])]):
            y = Tree(n, c_in, c_out, 2, level_root=True,
                     root_residual=self.residual_root, dtype=self.dtype)(
                         y, train=train)
            outs.append(y)
        return outs


def _bilinear_kernel(factor: int) -> np.ndarray:
    """Bilinear interpolation kernel of size 2f x 2f
    (feature_extraction_dla34.py:333-342)."""
    size = 2 * factor
    f = math.ceil(size / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    r = np.arange(size)
    k1 = 1 - np.abs(r / f - c)
    return np.outer(k1, k1).astype(np.float32)


class BilinearUp(nn.Module):
    """Learnable depthwise transpose-conv upsampler, bilinear-initialised.

    Torch ConvTranspose2d(o, o, 2f, stride=f, pad=f//2, groups=o) expressed
    as an input-dilated depthwise convolution (exactly equivalent)."""
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        if f == 1:
            return x
        C = x.shape[-1]
        k = 2 * f

        def init(key, shape, dtype=jnp.float32):
            kern = _bilinear_kernel(f)
            return jnp.asarray(kern[:, :, None, None] *
                               np.ones((1, 1, 1, shape[-1])), dtype)

        w = self.param("kernel", init, (k, k, 1, C))
        # transpose conv == lhs-dilated conv with the spatially flipped
        # kernel.  No preferred_element_type: its VJP builds a mixed-dtype
        # conv (f32 cotangent x bf16 kernel) which lax rejects; the TPU MXU
        # accumulates in f32 internally either way.
        pad = k - 1 - f // 2
        out = jax.lax.conv_general_dilated(
            x, jnp.flip(w, (0, 1)).astype(x.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return out.astype(x.dtype)


class _OffsetMaskParams(nn.Module):
    """Parameter holder for the 27-channel offset/mask conv.

    Same leaf names (offset_mask/kernel, offset_mask/bias) as the nn.Conv
    it replaces — checkpoints and the reference weight converter are
    unaffected.  Exposing the raw parameters lets the inference path fuse
    the conv into the packed Pallas DCN program
    (ops/deform_conv.deform_conv2d_om)."""
    cin: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.zeros,
                       (3, 3, self.cin, 27), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (27,), jnp.float32)
        return k, b


class DeformBlock(nn.Module):
    """DCNv2 3x3 + BN + ReLU (feature_extraction_dla34.py:345-357).

    The offset/mask conv is zero-initialised so the block starts as a plain
    conv with 0.5 modulation (dcn_v2.py:105-116).  Channel order of the 27
    outputs: per-tap interleaved [dy_k, dx_k, mask_logit_k]."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, Cin = x.shape
        w_om, b_om = _OffsetMaskParams(Cin, name="offset_mask")()
        w = self.param("kernel", conv_init, (3, 3, Cin, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        y = deform_conv2d_om(x, w_om, b_om, w, b, train=train)
        y = FoldedBatchNorm(use_running_average=not train,
                            dtype=x.dtype, name="BatchNorm_0")(y)
        return nn.relu(y)


class IDAUp(nn.Module):
    """Iterative deep aggregation step (feature_extraction_dla34.py:360-386):
    project each finer-level input to `features` channels (deformable),
    upsample, and fuse with the previous level through a deformable node."""
    features: int
    up_factors: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int,
                 train: bool = False) -> List[jnp.ndarray]:
        layers = list(layers)
        for i in range(startp + 1, endp):
            j = i - startp
            x = DeformBlock(self.features, dtype=self.dtype,
                            name=f"proj_{j}")(layers[i], train)
            x = BilinearUp(int(self.up_factors[j]), dtype=self.dtype,
                           name=f"up_{j}")(x)
            layers[i] = DeformBlock(self.features, dtype=self.dtype,
                                    name=f"node_{j}")(x + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Full aggregation pyramid (feature_extraction_dla34.py:390-413)."""
    startp: int
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        layers = list(layers)
        channels = list(self.channels)
        scales = [2 ** i for i in range(len(channels))]
        scales = np.array(scales, int)
        in_channels = list(channels)
        out = [layers[-1]]
        n = len(layers)
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUp(channels[j],
                        (scales[j:] // scales[j]).tolist(),
                        dtype=self.dtype, name=f"ida_{i}")
            layers = ida(layers, n - i - 2, n, train)
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j] for _ in channels[j + 1:]]
            out.insert(0, layers[-1])
        return out


class FeatureExtractor(nn.Module):
    """DLA-34 -> DLAUp -> final IDAUp: a 64-channel 1/4-resolution feature
    map (feature_extraction_dla34.py:427-453)."""
    down_ratio: int = 4
    last_level: int = 5
    dtype: Any = jnp.float32

    channels = (16, 32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        first = int(np.log2(self.down_ratio))
        feats = DLA(dtype=self.dtype, name="base")(x, train)
        outs = DLAUp(first, self.channels[first:], dtype=self.dtype,
                     name="dla_up")(feats[first:], train)
        y = list(outs[: self.last_level - first])
        y = IDAUp(self.channels[first],
                  [2 ** i for i in range(self.last_level - first)],
                  dtype=self.dtype, name="ida_up")(y, 0, len(y), train)
        return y[-1]
