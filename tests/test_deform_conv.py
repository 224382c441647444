import functools
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from side_tpu.ops.deform_conv import deform_conv2d, plain_conv2d


def _setup(rng, B=1, H=7, W=9, Cin=4, Cout=5, k=3):
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(k, k, Cin, Cout) * 0.2).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    offset = np.zeros((B, H, W, k * k, 2), np.float32)
    mask = np.ones((B, H, W, k * k), np.float32)
    return x, w, b, offset, mask


def test_zero_offset_equals_plain_conv():
    """DCNv2/test.py:32-65 analogue: zero offsets + unit mask == regular conv."""
    rng = np.random.RandomState(0)
    x, w, b, offset, mask = _setup(rng)
    out_d = np.asarray(deform_conv2d(*map(jnp.asarray, (x, offset, mask, w, b))))
    out_p = np.asarray(plain_conv2d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b)))
    np.testing.assert_allclose(out_d, out_p, rtol=1e-4, atol=1e-4)


def test_half_mask_scales_output():
    rng = np.random.RandomState(1)
    x, w, _, offset, mask = _setup(rng)
    full = np.asarray(deform_conv2d(*map(jnp.asarray, (x, offset, mask, w))))
    half = np.asarray(deform_conv2d(*map(jnp.asarray,
                                         (x, offset, mask * 0.5, w))))
    np.testing.assert_allclose(half, full * 0.5, rtol=1e-4, atol=1e-5)


def test_integer_offset_shifts_sampling():
    """Offsetting every tap by (0, +1) equals convolving the x-shifted image
    (interior pixels)."""
    rng = np.random.RandomState(2)
    x, w, _, offset, mask = _setup(rng, H=8, W=10)
    offset[..., 1] = 1.0  # dx = +1 on every tap
    out = np.asarray(deform_conv2d(*map(jnp.asarray, (x, offset, mask, w))))
    x_shift = np.zeros_like(x)
    x_shift[:, :, :-1] = x[:, :, 1:]
    ref = np.asarray(plain_conv2d(jnp.asarray(x_shift), jnp.asarray(w)))
    # interior only: border columns see different zero-padding
    np.testing.assert_allclose(out[:, 1:-1, 1:-2], ref[:, 1:-1, 1:-2],
                               rtol=1e-4, atol=1e-4)


def test_fractional_offset_bilinear():
    """A 1x1 'conv' with fractional offset reproduces bilinear interpolation."""
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    w = np.ones((1, 1, 1, 1), np.float32)
    offset = np.zeros((1, 4, 4, 1, 2), np.float32)
    offset[..., 0] = 0.5  # dy
    offset[..., 1] = 0.25  # dx
    mask = np.ones((1, 4, 4, 1), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(w),
                                   stride=1, padding=0))
    # sample at (y+0.5, x+0.25): rows step by 4, cols by 1
    expected = x[0, :, :, 0] + 0.5 * 4 + 0.25
    # out-of-range rows/cols partially zero-padded; check interior
    np.testing.assert_allclose(out[0, :3, :3, 0], expected[:3, :3], rtol=1e-5)


def test_gradients_match_finite_differences():
    """DCNv2/test.py gradcheck analogue for input, offset, mask, weight."""
    rng = np.random.RandomState(3)
    B, H, W, Cin, Cout, k = 1, 5, 6, 2, 3, 3
    x = rng.randn(B, H, W, Cin).astype(np.float64)
    w = (rng.randn(k, k, Cin, Cout) * 0.3).astype(np.float64)
    b = rng.randn(Cout).astype(np.float64)
    offset = (rng.randn(B, H, W, k * k, 2) * 0.4).astype(np.float64)
    mask = (rng.rand(B, H, W, k * k) * 0.8 + 0.1).astype(np.float64)
    g = rng.randn(B, H, W, Cout).astype(np.float64)

    def f(x_, o_, m_, w_, b_):
        out = deform_conv2d(x_, o_, m_, w_, b_)
        return jnp.sum(out * g)

    with jax.enable_x64(True):
        args = [jnp.asarray(a, jnp.float64) for a in (x, offset, mask, w, b)]
        g = jnp.asarray(g, jnp.float64)
        grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)
        eps = 1e-5
        for ai, name in [(0, "x"), (1, "offset"), (2, "mask"), (3, "w"),
                         (4, "b")]:
            a = np.array(args[ai], np.float64)
            flat = a.reshape(-1)
            # probe a handful of coordinates
            idxs = rng.choice(flat.size, size=min(8, flat.size), replace=False)
            for i in idxs:
                ap, am = flat.copy(), flat.copy()
                ap[i] += eps
                am[i] -= eps
                args_p = list(args)
                args_m = list(args)
                args_p[ai] = jnp.asarray(ap.reshape(a.shape))
                args_m[ai] = jnp.asarray(am.reshape(a.shape))
                num = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
                ana = float(np.asarray(grads[ai]).reshape(-1)[i])
                assert num == pytest.approx(ana, rel=2e-3, abs=2e-4), (
                    name, i, num, ana)


def test_stride_two():
    rng = np.random.RandomState(4)
    B, H, W, Cin, Cout = 1, 8, 8, 3, 4
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(3, 3, Cin, Cout) * 0.2).astype(np.float32)
    offset = np.zeros((B, 4, 4, 9, 2), np.float32)
    mask = np.ones((B, 4, 4, 9), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(w),
                                   stride=2, padding=1))
    ref = np.asarray(plain_conv2d(jnp.asarray(x), jnp.asarray(w), stride=2))
    assert out.shape == (1, 4, 4, Cout)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_windowed_matches_exact_for_inrange_offsets():
    """Shift-decomposed DCN == gather DCN whenever offsets are within the
    clamp radius (including fractional and border-crossing samples)."""
    from side_tpu.ops.deform_conv import (deform_conv2d_windowed,
                                          _deform_conv2d_gather)
    rng = np.random.RandomState(7)
    B, H, W, Cin, Cout, k = 2, 9, 11, 5, 4, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(k, k, Cin, Cout) * 0.3).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    offset = (rng.uniform(-2, 2, (B, H, W, 9, 2))).astype(np.float32)
    mask = rng.rand(B, H, W, 9).astype(np.float32)
    exact = np.asarray(_deform_conv2d_gather(
        *map(jnp.asarray, (x, offset, mask, w, b))))
    windowed = np.asarray(deform_conv2d_windowed(
        *map(jnp.asarray, (x, offset, mask, w, b)), radius=2))
    np.testing.assert_allclose(windowed, exact, rtol=1e-4, atol=1e-4)


def test_windowed_stride_two_and_clamping():
    from side_tpu.ops.deform_conv import (deform_conv2d_windowed,
                                          _deform_conv2d_gather)
    rng = np.random.RandomState(8)
    B, H, W, Cin, Cout = 1, 8, 10, 3, 4
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(3, 3, Cin, Cout) * 0.3).astype(np.float32)
    offset = rng.uniform(-1.5, 1.5, (B, 4, 5, 9, 2)).astype(np.float32)
    mask = np.ones((B, 4, 5, 9), np.float32)
    exact = np.asarray(_deform_conv2d_gather(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(w), stride=2))
    windowed = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(w), stride=2, radius=2))
    np.testing.assert_allclose(windowed, exact, rtol=1e-4, atol=1e-4)
    # out-of-range offsets are clamped to the radius (deviation by design)
    off_big = offset.copy()
    off_big[..., 0] += 100.0
    off_clamped = offset.copy()
    off_clamped[..., 0] = 2.0
    a = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(off_big), jnp.asarray(mask),
        jnp.asarray(w), stride=2, radius=2))
    bb = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(off_clamped), jnp.asarray(mask),
        jnp.asarray(w), stride=2, radius=2))
    np.testing.assert_allclose(a, bb, rtol=1e-5)


def test_windowed_gradients_flow():
    from side_tpu.ops.deform_conv import deform_conv2d_windowed
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 6, 6, 2), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 2, 3) * 0.3, jnp.float32)
    offset = jnp.asarray(rng.uniform(-1, 1, (1, 6, 6, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.rand(1, 6, 6, 9), jnp.float32)

    def f(o):
        return jnp.sum(deform_conv2d_windowed(x, o, mask, w) ** 2)

    g = jax.grad(f)(offset)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.golden
def test_pallas_kernel_matches_windowed():
    """Mosaic windowed-DCN kernel == XLA windowed decomposition (interpret
    mode on CPU; the real lowering is exercised on TPU by the bench)."""
    from side_tpu.ops import dcn_pallas as DP
    from side_tpu.ops.deform_conv import deform_conv2d_windowed
    import jax
    rng = np.random.RandomState(11)
    B, H, W, Cin, Cout = 2, 8, 16, 8, 8
    x = (rng.randn(B, H, W, Cin) * 0.5).astype(np.float32)
    w = (rng.randn(3, 3, Cin, Cout) * 0.3).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    offset = rng.uniform(-2, 2, (B, H, W, 9, 2)).astype(np.float32)
    mask = rng.rand(B, H, W, 9).astype(np.float32)

    import unittest.mock as um
    with um.patch.object(DP.pl, "pallas_call",
                         functools.partial(DP.pl.pallas_call,
                                           interpret=True)) if False else \
            um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                     functools.partial(DP.pl.pallas_call, interpret=True)):
        out = np.asarray(DP.deform_conv2d_pallas(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(w), jnp.asarray(b)))
    ref = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(w), jnp.asarray(b), radius=2))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.golden
def test_pallas_kernel_gradients():
    from side_tpu.ops import dcn_pallas as DP
    import unittest.mock as um
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 4, 8, 4) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.3, jnp.float32)
    offset = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.rand(1, 4, 8, 9), jnp.float32)

    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        def f(o, ww):
            return jnp.sum(DP.deform_conv2d_pallas(x, o, mask, ww) ** 2)
        g_o, g_w = jax.grad(f, argnums=(0, 1))(offset, w)
    assert np.isfinite(np.asarray(g_o)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    assert float(jnp.abs(g_w).sum()) > 0


@pytest.mark.golden
def test_pallas_fori_matches_full_unroll():
    """The fori-loop kernel variant (production: the fully unrolled one is
    too large for Mosaic to compile in-model) equals the unrolled variant."""
    from side_tpu.ops import dcn_pallas as DP
    import unittest.mock as um
    rng = np.random.RandomState(13)
    B, H, W, Cin, Cout = 1, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    offset = jnp.asarray(rng.uniform(-2, 2, (B, H, W, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

    outs = {}
    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        for mode in ("full", "fori"):
            with um.patch.object(DP, "_UNROLL", mode):
                outs[mode] = np.asarray(DP.deform_conv2d_pallas(
                    x, offset, mask, w, b))
    np.testing.assert_allclose(outs["fori"], outs["full"],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.golden
def test_pallas_factored_matches_rmw():
    """The factored accumulation (acc += wy * sum_sx(x*wx); opt-in via
    SIDE_TPU_DCN_ACCUM — measured slower than rmw on TPU but kept as the
    documented alternative) equals the per-term RMW pattern in both the
    packed and unpacked kernels."""
    from side_tpu.ops import dcn_pallas as DP
    import unittest.mock as um
    rng = np.random.RandomState(15)
    B, H, W, Cin, Cout = 2, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    offset = jnp.asarray(rng.uniform(-2, 2, (B, H, W, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        for pack in (False, True):
            outs = {}
            with um.patch.object(DP, "_PACK", pack):
                for accum in ("rmw", "factored"):
                    with um.patch.object(DP, "_ACCUM", accum):
                        outs[accum] = np.asarray(DP.deform_conv2d_pallas(
                            x, offset, mask, w, b))
            np.testing.assert_allclose(outs["factored"], outs["rmw"],
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.golden
def test_pallas_packed_matches_unpacked():
    """The batch-packed kernel (batch in the lane dim; production for the
    C<=128 DLA layers) equals the per-image kernel: pins the c-major lane
    permutation, the block-diagonal weight layout, and the exactness of the
    lane expansion (a default-precision f32 matmul expansion would round
    every offset/mask through bf16)."""
    from side_tpu.ops import dcn_pallas as DP
    import unittest.mock as um
    rng = np.random.RandomState(14)
    B, H, W, Cin, Cout = 4, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    offset = jnp.asarray(rng.uniform(-2, 2, (B, H, W, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

    outs = {}
    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        for pack in (False, True):
            with um.patch.object(DP, "_PACK", pack):
                outs[pack] = np.asarray(DP.deform_conv2d_pallas(
                    x, offset, mask, w, b))
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-5, atol=1e-5)


def test_matmul_lane_pack_roundtrip():
    """The MXU 0/1-matmul lane pack/unpack (opt-in alternative for the
    (B,H,W,L) <-> (1,H,W,L*B) relayouts; measured neutral-to-slower than
    the default transpose on chip, kept for bisection) must be
    bit-identical to the transpose form in both dtypes and invert
    exactly."""
    from side_tpu.ops import dcn_pallas as DP
    import unittest.mock as um
    rng = np.random.RandomState(21)
    for B, L, dt in ((4, 16, jnp.float32), (4, 16, jnp.bfloat16),
                     (2, 18, jnp.float32), (8, 8, jnp.bfloat16)):
        a = jnp.asarray(rng.randn(B, 4, 8, L), dt)
        with um.patch.object(DP, "_PACK_VIA", "matmul"):
            packed = DP._pack_lanes(a)
        with um.patch.object(DP, "_PACK_VIA", "transpose"):
            ref = DP._pack_lanes(a)
        assert packed.dtype == a.dtype and packed.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(packed, np.float32),
                                      np.asarray(ref, np.float32))
        with um.patch.object(DP, "_PACK_VIA", "matmul"):
            back = DP._unpack_lanes(packed, B)
        np.testing.assert_array_equal(np.asarray(back, np.float32),
                                      np.asarray(a, np.float32))


@pytest.mark.golden
def test_pallas_lerp_matches_rmw():
    """The select-lerp bilinear formulation (production default: the two
    nonzero triangle neighbours picked by base/frac instead of summing
    every (2R+2)^2 triangle term, ~2.5x fewer VPU ops at R=1) equals the
    per-term RMW triangle pattern in both kernels at R=1 and R=2,
    including clamped out-of-window offsets."""
    from side_tpu.ops import dcn_pallas as DP
    import unittest.mock as um
    rng = np.random.RandomState(16)
    B, H, W, Cin, Cout = 2, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    # beyond +-2 to exercise clamping; includes exact integers via rounding
    offset = jnp.asarray(np.round(
        rng.uniform(-2.5, 2.5, (B, H, W, 9, 2)) * 4) / 4, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        for radius in (1, 2):
            for pack in (False, True):
                outs = {}
                with um.patch.object(DP, "_PACK", pack):
                    for accum in ("rmw", "lerp"):
                        with um.patch.object(DP, "_ACCUM", accum):
                            outs[accum] = np.asarray(DP.deform_conv2d_pallas(
                                x, offset, mask, w, b, radius=radius))
                np.testing.assert_allclose(
                    outs["lerp"], outs["rmw"], rtol=1e-5, atol=1e-5,
                    err_msg=f"radius={radius} pack={pack}")


@pytest.mark.golden
def test_pallas_backward_nonzero_at_zero_offsets():
    """Training-correctness regression: DCN offset convs are ZERO-initialised
    (dla.py DeformBlock, matching dcn_v2.py:init_offset), so the very first
    training step evaluates d_offset at offsets == 0 exactly.  The round-2
    triangle backward's tri'(t) = -sign(t)*[|t|<1] is identically zero there,
    so offsets get no direct gradient at init (they drift only via the shared
    offset_mask conv's mask-channel gradients).  The
    production lerp backward must (a) be nonzero at zero offsets and (b) equal
    the right-derivative — the XLA windowed VJP evaluated just inside the
    cell (offsets + eps, same linear piece), matching the reference CUDA
    coordinate-weight semantics (dcn_v2_im2col_cuda.cu:70-99, which uses
    floor/frac, i.e. the lerp derivative)."""
    from side_tpu.ops import dcn_pallas as DP
    from side_tpu.ops.dcn_pallas_bwd import dcn_packed_backward
    from side_tpu.ops.deform_conv import deform_conv2d_windowed
    import unittest.mock as um
    rng = np.random.RandomState(17)
    B, H, W, Cin, Cout = 2, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout), jnp.float32)
    o0 = jnp.zeros((B, H, W, 18), jnp.float32)

    with um.patch("side_tpu.ops.dcn_pallas_bwd.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        got = dcn_packed_backward(x, o0, mask, w, g, 1)
    d_off = np.asarray(got[1])
    assert np.abs(d_off).sum() > 1.0, "offset gradient dead at init"

    eps = 1e-4
    def f(o18):
        return deform_conv2d_windowed(x, o18.reshape(B, H, W, 9, 2), mask,
                                      w, None, radius=1)
    _, vjp = jax.vjp(f, o0 + eps)
    ref = np.asarray(vjp(g)[0])
    # within one linear piece the offset gradient moves by O(eps * |x|)
    np.testing.assert_allclose(d_off, ref, atol=5e-3)


@pytest.mark.golden
def test_pallas_packed_backward_matches_xla_vjp():
    """The fused Mosaic backward (col2im / col2im_coord analogues) equals
    jax.vjp of the XLA windowed decomposition for every cotangent,
    including the clamp rule (zero offset-gradient outside [-R, R])."""
    from side_tpu.ops import dcn_pallas as DP
    from side_tpu.ops.dcn_pallas_bwd import dcn_packed_backward
    from side_tpu.ops.deform_conv import deform_conv2d_windowed
    import unittest.mock as um
    rng = np.random.RandomState(15)
    B, H, W, Cin, Cout = 4, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    # include out-of-window offsets to exercise the clip-gradient rule
    offset = jnp.asarray(rng.uniform(-2.5, 2.5, (B, H, W, 9, 2)),
                         jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout), jnp.float32)
    offset18 = offset.reshape(B, H, W, 18)

    def f(x, o18, m, w, b):
        return deform_conv2d_windowed(x, o18.reshape(B, H, W, 9, 2), m, w,
                                      b, radius=2)
    _, vjp = jax.vjp(f, x, offset18, mask, w, b)
    ref = vjp(g)

    with um.patch("side_tpu.ops.dcn_pallas_bwd.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        got = dcn_packed_backward(x, offset18, mask, w, g, 2)

    names = ["d_x", "d_offset", "d_mask", "d_weight", "d_bias"]
    for name, a, r in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.golden
def test_packed_batch_grouping_matches_windowed():
    """When the whole batch cannot lane-pack (e.g. B=8 at C=64: CP=512 has
    no VMEM-feasible tile — the shape that OOM'd scoped vmem on chip at
    bench batch 4), the dispatch splits into the largest feasible
    sub-batch groups and reuses the packed kernels per group.  Forward
    value and every cotangent must match the XLA windowed reference, and
    the grouped path must actually engage."""
    from side_tpu.ops import dcn_pallas as DP
    from side_tpu.ops import dcn_pallas_bwd as DB
    from side_tpu.ops.deform_conv import deform_conv2d_windowed
    import unittest.mock as um
    rng = np.random.RandomState(33)
    B, H, W, Cin, Cout = 4, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    offset = jnp.asarray(rng.uniform(-1.5, 1.5, (B, H, W, 9, 2)),
                         jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout), jnp.float32)

    # force infeasibility at the full batch so groups of 2 are chosen
    orig_pick = DP._pick_tile_h_packed
    def pick(H_, W_, CP, B_, *a):
        return None if B_ > 2 else orig_pick(H_, W_, CP, B_, *a)
    orig_fits = DB.packed_backward_fits
    def fits(H_, W_, B_, C_, R_):
        return B_ <= 2 and orig_fits(H_, W_, B_, C_, R_)
    calls = []
    orig_fwd_packed = DP._pallas_forward_packed
    def fwd_packed(x_, *a):
        calls.append(x_.shape[0])
        return orig_fwd_packed(x_, *a)

    def f(x, off, m, w, b):
        return deform_conv2d_windowed(x, off, m, w, b, radius=1)
    ref_out, vjp = jax.vjp(f, x, offset, mask, w, b)
    ref = vjp(g)

    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)), \
         um.patch("side_tpu.ops.dcn_pallas_bwd.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)), \
         um.patch.object(DP, "_PACK", True), \
         um.patch.object(DP, "_BWD", "pallas"), \
         um.patch.object(DP, "_pick_tile_h_packed", pick), \
         um.patch.object(DP, "_pallas_forward_packed", fwd_packed), \
         um.patch.object(DB, "packed_backward_fits", fits):
        def fp(x, off, m, w, b):
            return DP.deform_conv2d_pallas(x, off, m, w, b, radius=1)
        out, vjp_p = jax.vjp(fp, x, offset, mask, w, b)
        got = vjp_p(g)

    assert calls == [2, 2], f"grouped fwd path did not engage: {calls}"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-4)
    names = ["d_x", "d_offset", "d_mask", "d_weight", "d_bias"]
    for name, a, r in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.golden
def test_pallas_fused_om_matches_unfused():
    """Fused offset-conv packed forward == the unfused composition
    (interpret mode; VERDICT r3 next #1c).  Also checks the fused op's
    VJP fallback produces the composition's gradients."""
    from side_tpu.ops import dcn_pallas as DP
    import jax
    rng = np.random.RandomState(3)
    B, H, W, Cin, Cout = 2, 8, 16, 8, 8
    x = jnp.asarray((rng.randn(B, H, W, Cin) * 0.5).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, Cin, Cout) * 0.3).astype(np.float32))
    b = jnp.asarray(rng.randn(Cout).astype(np.float32))
    w_om = jnp.asarray((rng.randn(3, 3, Cin, 27) * 0.2).astype(np.float32))
    b_om = jnp.asarray((rng.randn(27) * 0.3).astype(np.float32))

    import unittest.mock as um
    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        fused = np.asarray(DP.deform_conv2d_pallas_fused(
            x, w_om, b_om, w, b, radius=1))
    ref = np.asarray(DP._fused_reference(x, w_om, b_om, w, b, radius=1))
    np.testing.assert_allclose(fused, ref, rtol=2e-3, atol=2e-3)

    # gradient fallback: matches autodiff of the composition
    def loss_fused(x_, wom_, w_):
        return jnp.sum(DP.deform_conv2d_pallas_fused(
            x_, wom_, b_om, w_, b, radius=1) ** 2)

    def loss_ref(x_, wom_, w_):
        return jnp.sum(DP._fused_reference(x_, wom_, b_om, w_, b, 1) ** 2)

    with um.patch("side_tpu.ops.dcn_pallas.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_om, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_om, w)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.golden
def test_pallas_backward_c256_group_split():
    """The C=256 DLA-up layers now take the packed Pallas backward via the
    sub-batch group split (gs = 512//C = 2) instead of the XLA windowed
    VJP (dcn_pallas._dcn_bwd round 5).  Parity of every cotangent against
    jax.vjp of deform_conv2d_windowed, interpret mode."""
    import unittest.mock as um
    from side_tpu.ops import dcn_pallas as DP
    from side_tpu.ops.dcn_pallas_bwd import dcn_packed_backward
    from side_tpu.ops.deform_conv import deform_conv2d_windowed

    rng = np.random.RandomState(5)
    B, H, W, Cin, Cout, R = 4, 8, 16, 256, 64, 1
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32)
    off = jnp.asarray(rng.uniform(-1.4, 1.4, (B, H, W, 18)), jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout) * 0.1, jnp.float32)

    def xla_eq(x, off, mask, w, b):
        return deform_conv2d_windowed(x, off.reshape(B, H, W, 9, 2), mask,
                                      w, b, stride=1, padding=1, dilation=1,
                                      radius=R)

    _, vjp = jax.vjp(xla_eq, x, off, mask, w, jnp.zeros((Cout,)))
    want = vjp(g)
    with um.patch("side_tpu.ops.dcn_pallas_bwd.pl.pallas_call",
                  functools.partial(DP.pl.pallas_call, interpret=True)):
        got = DP._dcn_bwd(R, (x, off, mask, w, jnp.zeros((Cout,))), g)
    for n, a, b in zip(["d_x", "d_off", "d_mask", "d_w", "d_b"], got, want):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.abs(a - b).max()
        assert err / (np.abs(b).max() + 1e-6) < 2e-3, (n, err)


@pytest.mark.golden
def test_bwd_roofline_probe_bodies_run():
    """The roofline probe bodies (SIDE_TPU_DCN_BWD_ROOF lerp0/copy) keep
    the production plumbing intact: they trace, run in interpret mode, and
    return full-shape cotangents (values are calibration-only by design —
    tools/dcn_bwd_roofline.py).  Also guards that _ROOF='' stays the
    production path."""
    from side_tpu.ops import dcn_pallas as DP
    from side_tpu.ops import dcn_pallas_bwd as DPB
    import unittest.mock as um
    rng = np.random.RandomState(3)
    B, H, W, Cin, Cout = 4, 8, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3, jnp.float32)
    offset18 = jnp.asarray(rng.uniform(-0.9, 0.9, (B, H, W, 18)),
                           jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout), jnp.float32)

    outs = {}
    try:
        for mode in ("", "lerp0", "copy"):
            DPB._ROOF = mode
            with um.patch("side_tpu.ops.dcn_pallas_bwd.pl.pallas_call",
                          functools.partial(DP.pl.pallas_call,
                                            interpret=True)):
                outs[mode] = DPB.dcn_packed_backward(
                    x, offset18, mask, w, g, 1)
    finally:
        DPB._ROOF = ""
    for mode, got in outs.items():
        assert got[0].shape == x.shape, mode
        assert got[1].shape == offset18.shape, mode
        assert got[3].shape == w.shape, mode
        for o in got:
            assert np.all(np.isfinite(np.asarray(o))), mode

    # production (_ROOF='') must equal the XLA VJP — the probe branches
    # must not have perturbed it
    from side_tpu.ops.deform_conv import deform_conv2d_windowed

    def f(x, o18, m, w):
        return deform_conv2d_windowed(x, o18.reshape(B, H, W, 9, 2), m, w,
                                      None, radius=1)
    _, vjp = jax.vjp(f, x, offset18, mask, w)
    ref = vjp(g)
    for a, r in zip(outs[""], ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)

    # the value-carried accum variant (lerp_vc — opt-in, see _BWD_ACCUM)
    # must produce the same gradients as the production ref form
    old = DPB._BWD_ACCUM
    try:
        DPB._BWD_ACCUM = "lerp_vc"
        with um.patch("side_tpu.ops.dcn_pallas_bwd.pl.pallas_call",
                      functools.partial(DP.pl.pallas_call, interpret=True)):
            vc = DPB.dcn_packed_backward(x, offset18, mask, w, g, 1)
    finally:
        DPB._BWD_ACCUM = old
    for a, r in zip(vc, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
