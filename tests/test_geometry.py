import numpy as np
import pytest

from side_tpu.data import geometry as G


def _cv2_affine(center, scale, rot, output_size, inv=0):
    """Reference-style construction via cv2.getAffineTransform
    (mirrors /root/reference/src/lib/utils/image.py:27-60) as an oracle."""
    cv2 = pytest.importorskip("cv2")
    if not isinstance(scale, (np.ndarray, list)):
        scale = np.array([scale, scale], np.float32)
    src_w = scale[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([-(-0.5 * src_w) * sn, (-0.5 * src_w) * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0, :] = center
    src[1, :] = center + src_dir

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
    src[2:, :] = third(src[0, :], src[1, :])
    dst[2:, :] = third(dst[0, :], dst[1, :])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0, 15])
@pytest.mark.parametrize("inv", [0, 1])
def test_affine_matches_reference_construction(rot, inv):
    center = np.array([621.0, 187.5])
    scale = np.array([1242.0, 375.0])
    ours = G.get_affine_transform(center, scale, rot, [1280, 384], inv=inv)
    oracle = _cv2_affine(center, scale, rot, [1280, 384], inv=inv)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-3)


def test_affine_roundtrip():
    center = np.array([500.0, 200.0])
    scale = np.array([1100.0, 370.0])
    t = G.get_affine_transform(center, scale, 0, [320, 96])
    t_inv = G.get_affine_transform(center, scale, 0, [320, 96], inv=True)
    pts = np.random.RandomState(0).rand(10, 2) * 300
    warped = G.affine_transform_batch(pts, t)
    back = G.affine_transform_batch(warped, t_inv)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_transform_preds_inverts_output_warp():
    center = np.array([621.0, 187.5])
    scale = np.array([1242.0, 375.0])
    t = G.get_affine_transform(center, scale, 0, [320, 96])
    orig = np.array([[100.0, 200.0], [621.0, 187.5]])
    out_coords = G.affine_transform_batch(orig, t)
    rec = G.transform_preds(out_coords, center, scale, (320, 96))
    np.testing.assert_allclose(rec, orig, atol=1e-5)


def test_gaussian_radius_known_value():
    # CornerNet quadratic-root formula, min_overlap=0.7: each candidate r is
    # the larger root of its displacement case; result is their minimum.
    h = w = 10.0
    ov = 0.7
    r = G.gaussian_radius((h, w))
    cases = []
    for a, b, c in [
        (1, h + w, w * h * (1 - ov) / (1 + ov)),
        (4, 2 * (h + w), (1 - ov) * w * h),
        (4 * ov, -2 * ov * (h + w), (ov - 1) * w * h),
    ]:
        cases.append((b + np.sqrt(b * b - 4 * a * c)) / 2)
    assert r == pytest.approx(min(cases))
    assert 0 < r < 10


def test_draw_umich_gaussian_peak_and_clip():
    hm = np.zeros((96, 320), np.float32)
    G.draw_umich_gaussian(hm, (5, 5), radius=4)
    assert hm[5, 5] == pytest.approx(1.0)
    # near-border draw must not crash and keeps peak inside
    G.draw_umich_gaussian(hm, (0, 0), radius=6)
    assert hm[0, 0] == pytest.approx(1.0)
    G.draw_umich_gaussian(hm, (319, 95), radius=6)
    assert hm[95, 319] == pytest.approx(1.0)


def test_alpha_rot_y_roundtrip():
    rng = np.random.RandomState(1)
    alpha = rng.uniform(-np.pi, np.pi, 50)
    x = rng.uniform(0, 1242, 50)
    ry = G.alpha_to_rot_y(alpha, x, 621.0, 721.0)
    back = G.rot_y_to_alpha(ry, x, 621.0, 721.0)
    np.testing.assert_allclose(back, alpha, atol=1e-9)


def test_draw_dense_reg_paints_where_gaussian_dominates():
    H, W, dim, radius = 20, 24, 2, 3
    regmap = np.zeros((dim, H, W), np.float32)
    heatmap = np.zeros((H, W), np.float32)
    heatmap[10, 12] = 2.0  # already stronger than any gaussian value
    G.draw_dense_reg(regmap, heatmap, (12, 10), [5.0, -3.0], radius)
    # dominated everywhere except the pre-seeded peak cell
    assert regmap[0, 10, 12] == 0.0 and regmap[1, 10, 12] == 0.0
    assert regmap[0, 10, 13] == 5.0 and regmap[1, 10, 13] == -3.0
    assert regmap[0, 7, 12] == 5.0
    # untouched outside the radius window
    assert regmap[0, 10, 12 + radius + 1] == 0.0


def test_draw_dense_reg_offset_mode_subtracts_delta():
    H, W, radius = 16, 16, 2
    regmap = np.zeros((2, H, W), np.float32)
    heatmap = np.zeros((H, W), np.float32)
    G.draw_dense_reg(regmap, heatmap, (8, 8), [0.25, 0.75], radius,
                     is_offset=True)
    # offset patch stores value - (cell - center) per axis
    assert regmap[0, 8, 9] == pytest.approx(0.25 - 1)
    assert regmap[1, 9, 8] == pytest.approx(0.75 - 1)
    assert regmap[0, 8, 8] == pytest.approx(0.25)


def test_color_aug_cv2_matches_numpy():
    """The cv2 fast path of color_aug must match the reference numpy math
    bit-closely with the identical rng draw sequence (image.py:198-230)."""
    import numpy as np
    from side_tpu.data import geometry as G
    from side_tpu.data.dataset import _EIG_VAL, _EIG_VEC
    if G._cv2 is None:
        import pytest
        pytest.skip("cv2 unavailable")
    rng = np.random.RandomState(42)
    base = rng.rand(96, 160, 3).astype(np.float32)
    for seed in range(8):
        a = base.copy()
        b = base.copy()
        G.color_aug(np.random.RandomState(seed), a, _EIG_VAL, _EIG_VEC)
        G._color_aug_numpy(np.random.RandomState(seed), b, _EIG_VAL,
                           _EIG_VEC)
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_draw_msra_gaussian_radius_zero_no_nan():
    """radius-0 objects must draw a unit impulse, not NaN the heatmap
    (the reference's exp(-d2/0) evaluates 0/0 at the centre pixel;
    observed as hm_loss=NaN from step 0 with --mse_loss on the fixture)."""
    import numpy as np
    from side_tpu.data import geometry as G
    hm = np.zeros((8, 8), np.float32)
    G.draw_msra_gaussian(hm, (3, 3), 0)
    assert np.isfinite(hm).all()
    assert hm[3, 3] == 1.0 and hm.sum() == 1.0
