"""Device-side augmentation: box/image consistency (reference
core/preprocessor_test.py pattern — seeded ops, invariants)."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.data import preprocessor
import pytest


def make_sample(h=32, w=32, tw=None, th=None):
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = 255.0  # left half white
    return {
        "image": jnp.asarray(img),
        "boxes": jnp.asarray([[4.0, 2.0, 12.0, 10.0]]),
        "classes": jnp.asarray([1]),
        "mask": jnp.asarray([True]),
        "true_shape": jnp.asarray([th or h, tw or w], jnp.int32),
    }


def _flip_always(sample):
    # probability 1 => always flips
    return preprocessor.random_horizontal_flip(jax.random.PRNGKey(0), sample, 1.0)


@pytest.mark.smoke
def test_horizontal_flip_boxes_and_pixels():
    s = make_sample()
    out = _flip_always(s)
    np.testing.assert_allclose(out["boxes"], [[4.0, 22.0, 12.0, 30.0]])
    img = np.asarray(out["image"])
    assert img[0, 0, 0] == 0.0 and img[0, -1, 0] == 255.0


def test_horizontal_flip_respects_true_width():
    s = make_sample(tw=16)  # only first 16 cols are real
    img0 = np.zeros((32, 32, 3), np.float32)
    img0[:, :8] = 255.0  # white strip inside the real region
    img0[:, 20:24] = 99.0  # marker in the padding region
    s["image"] = jnp.asarray(img0)
    out = _flip_always(s)
    img = np.asarray(out["image"])
    # real region [0:16) mirrored: white strip moves to cols 8..15
    assert img[0, 0, 0] == 0.0 and img[0, 15, 0] == 255.0
    # padding region beyond true width untouched
    np.testing.assert_allclose(img[:, 16:], img0[:, 16:])
    np.testing.assert_allclose(out["boxes"], [[4.0, 6.0, 12.0, 14.0]])


def test_flip_probability_zero_noop():
    s = make_sample()
    out = preprocessor.random_horizontal_flip(jax.random.PRNGKey(0), s, 0.0)
    np.testing.assert_allclose(out["image"], s["image"])
    np.testing.assert_allclose(out["boxes"], s["boxes"])


def test_photometric_ops_bounded():
    s = make_sample()
    rng = jax.random.PRNGKey(3)
    for name in [
        "random_adjust_brightness",
        "random_adjust_contrast",
        "random_adjust_hue",
        "random_adjust_saturation",
        "random_pixel_value_scale",
        "random_rgb_to_gray",
        "random_distort_color",
    ]:
        out = preprocessor.TRANSFORMS[name](rng, s)
        img = np.asarray(out["image"])
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
        assert img.min() >= -1e-3 and img.max() <= 255.001, name
        np.testing.assert_allclose(out["boxes"], s["boxes"])  # boxes untouched


def test_hue_zero_delta_identity():
    s = make_sample()
    out = preprocessor.random_adjust_hue(jax.random.PRNGKey(0), s, max_delta=0.0)
    np.testing.assert_allclose(out["image"], s["image"], atol=0.5)


def test_random_crop_masks_uncovered_boxes():
    s = make_sample(h=64, w=64)
    s["boxes"] = jnp.asarray([[0.0, 0.0, 8.0, 8.0], [30.0, 30.0, 60.0, 60.0]])
    s["mask"] = jnp.asarray([True, True])
    s["classes"] = jnp.asarray([0, 1])
    out = preprocessor.random_crop_image(
        jax.random.PRNGKey(5), s, min_area=0.2, max_area=0.4, overlap_thresh=0.9
    )
    assert out["image"].shape == (64, 64, 3)
    assert np.asarray(out["mask"]).dtype == bool
    # boxes stay finite and ordered
    b = np.asarray(out["boxes"])
    assert np.isfinite(b).all()


def test_random_crop_min_object_covered_falls_back_to_identity():
    # one huge box; windows of <=40% area can never cover it fully, so
    # min_object_covered=1.0 must keep the image unchanged (TF
    # sample_distorted_bounding_box max_attempts fallback)
    s = make_sample(h=64, w=64)
    s["boxes"] = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    s["mask"] = jnp.asarray([True])
    s["classes"] = jnp.asarray([0])
    for seed in range(4):
        out = preprocessor.random_crop_image(
            jax.random.PRNGKey(seed), s,
            min_object_covered=1.0, min_area=0.2, max_area=0.4,
        )
        np.testing.assert_array_equal(out["image"], s["image"])
        np.testing.assert_array_equal(out["boxes"], s["boxes"])


def test_random_crop_min_object_covered_keeps_a_box_covered():
    # a tiny box: any satisfying window must contain >=90% of it
    s = make_sample(h=64, w=64)
    s["boxes"] = jnp.asarray([[28.0, 28.0, 36.0, 36.0]])
    s["mask"] = jnp.asarray([True])
    s["classes"] = jnp.asarray([0])
    from mtlx.geometry import np_box_ops

    for seed in range(6):
        out = preprocessor.random_crop_image(
            jax.random.PRNGKey(seed), s,
            min_object_covered=0.9, min_area=0.3, max_area=0.6,
            overlap_thresh=0.0,
        )
        if np.array_equal(np.asarray(out["image"]), np.asarray(s["image"])):
            continue  # identity fallback is allowed
        # the surviving box must retain ~full area in the crop frame
        b = np.asarray(out["boxes"])[0]
        area = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        assert area > 0  # box survived the crop with positive area


def test_batch_preprocess_and_dispatcher():
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), make_sample(), make_sample()
    )
    out = preprocessor.batch_preprocess(
        jax.random.PRNGKey(0), batch,
        [("random_horizontal_flip", {}), ("random_adjust_brightness", {"max_delta": 0.1})],
    )
    assert out["image"].shape == (2, 32, 32, 3)


def test_unknown_transform_raises():
    import pytest

    with pytest.raises(ValueError, match="unimplemented"):
        preprocessor.preprocess(jax.random.PRNGKey(0), make_sample(), [("nope", {})])


def test_rotation90_boxes_and_true_shape():
    s = make_sample()
    s["true_shape"] = jnp.asarray([24, 32], jnp.int32)
    out = preprocessor.random_rotation90(jax.random.PRNGKey(0), s, probability=1.0)
    # box [4, 2, 12, 10] in a 24x32 true region -> [tw - xmax, ymin, tw - xmin, ymax]
    np.testing.assert_allclose(out["boxes"], [[22.0, 4.0, 30.0, 12.0]])
    assert np.asarray(out["true_shape"]).tolist() == [32, 24]


def test_random_image_scale_consistency():
    s = make_sample()
    out = preprocessor.random_image_scale(jax.random.PRNGKey(1), s, 0.5, 0.5)
    assert np.asarray(out["true_shape"]).tolist() == [16, 16]
    np.testing.assert_allclose(out["boxes"], np.asarray(s["boxes"]) * 0.5)
    # content beyond the scaled region is zeroed
    img = np.asarray(out["image"])
    assert (img[16:] == 0).all() and (img[:, 16:] == 0).all()


def test_random_pad_image_shifts_boxes():
    s = make_sample(th=16, tw=16)
    out = preprocessor.random_pad_image(jax.random.PRNGKey(2), s)
    ts = np.asarray(out["true_shape"])
    assert (ts >= 16).all() and (ts <= 32).all()
    b = np.asarray(out["boxes"])[0]
    b0 = np.asarray(s["boxes"])[0]
    assert b[0] >= b0[0] and b[1] >= b0[1]  # only shifted down/right


def test_resize_method_and_scale_boxes():
    s = make_sample()
    out = preprocessor.random_resize_method(jax.random.PRNGKey(3), s, 16, 24)
    assert np.asarray(out["true_shape"]).tolist() == [16, 24]
    s2 = make_sample()
    s2["boxes"] = jnp.asarray([[0.25, 0.5, 0.5, 1.0]])
    out2 = preprocessor.scale_boxes_to_pixel_coordinates(None, s2)
    np.testing.assert_allclose(out2["boxes"], [[8.0, 16.0, 16.0, 32.0]])


def test_all_declared_transforms_run():
    """Every transform in the registry executes on a batch sample."""
    s = make_sample()
    for i, name in enumerate(sorted(preprocessor.TRANSFORMS)):
        fn = preprocessor.TRANSFORMS[name]
        if name in ("random_resize_method", "resize_image"):
            out = fn(jax.random.PRNGKey(i), s, 16, 16)
        else:
            out = fn(jax.random.PRNGKey(i), s)
        assert out["image"].shape == s["image"].shape, name
        assert np.isfinite(np.asarray(out["boxes"])).all(), name


def test_ssd_random_crop_honors_operations():
    """A single operation with random_coef=1 forces the keep-original arm
    every draw — proves .operations replaces the default 7-way schedule
    (which crops with probability 6/7 per draw)."""
    op = dict(min_object_covered=0.0, min_aspect_ratio=1.0,
              max_aspect_ratio=1.0, min_area=0.5, max_area=0.5,
              overlap_thresh=0.0, random_coef=1.0)
    s = make_sample()
    crops = 0
    for i in range(12):
        out = preprocessor.ssd_random_crop(
            jax.random.PRNGKey(i), s, operations=(op,)
        )
        np.testing.assert_allclose(out["image"], s["image"])
        np.testing.assert_allclose(out["boxes"], s["boxes"])
        # default schedule must crop at least once over 12 seeds
        dflt = preprocessor.ssd_random_crop(jax.random.PRNGKey(i), s)
        crops += int(not np.allclose(dflt["image"], s["image"]))
    assert crops > 0


def test_ssd_random_crop_pad_operation_pad_color():
    """ssd_random_crop_pad threads per-operation pad colors into the
    padded region."""
    op = dict(min_object_covered=0.0, min_aspect_ratio=1.0,
              max_aspect_ratio=1.0, min_area=1.0, max_area=1.0,
              overlap_thresh=0.0, random_coef=1.0,  # keep-original crop arm
              min_padded_size_ratio=(2.0, 2.0),
              max_padded_size_ratio=(2.0, 2.0),
              pad_color=(7.0, 8.0, 9.0))
    s = make_sample(th=16, tw=16)
    out = preprocessor.ssd_random_crop_pad(
        jax.random.PRNGKey(0), s, operations=(op,)
    )
    ts = np.asarray(out["true_shape"])
    assert ts.tolist() == [32, 32]  # 2x ratio of the 16x16 true region
    img = np.asarray(out["image"])
    # some padded pixel carries the configured color
    assert (img.reshape(-1, 3) == [7.0, 8.0, 9.0]).all(axis=1).any()


def test_random_pad_image_min_max_bounds():
    s = make_sample(th=8, tw=8)
    for i in range(6):
        out = preprocessor.random_pad_image(
            jax.random.PRNGKey(i), s,
            min_image_height=20, min_image_width=12,
            max_image_height=24, max_image_width=16,
        )
        th, tw = np.asarray(out["true_shape"]).tolist()
        assert 20 <= th <= 24 and 12 <= tw <= 16


def test_resize_image_deterministic_and_nearest():
    s = make_sample()
    out = preprocessor.resize_image(None, s, 16, 24)
    assert np.asarray(out["true_shape"]).tolist() == [16, 24]
    np.testing.assert_allclose(
        out["boxes"], np.asarray(s["boxes"]) * [0.5, 0.75, 0.5, 0.75]
    )
    near = preprocessor.resize_image(None, s, 16, 16, method=4)
    img = np.asarray(near["image"])[:16, :16]
    assert set(np.unique(img)) <= {0.0, 255.0}  # nearest keeps exact values
    import pytest

    with pytest.raises(ValueError):
        preprocessor.resize_image(None, s, 0, 16)
