"""Transform registry parity tests (reference dataset/transform/transforms.py:12-37,
augmix.py:16, augexpand.py:15, custom_funcs/rotate.py:11-40)."""
import numpy as np
import pytest

from quantize_tpu.data.transforms import (
    TRANSFORMS,
    build_transform,
    random_rotate,
    rotate_with_labels,
)

REFERENCE_REGISTRY = [
    "random_resized_crop", "random_horizontal_flip", "random_vertical_flip",
    "random_rotation", "random_affine", "color_jitter", "to_tensor",
    "normalize", "resize", "center_crop", "pad", "lambda", "random_apply",
    "random_choice", "random_crop", "random_order", "random_grayscale",
    "random_perspective", "random_erasing", "five_crop", "ten_crop",
    "linear_transformation", "grayscale", "gaussian_blur",
]


def _batch(n=2, h=40, w=40, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, c), dtype=np.uint8)


def test_registry_covers_reference_names():
    missing = [n for n in REFERENCE_REGISTRY if n not in TRANSFORMS]
    assert not missing, f"missing transforms: {missing}"


@pytest.mark.parametrize("name,kwargs", [
    ("random_vertical_flip", {"p": 1.0}),
    ("random_rotation", {"degrees": 15}),
    ("random_affine", {"degrees": 10, "translate": (0.1, 0.1),
                       "scale": (0.9, 1.1), "shear": 5}),
    ("color_jitter", {"brightness": 0.4, "contrast": 0.4,
                      "saturation": 0.4, "hue": 0.1}),
    ("random_perspective", {"distortion_scale": 0.4, "p": 1.0}),
    ("random_erasing", {"p": 1.0}),
    ("random_grayscale", {"p": 1.0}),
    ("gaussian_blur", {"kernel_size": 3, "sigma": 1.0}),
])
def test_shape_preserving_transforms(name, kwargs):
    b = _batch()
    out = TRANSFORMS.build(name, **kwargs)(b)
    assert out.shape == b.shape


def test_pad_and_crops():
    b = _batch(h=32, w=32)
    assert TRANSFORMS.build("pad", padding=4)(b).shape == (2, 40, 40, 3)
    assert TRANSFORMS.build("five_crop", size=24)(b).shape == (10, 24, 24, 3)
    assert TRANSFORMS.build("ten_crop", size=24)(b).shape == (20, 24, 24, 3)


def test_vertical_flip_exact():
    b = _batch()
    out = TRANSFORMS.build("random_vertical_flip", p=1.0)(b)
    np.testing.assert_array_equal(out, b[:, ::-1])


def test_grayscale_channels_equal():
    out = TRANSFORMS.build("grayscale", num_output_channels=3)(_batch())
    np.testing.assert_allclose(out[..., 0], out[..., 1])
    np.testing.assert_allclose(out[..., 1], out[..., 2])


def test_linear_transformation_identity():
    b = _batch(n=1, h=4, w=4).astype(np.float32)
    d = b[0].size
    out = TRANSFORMS.build(
        "linear_transformation",
        transformation_matrix=np.eye(d), mean_vector=np.zeros(d))(b)
    np.testing.assert_allclose(out, b, rtol=1e-6)


def test_random_erasing_zeroes_a_region():
    b = np.full((1, 32, 32, 3), 200, np.uint8)
    out = TRANSFORMS.build("random_erasing", p=1.0, value=0)(b)
    assert (out == 0).any() and (out == 200).any()


def test_composition_transforms():
    b = _batch()
    inner = {"random_vertical_flip": {"p": 1.0}}
    applied = TRANSFORMS.build("random_apply", transforms=inner, p=1.0)(b)
    np.testing.assert_array_equal(applied, b[:, ::-1])
    chosen = TRANSFORMS.build("random_choice", transforms=inner)(b)
    np.testing.assert_array_equal(chosen, b[:, ::-1])
    ordered = TRANSFORMS.build("random_order", transforms=inner)(b)
    np.testing.assert_array_equal(ordered, b[:, ::-1])


def test_rotate_with_labels_quarter_turns():
    img = _batch(n=1)[0]
    r = rotate_with_labels([img, img, img, img], [0, 1, 2, 3])
    np.testing.assert_array_equal(r[0], img)
    np.testing.assert_array_equal(r[1], np.rot90(img, 1))
    np.testing.assert_array_equal(r[2], np.rot90(img, 2))
    np.testing.assert_array_equal(r[3], np.rot90(img, 3))
    assert random_rotate(img).shape == img.shape


def test_augmix_view_expansion():
    np.random.seed(0)
    b = _batch(n=2)
    fn = TRANSFORMS.build(
        "augmix",
        preprocess={"to_tensor": {}},
        n_views=3, severity=2)
    out = fn(b)
    assert out.shape == (6, 40, 40, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def test_augexpand_with_custom_funcs():
    np.random.seed(0)
    b = _batch(n=2)
    fn = TRANSFORMS.build(
        "augexpand",
        preprocess={"to_tensor": {}},
        custom_funcs=["random_rotate"], n_views=2)
    out = fn(b)
    assert out.shape == (4, 40, 40, 3)


def test_build_transform_ordered_composition():
    b = _batch(h=48, w=48)
    fn = build_transform({"resize": {"size": 40}, "center_crop": {"size": 32},
                          "to_tensor": {}})
    out = fn(b)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.float32
