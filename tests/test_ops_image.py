"""Image-op tests, golden-checked against OpenCV where the reference used cv2."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_classification_tpu.ops import (
    cubic_resize,
    pad_to_square_resize,
    pad2x,
    normalize,
    denormalize_to_uint8,
    random_crop,
    random_crop_batch,
)


def _ref_pad_resize(img, new_size):
    """Reference `_pad_resize_img` (chalearn_dataset.py:60-71), verbatim in numpy."""
    h, w, c = img.shape
    m = max(h, w)
    nx = (m - w) // 2
    ny = (m - h) // 2
    new_img = np.zeros(shape=(m, m, c), dtype=img.dtype)
    new_img[ny : ny + h, nx : nx + w, :] = img
    return cv2.resize(new_img, (new_size, new_size), interpolation=cv2.INTER_CUBIC)


@pytest.mark.parametrize("in_hw,out_hw", [((48, 48), (64, 64)), ((100, 80), (64, 64)),
                                          ((32, 32), (192, 192)), ((128, 128), (64, 64))])
def test_cubic_resize_matches_cv2(in_hw, out_hw):
    rng = np.random.RandomState(0)
    img = rng.rand(*in_hw, 3).astype(np.float32)
    got = np.asarray(cubic_resize(jnp.asarray(img), out_hw))
    want = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_cubic_resize_uint8_close_to_cv2():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (60, 80, 3), dtype=np.uint8)
    got = np.asarray(cubic_resize(jnp.asarray(img), (128, 128)))
    got = np.clip(np.round(got), 0, 255)  # cv2 saturates uint8 output
    want = cv2.resize(img, (128, 128), interpolation=cv2.INTER_CUBIC).astype(np.float32)
    # cv2 uses fixed-point taps for uint8; allow 1 LSB.
    assert np.max(np.abs(got - want)) <= 1.0 + 1e-3


def test_cubic_resize_dynamic_in_size():
    """Traced content size on a larger canvas must equal the static crop resize."""
    rng = np.random.RandomState(2)
    content = rng.rand(40, 56, 3).astype(np.float32)
    canvas = np.zeros((64, 64, 3), np.float32)
    canvas[:40, :56] = content

    @jax.jit
    def run(c, h, w):
        return cubic_resize(c, (32, 32), in_hw=(h, w))

    got = np.asarray(run(jnp.asarray(canvas), 40, 56))
    want = np.asarray(cubic_resize(jnp.asarray(content), (32, 32)))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("hw", [(30, 50), (50, 30), (64, 64)])
def test_pad_to_square_resize_matches_reference(hw):
    rng = np.random.RandomState(3)
    img = rng.rand(*hw, 3).astype(np.float32)
    want = _ref_pad_resize(img, 64)
    got = np.asarray(pad_to_square_resize(jnp.asarray(img), 64))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_pad_to_square_resize_dynamic_hw():
    """Variable-size crop on a fixed canvas (the jit-able path)."""
    rng = np.random.RandomState(4)
    content = rng.rand(30, 50, 3).astype(np.float32)
    canvas = np.zeros((128, 128, 3), np.float32)
    canvas[:30, :50] = content

    @jax.jit
    def run(c, h, w):
        return pad_to_square_resize(c, 64, hw=(h, w))

    got = np.asarray(run(jnp.asarray(canvas), 30, 50))
    want = _ref_pad_resize(content, 64)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_pad2x_matches_reference():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (240, 320, 3), dtype=np.uint8)
    # pad_an_img (chalearn_image_to_padded.py:16-22)
    h, w, c = img.shape
    want = np.zeros((h * 2, w * 2, c), img.dtype)
    want[h // 2 : h // 2 + h, w // 2 : w // 2 + w] = img
    got = np.asarray(pad2x(jnp.asarray(img)))
    np.testing.assert_array_equal(got, want)


def test_normalize_roundtrip():
    x = np.arange(0, 256, dtype=np.uint8).reshape(16, 16, 1)
    y = np.asarray(normalize(jnp.asarray(x)))
    want = (x.astype(np.float32) / 255.0 - 0.45) / 0.225
    np.testing.assert_allclose(y, want, atol=1e-6)
    back = np.asarray(denormalize_to_uint8(jnp.asarray(y)))
    np.testing.assert_array_equal(back, x)


def test_random_crop_shape_and_content():
    key = jax.random.PRNGKey(0)
    clip = jnp.asarray(np.random.RandomState(6).rand(4, 64, 64, 21).astype(np.float32))
    out = random_crop(key, clip, size=64, padding=6)
    assert out.shape == (4, 64, 64, 21)
    # Same spatial offset must apply to every frame: check cross-frame consistency
    # by cropping a clip whose frames are identical.
    same = jnp.broadcast_to(clip[:1], clip.shape)
    out2 = np.asarray(random_crop(key, same, size=64, padding=6))
    for t in range(1, 4):
        np.testing.assert_array_equal(out2[t], out2[0])


def test_random_crop_batch_varies_per_sample():
    key = jax.random.PRNGKey(1)
    clips = jnp.asarray(np.random.RandomState(7).rand(8, 2, 32, 32, 3).astype(np.float32))
    out = np.asarray(random_crop_batch(key, clips, size=32, padding=3))
    assert out.shape == (8, 2, 32, 32, 3)
    # With padding, identical inputs should usually get different offsets.
    same = jnp.broadcast_to(clips[:1], clips.shape)
    out2 = np.asarray(random_crop_batch(key, same, size=32, padding=3))
    assert any(not np.array_equal(out2[i], out2[0]) for i in range(1, 8))


def test_random_crop_mxu_matches_slice_crop():
    """The one-hot-matmul crop (ops/image.random_crop_batch_mxu) == the
    dynamic-slice reference implementation, bit for bit — same key-derived
    offsets, same normalized-space zero fill (chalearn_dataset.py:41-46,73-87).
    One-hot matmuls are exact (each output is a single 1.0*v product)."""
    from video_classification_tpu.ops.image import normalize, random_crop_batch_mxu

    key = jax.random.PRNGKey(3)
    clips = jnp.asarray(
        np.random.RandomState(5).randint(0, 256, (4, 2, 32, 32, 21), np.uint8))
    xn = normalize(clips)
    want = np.asarray(random_crop_batch(key, xn, size=32, padding=3))
    got = np.asarray(random_crop_batch_mxu(key, xn, size=32, padding=3))
    np.testing.assert_array_equal(got, want)
    # crop smaller than the source, non-square frames
    clips2 = jnp.asarray(
        np.random.RandomState(7).randint(0, 256, (3, 2, 24, 40, 5), np.uint8))
    xn2 = normalize(clips2)
    want2 = np.asarray(random_crop_batch(key, xn2, size=16, padding=2))
    got2 = np.asarray(random_crop_batch_mxu(key, xn2, size=16, padding=2))
    np.testing.assert_array_equal(got2, want2)


def test_random_crop_mxu_space_to_depth_layout():
    """space_to_depth=True == s2d repack of the plain crop: out[..., Y, X,
    (py, px, c)] == crop[..., 2Y+py, 2X+px, c] (the SpaceToDepthConv input
    layout, models/layers.py)."""
    from video_classification_tpu.ops.image import normalize, random_crop_batch_mxu

    key = jax.random.PRNGKey(9)
    clips = jnp.asarray(
        np.random.RandomState(11).randint(0, 256, (3, 2, 32, 32, 5), np.uint8))
    xn = normalize(clips)
    plain = np.asarray(random_crop_batch_mxu(key, xn, size=24, padding=2))
    packed = np.asarray(
        random_crop_batch_mxu(key, xn, size=24, padding=2, space_to_depth=True))
    n, t, s, _, c = plain.shape
    want = plain.reshape(n, t, s // 2, 2, s // 2, 2, c).transpose(
        0, 1, 2, 4, 3, 5, 6).reshape(n, t, s // 2, s // 2, 4 * c)
    np.testing.assert_array_equal(packed, want)


@pytest.mark.parametrize("dy,dx", [(0, 0), (5, 3), (-4, -7), (20, -2), (60, 60)])
def test_shift2d_matches_numpy_window(dy, dx):
    """shift2d == a zero-filled numpy window copy for positive, negative, and
    fully out-of-range offsets (out[y, x] = img[y+dy, x+dx])."""
    from video_classification_tpu.ops.image import shift2d

    rng = np.random.RandomState(8)
    img = rng.rand(30, 40, 3).astype(np.float32)
    oh, ow = 24, 28
    want = np.zeros((oh, ow, 3), np.float32)
    for y in range(oh):
        for x in range(ow):
            sy, sx = y + dy, x + dx
            if 0 <= sy < 30 and 0 <= sx < 40:
                want[y, x] = img[sy, sx]
    got = np.asarray(shift2d(jnp.asarray(img), dy, dx, (oh, ow)))
    np.testing.assert_array_equal(got, want)


def test_shift2d_uint8_exact():
    """uint8 goes through bf16 operands; integers 0..255 are exact in bf16 so
    the one-hot matmul must reproduce the bytes bit-for-bit."""
    from video_classification_tpu.ops.image import shift2d

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (33, 47, 21), dtype=np.uint8)
    got = np.asarray(shift2d(jnp.asarray(img), 6, -3, (16, 50)))
    want = np.zeros((16, 50, 21), np.uint8)
    for y in range(16):
        for x in range(50):
            sy, sx = y + 6, x - 3
            if 0 <= sy < 33 and 0 <= sx < 47:
                want[y, x] = img[sy, sx]
    np.testing.assert_array_equal(got, want)


def test_shift2d_traced_offsets_under_jit():
    from video_classification_tpu.ops.image import shift2d

    rng = np.random.RandomState(10)
    img = jnp.asarray(rng.rand(20, 20, 2).astype(np.float32))

    @jax.jit
    def run(im, dy, dx):
        return shift2d(im, dy, dx, (12, 12))

    got = np.asarray(run(img, jnp.int32(4), jnp.int32(-2)))
    want = np.asarray(shift2d(img, 4, -2, (12, 12)))
    np.testing.assert_array_equal(got, want)
