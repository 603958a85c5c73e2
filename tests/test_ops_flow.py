"""Optical-flow and connected-components kernel tests.

The flow solver is validated semantically (recovers known synthetic translations)
and the uint8 encoding bit-for-bit against the reference's numpy formula; the
CC-bbox kernel is golden-checked against the reference's cv2
findContours/boundingRect/argmax/min-size chain.
"""

import cv2
import jax.numpy as jnp
import numpy as np

from video_classification_tpu.ops.flow import (
    FlowParams,
    coarse2fine_flow,
    encode_flow_uint8,
    flow_energy_filter,
    video_flow_uint8,
)
from video_classification_tpu.ops.components import (
    MIN_PART_SIZE,
    label_components,
    largest_component_bbox,
    part_mask,
)

FAST_PARAMS = FlowParams(n_outer=3, n_sor=15)  # lighter for CI


def _shift_image(img, dx, dy):
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, m, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


def test_flow_recovers_translation():
    rng = np.random.RandomState(0)
    base = cv2.GaussianBlur(rng.rand(48, 64, 3).astype(np.float32), (0, 0), 2.0)
    dx, dy = 1.5, -1.0
    shifted = _shift_image(base, dx, dy)
    u, v = coarse2fine_flow(jnp.asarray(base[None]), jnp.asarray(shifted[None]), FAST_PARAMS)
    # Interior median should be close to the true shift.
    ui = np.asarray(u)[0, 8:-8, 8:-8]
    vi = np.asarray(v)[0, 8:-8, 8:-8]
    assert abs(np.median(ui) - dx) < 0.5, np.median(ui)
    assert abs(np.median(vi) - dy) < 0.5, np.median(vi)


def test_flow_zero_motion():
    rng = np.random.RandomState(1)
    img = rng.rand(40, 40, 3).astype(np.float32)
    u, v = coarse2fine_flow(jnp.asarray(img[None]), jnp.asarray(img[None]), FAST_PARAMS)
    assert np.abs(np.asarray(u)).max() < 0.1
    assert np.abs(np.asarray(v)).max() < 0.1


def test_flow_batched():
    rng = np.random.RandomState(2)
    a = cv2.GaussianBlur(rng.rand(40, 48, 3).astype(np.float32), (0, 0), 2.0)
    b = _shift_image(a, 2.0, 0.0)
    im1 = jnp.asarray(np.stack([a, a]))
    im2 = jnp.asarray(np.stack([a, b]))
    u, v = coarse2fine_flow(im1, im2, FAST_PARAMS)
    assert np.abs(np.asarray(u)[0]).max() < 0.2  # pair 0: no motion
    assert abs(np.median(np.asarray(u)[1, 8:-8, 8:-8]) - 2.0) < 0.5


def test_encode_flow_matches_reference_formula():
    rng = np.random.RandomState(3)
    f = (rng.rand(2, 8, 8, 2).astype(np.float32) - 0.5) * 16  # values beyond ±5
    u, v = f[..., 0], f[..., 1]
    got = np.asarray(encode_flow_uint8(jnp.asarray(u), jnp.asarray(v)))

    # Reference formula, verbatim (chalearn_video_to_flow.py:79-93).
    for b in range(2):
        U = np.clip(u[b], -5, 5)
        V = np.clip(v[b], -5, 5)
        M = np.sqrt(np.square(U / 5) + np.square(V / 5)) / np.sqrt(2)
        M = np.clip(M, 0, 1)
        f01 = (np.stack([np.clip(u[b], -5, 5), np.clip(v[b], -5, 5)], -1) + 5) / 10
        rgb = np.concatenate([f01, M[..., None]], axis=2) * 255.0
        want = rgb.astype(np.uint8)
        # XLA may fuse the affine chain with FMA, flipping truncation at exact
        # integer boundaries; allow 1 LSB.
        assert np.abs(got[b].astype(int) - want.astype(int)).max() <= 1


def test_video_flow_first_frame_convention():
    rng = np.random.RandomState(4)
    frames = rng.randint(0, 255, (3, 40, 40, 3), dtype=np.uint8)
    out = np.asarray(video_flow_uint8(jnp.asarray(frames), FAST_PARAMS))
    assert out.shape == (3, 40, 40, 3)
    # Frame 0 flows against itself -> zero flow -> U=V=127, mag=0.
    assert np.abs(out[0, :, :, 0].astype(int) - 127).max() <= 1
    assert np.abs(out[0, :, :, 1].astype(int) - 127).max() <= 1
    assert out[0, :, :, 2].max() <= 1


def test_flow_energy_filter():
    t = 20
    imgs = np.zeros((t, 8, 8, 3), np.uint8)
    energies = np.arange(t)[::-1]  # frame 0 has highest energy
    for i in range(t):
        imgs[i, :, :, 2] = energies[i]
    keep, energy = flow_energy_filter(jnp.asarray(imgs))
    keep = np.asarray(keep)
    # top 30% of 20 = 6 < min 8 -> keep 8 highest = frames 0..7.
    assert len(keep) == 8
    np.testing.assert_array_equal(np.sort(keep), np.arange(8))
    np.testing.assert_allclose(np.asarray(energy), energies, atol=1e-5)


# -- connected components -------------------------------------------------------------


def _ref_largest_bbox(mask):
    """Reference rule (chalearn_iuv_to_crop.py:121-149), verbatim via cv2."""
    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
    )
    if len(contours) == 0:
        return None
    area, xywh = [], []
    for contour in contours:
        x, y, w, h = cv2.boundingRect(contour)
        area.append(w * h)
        xywh.append((x, y, w, h))
    amax = int(np.argmax(area))
    x, y, w, h = xywh[amax]
    if w < MIN_PART_SIZE or h < MIN_PART_SIZE:
        return None
    return (x, y, w, h)


def test_label_components_two_blobs():
    mask = np.zeros((32, 32), bool)
    mask[2:6, 2:6] = True
    mask[20:30, 12:28] = True
    labels = np.asarray(label_components(jnp.asarray(mask)))
    l1 = labels[2:6, 2:6]
    l2 = labels[20:30, 12:28]
    assert (l1 == l1[0, 0]).all()
    assert (l2 == l2[0, 0]).all()
    assert l1[0, 0] != l2[0, 0]
    inf = np.iinfo(np.int32).max
    assert (labels[~mask] == inf).all()


def test_largest_bbox_matches_cv2_random():
    rng = np.random.RandomState(0)
    for trial in range(8):
        # Random blobby masks via thresholded blurred noise.
        noise = rng.rand(48, 48).astype(np.float32)
        blurred = cv2.GaussianBlur(noise, (0, 0), 4.0)
        mask = blurred > np.percentile(blurred, 70)
        want = _ref_largest_bbox(mask)
        bbox, valid = largest_component_bbox(jnp.asarray(mask))
        bbox, valid = np.asarray(bbox), bool(valid)
        if want is None:
            assert not valid, (trial, bbox)
        else:
            assert valid, (trial, want)
            np.testing.assert_array_equal(bbox, np.asarray(want), err_msg=str(trial))


def test_largest_bbox_rejects_small():
    mask = np.zeros((32, 32), bool)
    mask[5:15, 5:12] = True  # 7 wide < 15
    bbox, valid = largest_component_bbox(jnp.asarray(mask))
    assert not bool(valid)


def test_part_mask():
    I = np.zeros((8, 8), np.int32)
    I[:2] = 4
    I[6:] = 21
    m = np.asarray(part_mask(jnp.asarray(I), [4, 21, 19, 17, 15]))
    want = (I == 4) | (I == 21)
    np.testing.assert_array_equal(m, want)
