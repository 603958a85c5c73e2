"""Pallas CC kernel vs the XLA reference labeling (interpret mode on CPU)."""

import cv2
import jax.numpy as jnp
import numpy as np

from video_classification_tpu.ops.components import label_components
from video_classification_tpu.ops.pallas_components import (
    fits_vmem,
    label_components_pallas,
)


def test_fits_vmem():
    assert fits_vmem(480, 640)
    assert not fits_vmem(4000, 4000)


def test_matches_xla_labeling():
    rng = np.random.RandomState(0)
    masks = []
    for i in range(4):
        noise = rng.rand(32, 40).astype(np.float32)
        blurred = cv2.GaussianBlur(noise, (0, 0), 3.0)
        masks.append(blurred > np.percentile(blurred, 65))
    masks = np.stack(masks)
    got = np.asarray(label_components_pallas(jnp.asarray(masks), None, True))
    for i in range(4):
        want = np.asarray(label_components(jnp.asarray(masks[i])))
        np.testing.assert_array_equal(got[i], want, err_msg=str(i))


def test_spiral_component():
    """A long snaking component needs many propagation steps to converge."""
    m = np.zeros((16, 16), bool)
    m[0, :] = True
    m[:, -1] = True
    m[-1, :] = True
    m[1:, 0] = False
    m[2:-1, 2] = True
    m[2, 2:-1] = False
    m[2, :3] = False
    got = np.asarray(label_components_pallas(jnp.asarray(m[None]), None, True))[0]
    want = np.asarray(label_components(jnp.asarray(m)))
    np.testing.assert_array_equal(got, want)


def _cv2_largest_bbox(mask):
    """Reference rule: largest boundingRect area over 8-connected components."""
    n, _, stats, _ = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), connectivity=8)
    best, area = None, 0
    for lbl in range(1, n):
        x, y, w, h = stats[lbl, :4]
        if w * h > area:
            best, area = (x, y, w, h), w * h
    return best


def test_extents_bbox_matches_cv2():
    """largest_component_bbox (extent propagation, both backends) == cv2."""
    from video_classification_tpu.ops.components import largest_component_bbox

    rng = np.random.RandomState(1)
    for i in range(6):
        noise = rng.rand(32, 40).astype(np.float32)
        blurred = cv2.GaussianBlur(noise, (0, 0), 2.0)
        mask = blurred > np.percentile(blurred, 70)
        want = _cv2_largest_bbox(mask)
        for backend in ("xla", "pallas_interpret"):
            bbox, valid = largest_component_bbox(
                jnp.asarray(mask), min_size=0, backend=backend)
            got = tuple(int(v) for v in np.asarray(bbox))
            assert bool(valid) == (want is not None), (i, backend)
            if want is not None:
                assert got == want, (i, backend, got, want)


def test_extents_spiral_and_empty():
    from video_classification_tpu.ops.components import largest_component_bbox

    m = np.zeros((16, 16), bool)
    m[0, :] = True
    m[:, -1] = True
    m[-1, :] = True
    m[2:-1, 2] = True
    m[2, :3] = False
    for backend in ("xla", "pallas_interpret"):
        bbox, valid = largest_component_bbox(jnp.asarray(m), min_size=0,
                                             backend=backend)
        assert bool(valid)
        assert tuple(int(v) for v in np.asarray(bbox)) == _cv2_largest_bbox(m)
    # All-background mask: invalid, zero bbox.
    z = np.zeros((8, 8), bool)
    bbox, valid = largest_component_bbox(jnp.asarray(z), min_size=0,
                                         backend="xla")
    assert not bool(valid) and np.asarray(bbox).tolist() == [0, 0, 0, 0]


def test_extents_min_size_rule():
    from video_classification_tpu.ops.components import largest_component_bbox

    m = np.zeros((40, 40), bool)
    m[5:15, 5:12] = True  # 7x10 bbox: below the 15 px rule
    bbox, valid = largest_component_bbox(jnp.asarray(m), backend="xla")
    assert not bool(valid)
    m[20:36, 20:36] = True  # 16x16: passes
    bbox, valid = largest_component_bbox(jnp.asarray(m), backend="xla")
    assert bool(valid) and np.asarray(bbox).tolist() == [20, 20, 16, 16]
