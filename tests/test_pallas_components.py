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
