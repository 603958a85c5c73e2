"""Temporal sequence-parallel conv3d == unsharded conv3d, on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_classification_tpu.parallel import make_mesh
from video_classification_tpu.parallel.temporal import conv3d_temporal_sharded


@pytest.mark.parametrize("kt", [1, 3])
def test_temporal_sharded_conv_matches_global(devices, kt):
    mesh = make_mesh(devices=devices)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 4, 4, 3).astype(np.float32))  # T=16 over 8 devs
    w = jnp.asarray(rng.randn(kt, 1, 1, 3, 5).astype(np.float32) * 0.1)

    got = np.asarray(conv3d_temporal_sharded(x, w, mesh))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1, 1),
            padding=[(kt // 2, kt // 2), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_temporal_sharded_spatial_kernel(devices):
    mesh = make_mesh(devices=devices)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 2, 4).astype(np.float32) * 0.1)
    got = np.asarray(conv3d_temporal_sharded(x, w, mesh))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
