"""RAFT-in-JAX tests: shapes, jit, correlation/lookup/upsample math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_classification_tpu.models.raft import (
    RAFT,
    convex_upsample,
    correlation_pyramid,
    lookup,
)


def test_correlation_pyramid_math():
    rng = np.random.RandomState(0)
    f1 = rng.randn(1, 4, 6, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 6, 8).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=2)
    assert pyr[0].shape == (1, 4, 6, 4, 6)
    assert pyr[1].shape == (1, 4, 6, 2, 3)
    # Spot-check one entry: corr[0, i, j, k, l] == <f1[i,j], f2[k,l]> / sqrt(C).
    want = f1[0, 1, 2] @ f2[0, 3, 4] / np.sqrt(8)
    np.testing.assert_allclose(float(pyr[0][0, 1, 2, 3, 4]), want, rtol=1e-5)


def test_lookup_center_matches_direct():
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 4, 4, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 4, 8).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=1)
    # coords = identity grid: center of the radius-1 window (index 4 of 9) is
    # corr at the same pixel.
    grid = jnp.stack(
        jnp.meshgrid(jnp.arange(4.0), jnp.arange(4.0), indexing="xy"), axis=-1
    )[None]
    out = np.asarray(lookup(pyr, grid, radius=1))
    assert out.shape == (1, 4, 4, 9)
    for i in range(4):
        for j in range(4):
            np.testing.assert_allclose(
                out[0, i, j, 4], float(pyr[0][0, i, j, i, j]), rtol=1e-5
            )


def test_convex_upsample_constant():
    """A constant coarse flow upsamples to the same constant x8 (away from the
    zero-padded border, matching torch's unfold(padding=1) semantics)."""
    flow = jnp.full((1, 4, 4, 2), 1.5)
    mask = jnp.zeros((1, 4, 4, 64 * 9))
    up = np.asarray(convex_upsample(flow, mask))
    assert up.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(up[:, 8:24, 8:24], 12.0, atol=1e-5)  # 1.5 * 8


@pytest.mark.slow
def test_raft_forward_shapes():
    model = RAFT(num_iters=2)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, img)
    up, coarse = jax.jit(lambda v, a, b: model.apply(v, a, b))(variables, img, img)
    assert up.shape == (1, 32, 48, 2)
    assert coarse.shape == (1, 4, 6, 2)
    assert np.all(np.isfinite(np.asarray(up)))
    # Identical images + zero-init flow head => small flow magnitudes.
    assert np.abs(np.asarray(up)).mean() < 50.0


@pytest.mark.slow
def test_v2_flow_converter_raft_method(tmp_path):
    """ConvertVideoToFlow(method='raft') produces the same on-disk layout."""
    import cv2
    from video_classification_tpu.config import get_cfg
    from video_classification_tpu.v2 import ConvertVideoToFlow, VideoIO

    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    folder = tmp_path / "1_Sample" / "train" / "001"
    folder.mkdir(parents=True)
    writer = cv2.VideoWriter(str(folder / "M_00001.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 10, (36, 28))
    rng = np.random.RandomState(0)
    for _ in range(4):
        writer.write(rng.randint(0, 255, (28, 36, 3), dtype=np.uint8))
    writer.release()

    ConvertVideoToFlow(cfg, method="raft", raft_iters=1).convert()
    out = tmp_path / "2_Flow_New" / "train" / "001"
    assert (out / "0_M_00001.avi").exists() and (out / "1_M_00001.avi").exists()
    assert VideoIO.frame_count(out / "0_M_00001.avi") == 3
