"""Prefetch pipeline tests."""

import numpy as np
import pytest

from video_classification_tpu.data.pipeline import prefetch_to_device
from video_classification_tpu.parallel import make_mesh


def _batches(n):
    for i in range(n):
        yield {"x": np.full((8, 4), i, np.float32), "label": np.arange(8, dtype=np.int32)}


def test_prefetch_yields_all_sharded(devices):
    mesh = make_mesh(devices=devices)
    out = list(prefetch_to_device(_batches(5), mesh, depth=2))
    assert len(out) == 5
    for i, batch in enumerate(out):
        assert float(batch["x"][0, 0]) == i
        # Sharded over the data axis.
        assert len(batch["x"].sharding.device_set) == 8


def test_prefetch_depth_zero_is_sync(devices):
    mesh = make_mesh(devices=devices)
    out = list(prefetch_to_device(_batches(3), mesh, depth=0))
    assert len(out) == 3


def test_prefetch_propagates_errors(devices):
    mesh = make_mesh(devices=devices)

    def bad():
        yield {"x": np.zeros((8, 4), np.float32)}
        raise ValueError("boom")

    it = prefetch_to_device(bad(), mesh, depth=2)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_multi_axis_mesh_batch_sharding(devices):
    """2-axis mesh (e.g. DCN slice x ICI data): batch shards over both axes."""
    from video_classification_tpu.config import get_cfg
    from video_classification_tpu.parallel import pad_batch_for_mesh, shard_batch

    cfg = get_cfg()
    cfg.TPU.MESH_SHAPE = [2, -1]
    cfg.TPU.MESH_AXES = ["slice", "data"]
    mesh = make_mesh(cfg, devices=devices)
    assert mesh.shape["slice"] == 2 and mesh.shape["data"] == 4

    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"])[:, 0], np.arange(16))

    ragged = {"x": np.zeros((5, 1), np.float32)}
    padded, n = pad_batch_for_mesh(ragged, mesh)
    assert n == 5 and padded["x"].shape[0] == 8
