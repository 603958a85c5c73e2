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
