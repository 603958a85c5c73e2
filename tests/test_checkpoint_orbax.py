"""Orbax checkpoint backend round-trip (the multi-host production path)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_classification_tpu.config import get_cfg
from video_classification_tpu.engine.checkpoint import (
    load_checkpoint_bytes,
    save_checkpoint,
)


def test_orbax_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.MODEL.NAME = "orbax-test"
    rng = np.random.RandomState(0)
    variables = {
        "params": {"dense": {"kernel": jnp.asarray(rng.randn(4, 3).astype(np.float32)),
                              "bias": jnp.zeros(3)}},
        "batch_stats": {"bn": {"mean": jnp.ones(3), "var": jnp.full(3, 2.0)}},
    }
    path = save_checkpoint(cfg, variables, epoch=5, acc=0.75, backend="orbax")
    assert path is not None and path.is_dir()
    assert path.name == "acc0.750_e5.ckpt"

    template = jax.tree.map(jnp.zeros_like, variables)
    out = load_checkpoint_bytes(path, template)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["dense"]["kernel"]),
        np.asarray(variables["params"]["dense"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["bn"]["var"]), np.full(3, 2.0)
    )
