"""End-to-end engine tests on the 8-device virtual mesh.

Uses depth-18 (1,1,1,1-stage) models and the synthetic in-memory dataset to keep
single-core CI compile times sane while exercising the full train/eval/checkpoint
path, sharded over all 8 virtual devices.
"""

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.engine import Trainer
from video_classification_tpu.parallel import make_mesh


def _tiny_cfg(tmp_path, name="slowfast-test"):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.BATCH_SIZE = 8
    cfg.MODEL.NAME = name
    cfg.MODEL.R3D_INPUT = "CropLHand"
    cfg.MODEL.DEPTH = 18
    cfg.MODEL.MAX_EPOCH = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 16
    cfg.DATA.SYNTHETIC_SEQ_LEN = 6
    return cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory, devices):
    tmp = tmp_path_factory.mktemp("engine")
    cfg = _tiny_cfg(tmp)
    mesh = make_mesh(cfg)
    assert mesh.shape["data"] == 8
    trainer = Trainer(cfg, mesh=mesh)
    metrics = trainer.train_epoch(0)
    return cfg, trainer, metrics


@pytest.mark.slow
def test_train_step_runs_sharded(trained):
    _, trainer, metrics = trained
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["acc"] <= 1.0


@pytest.mark.slow
def test_second_epoch_improves_loss(trained):
    _, trainer, first = trained
    second = None
    for _ in range(4):
        second = trainer.train_epoch(1)
    assert np.isfinite(second["loss"])
    # Synthetic data is trivially separable; loss must drop after 5 epochs.
    assert second["loss"] < first["loss"]


@pytest.mark.slow
def test_run_eval_structure(trained):
    cfg, trainer, _ = trained
    y = trainer.run_eval()
    assert set(y) == {"ps", "t", "acc", "sv"}
    n_clips = sum(y["sv"])
    assert y["ps"].shape == (n_clips, cfg.CHALEARN.NUM_CLASS)
    assert y["t"].shape == (n_clips,)
    np.testing.assert_allclose(y["ps"].sum(axis=1), 1.0, atol=1e-5)  # softmax rows
    assert 0.0 <= y["acc"] <= 1.0
    assert len(y["sv"]) == 16


@pytest.mark.slow
def test_checkpoint_save_load(trained, tmp_path):
    cfg, trainer, _ = trained
    trainer._save(epoch=0, acc=0.5)
    from video_classification_tpu.engine.checkpoint import ckpt_dir

    files = list(ckpt_dir(cfg).glob("*.ckpt"))
    assert files, "checkpoint not written"

    # A fresh trainer must restore from the checkpoint (tier 1).
    trainer2 = Trainer(cfg, mesh=trainer.mesh)
    import jax

    p1 = jax.device_get(trainer.state.params)
    p2 = jax.device_get(trainer2.state.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_htah_fallback(tmp_path, devices):
    """Tier 2: a part stream with no own ckpt loads the slowfast-HTAH ckpt."""
    cfg_htah = _tiny_cfg(tmp_path, name="slowfast-HTAH")
    mesh = make_mesh(cfg_htah)
    t1 = Trainer(cfg_htah, mesh=mesh)
    t1._save(epoch=0, acc=0.9)

    cfg_part = _tiny_cfg(tmp_path, name="slowfast-LHand")
    t2 = Trainer(cfg_part, mesh=mesh)
    import jax

    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    leaves1 = jax.tree.leaves(p1)
    leaves2 = jax.tree.leaves(p2)
    assert any(
        np.array_equal(np.asarray(a), np.asarray(b))
        and np.asarray(a).size > 1
        for a, b in zip(leaves1, leaves2)
    )
    # Head proj identical (same class count).
    np.testing.assert_array_equal(
        np.asarray(p1["head"]["proj"]["kernel"]),
        np.asarray(p2["head"]["proj"]["kernel"]),
    )
