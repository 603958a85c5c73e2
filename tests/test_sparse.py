"""Sparse-fusion pipeline tests: materials dump -> dataset stack -> fusion training."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.engine.sparse import (
    SparseFusionDataset,
    SparseTrainer,
    sparse_dir,
)


def _make_materials(cfg, num_parts=3, num_videos=10, clips_per_video=2, num_class=5,
                    seed=0):
    """Synthesize per-part eval pickles with a learnable structure: part 0 is a
    strong classifier, the others are noise — fusion should find it."""
    rng = np.random.RandomState(seed)
    n = num_videos * clips_per_video
    t = np.repeat(rng.randint(0, num_class, num_videos), clips_per_video).astype(np.int64)
    sv = [clips_per_video] * num_videos
    for part in range(num_parts):
        logits = rng.randn(n, num_class).astype(np.float32)
        if part == 0:
            logits[np.arange(n), t] += 4.0  # strong signal
        ps = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        for name_of_set in ("train", "test"):
            d = sparse_dir(cfg, name_of_set)
            d.mkdir(parents=True, exist_ok=True)
            with (d / f"slowfast-part{part}").open("wb") as f:
                pickle.dump({"ps": ps, "t": t, "acc": 0.0, "sv": sv}, f)
    return t, sv


@pytest.fixture()
def sparse_cfg(tmp_path):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    return cfg


def test_sparse_dataset_stacking(sparse_cfg):
    t, sv = _make_materials(sparse_cfg)
    ds = SparseFusionDataset(sparse_dir(sparse_cfg, "train"))
    assert (ds.num_part, ds.num_n, ds.num_class) == (3, 20, 5)
    np.testing.assert_array_equal(ds.T, t)
    np.testing.assert_array_equal(ds.sv, sv)
    x, labels = ds.as_arrays()
    assert x.shape == (20, 3, 5)
    np.testing.assert_array_equal(labels, t)


def test_sparse_trainer_learns(sparse_cfg):
    _make_materials(sparse_cfg)
    trainer = SparseTrainer(sparse_cfg, batch_size=8)
    acc0 = trainer.test(epoch=0)
    best = trainer.train(epochs=800)  # reference runs 2000 (train_sparse.py:172)
    # Part 0 perfectly predicts the label; fused accuracy must become high.
    assert best >= max(acc0, 0.9), (acc0, best)
    # Best-acc checkpoint written.
    ckpts = list(Path(trainer.ckpt_folder).iterdir())
    assert ckpts


def test_sparse_trainer_aggregation_uses_videos(sparse_cfg):
    # With clips_per_video=2, accuracy is over videos (10), not clips (20).
    _make_materials(sparse_cfg, num_videos=10, clips_per_video=2)
    trainer = SparseTrainer(sparse_cfg, batch_size=8)
    trainer.test(epoch=0)
    assert len(trainer.test_dataset.sv) == 10


def test_epoch_batch_plan_each_sample_once():
    """Pad+mask plan: one epoch touches every sample exactly once (the
    reference's short-final-batch semantics, train_sparse.py:153-182)."""
    from video_classification_tpu.engine.sparse import epoch_batch_plan

    for n, bs in ((20, 8), (8, 8), (5, 8), (16, 8), (1, 500)):
        num_batches, pad = epoch_batch_plan(n, bs)
        assert num_batches * bs == n + pad
        assert 0 <= pad < bs
        # Simulate the scan's index/weight windows over a permutation.
        perm = list(range(n)) + [0] * pad
        weights = [1.0] * n + [0.0] * pad
        seen = []
        for i in range(num_batches):
            idx = perm[i * bs:(i + 1) * bs]
            wb = weights[i * bs:(i + 1) * bs]
            seen.extend(j for j, w in zip(idx, wb) if w > 0)
        assert sorted(seen) == list(range(n))
