"""Full ensemble pipeline: train part streams -> dump eval materials -> fuse.

Exercises the reference's L5 -> L6 chain (train.py + train_sparse.py) end to end
on the synthetic in-memory dataset with tiny models: two crop streams train
briefly, ResultSaver pickles their uniform-sampling eval outputs for train/test,
SparseFusionDataset stacks them, SparseTrainer learns the per-class mixing.
"""

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.engine import (
    ResultSaver,
    SparseFusionDataset,
    SparseTrainer,
    Trainer,
)
from video_classification_tpu.engine.sparse import sparse_dir
from video_classification_tpu.parallel import make_mesh


def _stream_cfg(root, name, crop):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(root)
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.BATCH_SIZE = 8
    cfg.MODEL.NAME = name
    cfg.MODEL.R3D_INPUT = crop
    cfg.MODEL.DEPTH = 18
    cfg.MODEL.MAX_EPOCH = 1
    cfg.MODEL.LR = 1e-3
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 12
    cfg.DATA.SYNTHETIC_SEQ_LEN = 6
    return cfg


@pytest.mark.slow
def test_ensemble_end_to_end(tmp_path, devices):
    mesh = make_mesh(devices=devices)
    streams = [("slowfast-A", "CropLHand"), ("slowfast-B", "CropRHand")]
    cfgs = {name: _stream_cfg(tmp_path, name, crop) for name, crop in streams}

    # L5: train each stream one epoch (writes best-acc checkpoints).
    for cfg in cfgs.values():
        Trainer(cfg, mesh=mesh).train()

    # L6a: dump eval materials via ResultSaver with an injected cfg source.
    class FixedSaver(ResultSaver):
        def load_part_cfgs(self):
            yield from cfgs.values()

    FixedSaver(trainer_factory=lambda c: Trainer(c, mesh=mesh)).save_network_output()

    for name, _ in streams:
        for split in ("train", "test"):
            assert (sparse_dir(cfgs[name], split) / name).exists()

    # L6b: fusion training over the dumps.
    any_cfg = next(iter(cfgs.values()))
    ds = SparseFusionDataset(sparse_dir(any_cfg, "train"))
    assert ds.num_part == 2
    assert ds.num_class == 3
    st = SparseTrainer(any_cfg, batch_size=8)
    acc = st.test(epoch=0)
    assert 0.0 <= acc <= 1.0
    best = st.train(epochs=30)
    assert best >= acc - 1e-6  # best is monotone
