"""res2d / res3d model paths through the full Trainer (synthetic data, 8-dev mesh)."""

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.engine import Trainer
from video_classification_tpu.parallel import make_mesh


def _cfg(tmp_path, name, clip_len):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.CHALEARN.CLIP_LEN = clip_len
    cfg.CHALEARN.BATCH_SIZE = 8
    cfg.MODEL.NAME = name
    cfg.MODEL.R3D_INPUT = "CropLHand"
    cfg.MODEL.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 8
    cfg.DATA.SYNTHETIC_SEQ_LEN = 12
    return cfg


@pytest.mark.parametrize("name,clip_len", [
    ("res2d", 10),
    pytest.param("res3d", 4, marks=pytest.mark.slow),
])
def test_resnet_paths_train_and_eval(tmp_path, devices, name, clip_len):
    cfg = _cfg(tmp_path / name, name, clip_len)
    trainer = Trainer(cfg, mesh=make_mesh(cfg))
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    y = trainer.run_eval()
    assert y["ps"].shape[1] == 3
    assert 0.0 <= y["acc"] <= 1.0
