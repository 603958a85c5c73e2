"""Train-to-accuracy proxy tests (VERDICT r2 next #3).

The reference's whole point is 0.76 top-1 on ChaLearn IsoGD
(`/root/reference/train.py:133`); real parity needs real data and weights
(impossible under zero egress). The strongest available proxy: the synthetic
fixtures encode the label in pixel brightness (in-memory:
data/dataset.py:133-138; raw videos: data/fixture.generate_raw_fixture
class_sep), so a depth-18 SlowFast must overfit to >=0.9 *video eval
accuracy* in a bounded epoch budget, on both the offline and online
(DATA.BACKEND='online') paths.

These tests fail if any semantic link in the chain breaks — normalization
(mm.normalize_and_prepare), RandomCrop, label off-by-one, clip sampling, the
per-video mean-score eval aggregation — which shape tests cannot catch.
"""

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.engine import Trainer


def _overfit(trainer, max_epochs: int, target: float = 0.9) -> float:
    acc = 0.0
    for epoch in range(max_epochs):
        trainer.train_epoch(epoch)
        acc = float(trainer.run_eval()["acc"])
        if acc >= target:
            break
    return acc


@pytest.mark.slow
def test_offline_overfits_synthetic(tmp_path):
    """Offline (in-memory synthetic) path reaches >=0.9 video accuracy."""
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.BATCH_SIZE = 8
    cfg.MODEL.NAME = "slowfast-overfit"
    cfg.MODEL.R3D_INPUT = "CropLHand"  # 64 px: cheap on the 1-core host
    cfg.MODEL.DEPTH = 18
    cfg.MODEL.LR = 3e-3
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 24
    cfg.DATA.SYNTHETIC_SEQ_LEN = 6
    trainer = Trainer(cfg)
    acc = _overfit(trainer, max_epochs=30)
    assert acc >= 0.9, f"offline path failed to overfit: eval acc {acc}"


@pytest.mark.slow
def test_online_overfits_raw_videos(tmp_path):
    """Online (zero-stage-folder) path reaches >=0.9 video accuracy from raw
    M_/K_ videos through the fused device preprocessing graph."""
    from video_classification_tpu.data.fixture import generate_raw_fixture
    from video_classification_tpu.pipeline.stages import sample_data

    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.CHALEARN.NUM_CLASS = 2
    cfg.CHALEARN.SAMPLE_CLASS = 2
    cfg.CHALEARN.CLIP_LEN = 2
    cfg.CHALEARN.BATCH_SIZE = 8
    cfg.MODEL.NAME = "slowfast-overfit-online"
    cfg.MODEL.R3D_INPUT = "CropLHand"
    cfg.MODEL.DEPTH = 18
    cfg.MODEL.LR = 3e-3
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.BACKEND = "online"
    cfg.DATA.FLOW_OUTER = 1
    cfg.DATA.FLOW_SOR = 2
    cfg.DATA.FLOW_MIN_WIDTH = 16
    generate_raw_fixture(cfg, num_videos_per_set=8, num_classes=2,
                         num_frames=12, hw=(64, 96), sets=("train", "test"))
    sample_data(cfg, sets=("train", "test"))
    trainer = Trainer(cfg)
    acc = _overfit(trainer, max_epochs=15)
    assert acc >= 0.9, f"online path failed to overfit: eval acc {acc}"


@pytest.mark.slow
def test_online_overfits_densepose_detector_path(tmp_path):
    """VERDICT r4 next #8: the full raw-video -> DensePose-class detector ->
    crop -> train chain reaches >=0.9 video accuracy, not just a finite loss.

    An untrained DensePose net emits arbitrary boxes that destroy the
    synthetic label signal, so the detections are FROZEN to the synthetic
    geometry by pre-seeding the per-video detector cache
    (OnlineVideoDataset._det_cache — the exact structure
    _detections_for reads). Every clip still flows through the
    DensePoseOnlineDetector wiring: its heatmap-size contract, the cache
    lookup/assembly into Detections, and the fused device crop graph. The
    zero-detector-calls assertion proves the cache really held (a miss would
    silently swap garbage boxes back in and this test would fail at the
    accuracy gate anyway)."""
    import numpy as np

    from video_classification_tpu.data.fixture import generate_raw_fixture
    from video_classification_tpu.pipeline.online import (
        DensePoseOnlineDetector, OnlineVideoDataset, SyntheticOnlineDetector)
    from video_classification_tpu.pipeline.stages import sample_data

    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.CHALEARN.NUM_CLASS = 2
    cfg.CHALEARN.SAMPLE_CLASS = 2
    cfg.CHALEARN.CLIP_LEN = 2
    cfg.CHALEARN.BATCH_SIZE = 8
    cfg.MODEL.NAME = "slowfast-overfit-dp"
    cfg.MODEL.R3D_INPUT = "CropLHand"
    cfg.MODEL.DEPTH = 18
    cfg.MODEL.LR = 3e-3
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.BACKEND = "online"
    cfg.DATA.FLOW_OUTER = 1
    cfg.DATA.FLOW_SOR = 2
    cfg.DATA.FLOW_MIN_WIDTH = 16
    num_frames = 12
    generate_raw_fixture(cfg, num_videos_per_set=8, num_classes=2,
                         num_frames=num_frames, hw=(64, 96),
                         sets=("train", "test"))
    sample_data(cfg, sets=("train", "test"))

    datasets = []

    def make_ds(cfg, split):
        det = DensePoseOnlineDetector(
            cfg, depth=50, pre_nms_topk=32, post_nms_topk=8,
            chart_pooler_size=14, batch_size=2, allow_random_init=True)
        ds = OnlineVideoDataset(cfg, split, detector=det)
        geom = SyntheticOnlineDetector(heatmap_size=det.heatmap_size)
        d = geom(np.zeros((1, 128, 192, 3), np.uint8))
        row = (np.asarray(d.boxes_xyxy[0]), np.asarray(d.valid[0]),
               np.asarray(d.charts[0]), np.asarray(d.uv[0]))
        for vid in range(len(ds)):  # capacity 8 >= 8 videos: never evicted
            ds._det_cache[vid] = {r: row for r in range(num_frames)}
        datasets.append(ds)
        return ds

    trainer = Trainer(cfg, dataset_factory=make_ds)
    acc = _overfit(trainer, max_epochs=15)
    assert acc >= 0.9, f"densepose-path failed to overfit: eval acc {acc}"
    assert [ds.detector_calls for ds in datasets] == [0, 0], (
        "detector cache missed: frozen-geometry premise violated")
