"""End-to-end: the real DensePose-equivalent provider drives the IUV + crop stages.

Weights are untrained (no converted checkpoint available offline), so detections
are arbitrary — what this verifies is the full contract: network inference ->
provider post-processing -> reference-schema pkls -> crop stage consumes them
without falling over (including the no-detection path).
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.data.fixture import generate_raw_fixture
from video_classification_tpu.detect import DensePoseIUVProvider
from video_classification_tpu.pipeline import (
    image_to_padded,
    iuv_to_crop,
    padded_to_iuv,
    sample_data,
    video_to_flow,
    video_to_images,
)
from video_classification_tpu.ops.flow import FlowParams


@pytest.mark.slow
def test_densepose_provider_in_pipeline(tmp_path):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    generate_raw_fixture(cfg, num_videos_per_set=1, num_classes=1, num_frames=5,
                         hw=(32, 48))
    sample_data(cfg, sets=("train",))
    video_to_images(cfg)
    video_to_flow(cfg, FlowParams(n_outer=1, n_sor=4, min_width=16))
    image_to_padded(cfg)

    # Tiny budgets + no ResizeShortestEdge: contract test, not accuracy.
    provider = DensePoseIUVProvider(depth=50, pre_nms_topk=64, post_nms_topk=8,
                                    max_detections=4, chart_pooler_size=14,
                                    min_size=0)
    padded_to_iuv(cfg, provider, sets=("train",))

    pkl = Path(tmp_path) / "4_IUV" / "train" / "001.pkl"
    assert pkl.exists()
    with pkl.open("rb") as f:
        items = pickle.load(f)
    assert len(items) == 1  # 5 frames, interval 5 -> frame 0 only
    item = items[0]
    assert item["pred_boxes_XYXY"].ndim == 2 and item["pred_boxes_XYXY"].shape[1] == 4
    if item["pred_boxes_XYXY"].shape[0] > 0:
        labels = item["pred_densepose"][0]["labels"]
        uv = item["pred_densepose"][0]["uv"]
        x1, y1, x2, y2 = item["pred_boxes_XYXY"][int(np.argmax(item["scores"]))].astype(int)
        assert labels.shape == (max(y2 - y1, 1), max(x2 - x1, 1))
        assert uv.shape == (2,) + labels.shape
        assert labels.max() <= 24
        assert 0.0 <= uv.min() and uv.max() <= 1.0

    # Crop stage must handle whatever the provider produced (incl. no detections).
    iuv_to_crop(cfg, sets=("train",))
