"""v2 (video-native) slice tests: VideoIO, converters, box algebra, dataset, trainer."""

import pickle
import random
from pathlib import Path

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.data.fixture import generate_raw_fixture
from video_classification_tpu.ops.flow import FlowParams
from video_classification_tpu.pipeline import SyntheticIUVProvider
from video_classification_tpu.v2 import (
    ChalearnGestureDataset,
    ConvertIuvPklToPartBox,
    ConvertIuvPklToUvVideo,
    ConvertVideoToFlow,
    ConvertVideoToIUVPkl,
    PartCompose,
    V2Trainer,
    VideoIO,
    part_compose,
)

FAST_FLOW = FlowParams(n_outer=2, n_sor=8)


def test_video_io_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    # Use smooth content: MJPG is lossy, so test with low-frequency data.
    t, c, h, w = 4, 2, 32, 48
    base = rng.randint(40, 200, (t, c, 1, 1)).astype(np.uint8)
    arr = np.broadcast_to(base, (t, c, h, w)).copy()
    path = tmp_path / "vid.avi"
    VideoIO.write_video_TCHW(path, arr)
    assert (tmp_path / "0_vid.avi").exists() and (tmp_path / "1_vid.avi").exists()
    back = VideoIO.read_video_TCHW(path, 2, [0, 2, 3])
    assert back.shape == (3, 2, 32, 48)
    want = arr[[0, 2, 3]]
    assert np.abs(back.astype(int) - want.astype(int)).mean() < 3


def test_video_io_rgb_indexed(tmp_path):
    import cv2

    path = tmp_path / "rgb.avi"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10, (48, 32))
    vals = [20, 90, 160, 230]
    for v in vals:
        writer.write(np.full((32, 48, 3), v, np.uint8))
    writer.release()
    clip = VideoIO.read_video_TCHW(path, 0, [1, 3], format="rgb24")
    assert clip.shape == (2, 3, 32, 48)
    assert abs(int(clip[0].mean()) - 90) < 6
    assert abs(int(clip[1].mean()) - 230) < 6


def test_part_compose_unions():
    pc = PartCompose()
    boxes = [None] * 25
    boxes[4] = (10, 10, 20, 20)   # lHand
    boxes[15] = (5, 12, 15, 30)   # lUpArm
    out = pc.combine_spatial_box_xyxy(boxes, part_compose.lHandArm)
    assert out == (5, 10, 20, 30)
    assert pc.combine_spatial_box_xyxy(boxes, part_compose.rHand) is None
    temporal = [boxes, [None] * 24 + [None]]
    temporal[1] = list(boxes)
    temporal[1][4] = (0, 0, 8, 8)
    out = pc.combine_temporal_box_xyxy(temporal, part_compose.lHandArm)
    assert out == (0, 0, 20, 30)
    # Composition contents mirror the reference (new_feature_test.py:489-499).
    assert part_compose.TorsoArmHand == [1, 2, 15, 17, 19, 21, 16, 18, 20, 22, 4, 3]
    assert part_compose.lHandArmTorso == [4, 15, 17, 19, 21, 1, 2]


@pytest.fixture(scope="module")
def v2_cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path_factory.mktemp("v2"))
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.NUM_CLASS = 2
    cfg.MODEL.INPUT_SIZE = 64
    generate_raw_fixture(cfg, num_videos_per_set=2, num_classes=2, num_frames=10,
                         sets=("train", "test"))
    # Stage 1 equivalent: copy raw into 1_Sample via the offline stage.
    from video_classification_tpu.pipeline import sample_data

    sample_data(cfg, sets=("train", "test"))
    ConvertVideoToFlow(cfg, FAST_FLOW).convert()
    ConvertVideoToIUVPkl(cfg, SyntheticIUVProvider()).convert()
    ConvertIuvPklToUvVideo(cfg).convert()
    ConvertIuvPklToPartBox(cfg).convert()
    return cfg


def test_v2_flow_videos(v2_cfg):
    root = Path(v2_cfg.CHALEARN.ROOT)
    f0 = root / "2_Flow_New/train/001/0_M_00001.avi"
    f1 = root / "2_Flow_New/train/001/1_M_00001.avi"
    assert f0.exists() and f1.exists()
    assert VideoIO.frame_count(f0) == 9  # T-1 frame pairs


def test_v2_iuv_pkls(v2_cfg):
    root = Path(v2_cfg.CHALEARN.ROOT)
    pkl = root / "4_IUV_New/train/001/M_00001.pkl"
    assert pkl.exists()
    with pkl.open("rb") as f:
        results = pickle.load(f)
    assert len(results) == 10
    assert results[0]["pred_boxes_XYXY"].shape[1] == 4


def test_v2_uv_videos(v2_cfg):
    root = Path(v2_cfg.CHALEARN.ROOT)
    u = root / "5_UV_Video/train/001/0_M_00001.avi"
    assert u.exists()
    frames = VideoIO.read_video_TCHW(root / "5_UV_Video/train/001/M_00001.avi", 2, [0])
    # un-padded geometry = original 48x64 frame
    assert frames.shape == (1, 2, 48, 64)


def test_v2_part_boxes(v2_cfg):
    root = Path(v2_cfg.CHALEARN.ROOT)
    with (root / "6_Box/train/001/M_00001.pkl").open("rb") as f:
        boxes = pickle.load(f)
    assert len(boxes) == 10
    assert len(boxes[0]) == 25
    # Synthetic layout guarantees a torso detection (part 1).
    assert boxes[0][1] is not None
    x1, y1, x2, y2 = boxes[0][1]
    assert x2 > x1 and y2 > y1


def test_v2_dataset(v2_cfg):
    ds = ChalearnGestureDataset(v2_cfg, "train", parts=part_compose.TorsoArmHand)
    assert len(ds) == 2
    item = ds.get_train_clip(0, random.Random(0))
    assert item["x"].shape == (4, 64, 64, 7)
    assert item["x"].dtype == np.uint8
    ev = ds.get_eval_clips(0, random.Random(0))
    # seq_len = 10-1 = 9, clip 4, stride clip_len -> starts 0, 4 -> 2 clips.
    assert len(ev["clips"]) == 2


@pytest.mark.slow
def test_v2_trainer_step(v2_cfg, devices):
    from video_classification_tpu.parallel import make_mesh

    cfg = v2_cfg.clone()
    cfg.CHALEARN.BATCH_SIZE = 2
    cfg.MODEL.NAME = "slowfast-v2"
    cfg.MODEL.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    mesh = make_mesh(cfg, devices=devices[:2])
    trainer = V2Trainer(cfg, mesh=mesh, parts=part_compose.lHandArmTorso)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    y = trainer.run_eval()
    assert 0.0 <= y["acc"] <= 1.0
