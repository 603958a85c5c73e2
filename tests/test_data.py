"""Fixture + dataset + batching tests."""

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.data import (
    ChalearnVideoDataset,
    NUM_MODALITY_CHANNELS,
    eval_batches,
    generate_fixture,
    train_batches,
)


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path_factory.mktemp("chalearn"))
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.MODEL.R3D_INPUT = "CropLHand"  # 64 px
    generate_fixture(cfg, num_videos_per_set=4, num_classes=3, frames_per_video=6)
    return cfg


def test_train_clip_shape(fixture_cfg):
    import random

    ds = ChalearnVideoDataset(fixture_cfg, "train")
    assert len(ds) == 4
    item = ds.get_train_clip(0, random.Random(0))
    assert item["x"].shape == (4, 64, 64, NUM_MODALITY_CHANNELS)
    assert item["x"].dtype == np.uint8
    assert 0 <= item["label"] < 3


def test_missing_frame_fills_127(fixture_cfg):
    import random

    cfg = fixture_cfg.clone()
    cfg.MODEL.R3D_INPUT = "CropTorso"  # not generated -> every frame missing
    ds = ChalearnVideoDataset(cfg, "train")
    item = ds.get_train_clip(0, random.Random(0))
    assert (item["x"] == 127).all()
    assert item["x"].shape == (4, 128, 128, NUM_MODALITY_CHANNELS)


def test_train_batches(fixture_cfg):
    batches = list(train_batches(ChalearnVideoDataset(fixture_cfg, "train"), 2, seed=0))
    assert len(batches) == 2  # 4 videos / batch 2, drop_last
    assert batches[0]["x"].shape == (2, 4, 64, 64, NUM_MODALITY_CHANNELS)
    assert batches[0]["label"].dtype == np.int32


def test_eval_batches_packing(fixture_cfg):
    ds = ChalearnVideoDataset(fixture_cfg, "test")
    gen, sv = eval_batches(ds, 3)
    batches = list(gen)
    # 6 frames, clip 4 -> 1 clip per video (6-4=2 < stride window) ->
    # uniform range(0, 2, 4) = [0] -> 1 clip each.
    assert sv == [1, 1, 1, 1]
    total_valid = sum(b["valid"].sum() for b in batches)
    assert total_valid == 4
    for b in batches:
        assert b["x"].shape[0] == 3  # fixed batch size incl. padding


def test_eval_batches_multi_clip(fixture_cfg):
    cfg = fixture_cfg.clone()
    cfg.CHALEARN.CLIP_LEN = 2
    ds = ChalearnVideoDataset(cfg, "test")
    gen, sv = eval_batches(ds, 4)
    batches = list(gen)
    assert sv == [1, 1, 1, 1]  # range(0, 4, 4) -> 1 clip
    cfg.CHALEARN.CLIP_LEN = 1
    ds = ChalearnVideoDataset(cfg, "test")
    gen, sv = eval_batches(ds, 4)
    n_valid = sum(b["valid"].sum() for b in gen)
    assert sv == [2, 2, 2, 2]  # range(0, 5, 4) -> starts 0,4
    assert n_valid == 8


def test_synthetic_mode():
    import random

    cfg = get_cfg()
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 6
    cfg.DATA.SYNTHETIC_SEQ_LEN = 10
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.MODEL.R3D_INPUT = "CropLHand"
    ds = ChalearnVideoDataset(cfg, "train")
    assert len(ds) == 6
    item = ds.get_train_clip(2, random.Random(0))
    assert item["x"].shape == (4, 64, 64, NUM_MODALITY_CHANNELS)
    # Deterministic per index.
    item2 = ds.get_train_clip(2, random.Random(5))
    assert (item["x"] == item2["x"]).all()


def test_eval_samples_per_video_materialized(fixture_cfg):
    """sv is complete BEFORE the generator is touched, and partial consumption
    (DEBUG islice) cannot corrupt it — the r1 drain-order trap."""
    import itertools

    ds = ChalearnVideoDataset(fixture_cfg, "test")
    gen, sv = eval_batches(ds, 3)
    assert sv == [ds.num_eval_clips(i) for i in range(len(ds))]
    sv_before = list(sv)
    list(itertools.islice(gen, 1))  # partial drain
    assert sv == sv_before
