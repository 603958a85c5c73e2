"""Full offline-pipeline integration test: raw videos -> crops -> trainable dataset.

Runs every stage of the chain (sample -> images -> flow -> pad -> IUV -> crops) on a
tiny raw fixture with the synthetic IUV provider, then verifies the resulting stage
folders feed the training dataset.
"""

import random
from pathlib import Path

import cv2
import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.data import ChalearnVideoDataset, NUM_MODALITY_CHANNELS
from video_classification_tpu.data.fixture import generate_raw_fixture
from video_classification_tpu.ops.flow import FlowParams
from video_classification_tpu.pipeline import (
    SyntheticIUVProvider,
    filter_img_by_flow,
    image_to_padded,
    iuv_to_crop,
    padded_to_iuv,
    run_full_pipeline,
    sample_data,
    video_to_flow,
    video_to_images,
)

FAST_FLOW = FlowParams(n_outer=2, n_sor=8)


@pytest.fixture(scope="module")
def piped_cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path_factory.mktemp("pipe"))
    cfg.CHALEARN.IMG_SAMPLE_INTERVAL = 5
    cfg.CHALEARN.SAMPLE_CLASS = 2
    generate_raw_fixture(cfg, num_videos_per_set=2, num_classes=2, num_frames=10)
    run_full_pipeline(cfg, SyntheticIUVProvider(), flow_params=FAST_FLOW, sets=("train",))
    return cfg


def test_sample_stage(piped_cfg):
    root = Path(piped_cfg.CHALEARN.ROOT)
    assert (root / "1_Sample" / "train.txt").exists()
    avis = list((root / "1_Sample").glob("train/*/*.avi"))
    assert len(avis) == 4  # 2 videos x (M, K)


def test_images_stage(piped_cfg):
    root = Path(piped_cfg.CHALEARN.ROOT)
    # 10 frames, interval 5 -> frames 0 and 5.
    imgs = sorted((root / "2_Images" / "train" / "001" / "M_00001").glob("*.jpg"))
    assert [p.name for p in imgs] == ["00000.jpg", "00005.jpg"]


def test_flow_stage(piped_cfg):
    root = Path(piped_cfg.CHALEARN.ROOT)
    flows = sorted((root / "2_Flow" / "train" / "001" / "M_00001").glob("*.jpg"))
    assert len(flows) == 10  # every frame gets a flow image
    f0 = cv2.imread(str(flows[0]))
    # First frame flows against itself: U=V=127, zero magnitude.
    assert abs(int(f0[..., 0].mean()) - 127) <= 1
    assert f0[..., 2].max() <= 2
    # Later frames see the moving square: nonzero magnitude somewhere.
    f5 = cv2.imread(str(flows[5]))
    assert f5[..., 2].max() > 10


def test_pad_stage(piped_cfg):
    root = Path(piped_cfg.CHALEARN.ROOT)
    img = cv2.imread(str(root / "2_Images/train/001/M_00001/00000.jpg"))
    pad = cv2.imread(str(root / "3_Pad/train/001/M_00001/00000.jpg"))
    h, w, _ = img.shape
    assert pad.shape == (2 * h, 2 * w, 3)
    center = pad[h // 2 : h // 2 + h, w // 2 : w // 2 + w].astype(int)
    # jpg -> pad -> jpg recompression is lossy; content must match closely.
    assert np.abs(center - img.astype(int)).mean() < 10
    # Border ring stays (near-)zero.
    assert pad[: h // 2].mean() < 5 and pad[:, : w // 2].mean() < 5
    # K_ modality padded too.
    assert (root / "3_Pad/train/001/K_00001/00000.jpg").exists()


def test_iuv_stage(piped_cfg):
    import pickle

    root = Path(piped_cfg.CHALEARN.ROOT)
    pkls = sorted((root / "4_IUV" / "train").glob("*.pkl"))
    assert [p.name for p in pkls] == ["001.pkl", "002.pkl"]
    with pkls[0].open("rb") as f:
        items = pickle.load(f)
    assert len(items) == 2  # 2 frames of the M_ video
    item = items[0]
    assert set(item) == {"file_name", "pred_boxes_XYXY", "scores", "pred_densepose"}
    assert item["pred_boxes_XYXY"].shape == (1, 4)
    assert item["pred_densepose"][0]["labels"].ndim == 2
    assert item["pred_densepose"][0]["uv"].shape[0] == 2


def test_crop_stage(piped_cfg):
    root = Path(piped_cfg.CHALEARN.ROOT)
    # Body crop + companions.
    body = root / "CropBody/train/001/M_00001/00000.jpg"
    assert body.exists()
    for prefix in ["F0_", "F4_", "D_"]:
        assert (body.parent / f"{prefix}00000.jpg").exists()
    # Torso is part of the synthetic layout and large enough.
    torso = root / "CropTorso/train/001/M_00001/00000.jpg"
    assert torso.exists()
    for prefix in ["U_", "V_", "F0_", "F1_", "F2_", "F3_", "F4_", "D_"]:
        assert (torso.parent / f"{prefix}00000.jpg").exists(), prefix
    # Hands exist in the synthetic layout (>= 16 px squares).
    assert (root / "CropLHand/train/001/M_00001/00000.jpg").exists()
    assert (root / "CropRHand/train/001/M_00001/00000.jpg").exists()


def test_crops_feed_dataset(piped_cfg):
    cfg = piped_cfg.clone()
    cfg.CHALEARN.CLIP_LEN = 2
    cfg.MODEL.R3D_INPUT = "CropTorso"
    ds = ChalearnVideoDataset(cfg, "train")
    item = ds.get_train_clip(0, random.Random(0))
    assert item["x"].shape == (2, 128, 128, NUM_MODALITY_CHANNELS)
    # Real data, not the missing-fill.
    assert not (item["x"] == 127).all()


def test_energy_filter_stage(piped_cfg):
    filter_img_by_flow(piped_cfg, keep_fraction=0.3, min_keep=4)
    root = Path(piped_cfg.CHALEARN.ROOT)
    kept = sorted((root / "2_Images_energy/train/001/M_00001").glob("*.jpg"))
    assert len(kept) == 4  # min_keep dominates 30% of 10


def test_cse_stage(piped_cfg):
    from video_classification_tpu.pipeline import padded_to_cse

    padded_to_cse(piped_cfg, SyntheticIUVProvider(), sets=("train",))
    root = Path(piped_cfg.CHALEARN.ROOT)
    pkls = sorted((root / "4_CSE" / "train").glob("*.pkl"))
    assert [p.name for p in pkls] == ["001.pkl", "002.pkl"]


def test_iuv_skip_if_exists(piped_cfg):
    root = Path(piped_cfg.CHALEARN.ROOT)
    pkl = root / "4_IUV" / "train" / "001.pkl"
    before = pkl.stat().st_mtime_ns
    padded_to_iuv(piped_cfg, SyntheticIUVProvider(), sets=("train",))
    assert pkl.stat().st_mtime_ns == before
