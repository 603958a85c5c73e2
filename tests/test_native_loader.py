"""Native C++ clip loader: build, decode parity vs the cv2 path, dataset wiring."""

import random

import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.data import ChalearnVideoDataset, generate_fixture
from video_classification_tpu.native.loader import (
    NativeClipLoader,
    frame_paths_for,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader failed to build"
)


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path_factory.mktemp("native"))
    cfg.CHALEARN.CLIP_LEN = 4
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.MODEL.R3D_INPUT = "CropLHand"
    generate_fixture(cfg, num_videos_per_set=2, num_classes=2, frames_per_video=5)
    return cfg


def test_native_matches_python_path(fixture_cfg):
    from pathlib import Path

    cfg_py = fixture_cfg.clone()
    cfg_py.DATA.BACKEND = "cv2"
    ds_py = ChalearnVideoDataset(cfg_py, "train")
    seq_len, names, nsetx3x5 = ds_py._seq_len(0)
    want = ds_py._load_frame(nsetx3x5 / names[0])

    loader = NativeClipLoader(num_threads=2)
    paths = frame_paths_for(Path(cfg_py.CHALEARN.ROOT), "CropLHand", nsetx3x5 / names[0])
    got = loader.load_clip(paths, 1, 64)[0]
    assert got.shape == want.shape == (64, 64, 21)
    # libjpeg vs cv2(jpeg-turbo) decode and fixed-point vs float resize can each
    # differ by ~1 LSB; content must agree tightly.
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.mean() < 1.0, diff.mean()
    assert np.percentile(diff, 99) <= 3
    loader.close()


def test_native_missing_frame(fixture_cfg):
    loader = NativeClipLoader(num_threads=1)
    got = loader.load_clip([""] * 9, 1, 64)[0]
    assert (got == 127).all()
    loader.close()


def test_native_multi_clip_parallel(fixture_cfg):
    from pathlib import Path

    ds = ChalearnVideoDataset(fixture_cfg, "train")
    seq_len, names, nsetx3x5 = ds._seq_len(0)
    loader = NativeClipLoader(num_threads=4)
    paths = []
    for i in [0, 1, 2, 0]:
        paths.extend(frame_paths_for(Path(fixture_cfg.CHALEARN.ROOT), "CropLHand",
                                     nsetx3x5 / names[i]))
    tickets = [loader.submit(paths, 4, 64) for _ in range(6)]
    outs = [loader.wait(t) for t in tickets]
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])
    # Frames 0 and 3 are the same file -> identical stacks.
    np.testing.assert_array_equal(outs[0][0], outs[0][3])
    loader.close()


def test_dataset_uses_native_backend(fixture_cfg):
    cfg = fixture_cfg.clone()
    cfg.DATA.BACKEND = "native"
    ds = ChalearnVideoDataset(cfg, "train")
    assert ds._native is not None
    item = ds.get_train_clip(0, random.Random(0))
    assert item["x"].shape == (4, 64, 64, 21)
    assert item["x"].dtype == np.uint8
    # Compare against the cv2 path with the same sampling rng.
    cfg2 = fixture_cfg.clone()
    cfg2.DATA.BACKEND = "cv2"
    ds2 = ChalearnVideoDataset(cfg2, "train")
    item2 = ds2.get_train_clip(0, random.Random(0))
    diff = np.abs(item["x"].astype(int) - item2["x"].astype(int))
    assert diff.mean() < 1.0
