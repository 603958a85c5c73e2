"""v2 gesture dataset: clip-indexed decode + per-clip union crop box.

Counterpart of ``ChalearnGestureDataset`` (`/root/reference/new_feature_test.py:556-709`):
instead of v1's 180 JPEG files per clip, each video exists as a handful of video
files (rgb in 1_Sample, 2-channel flow in 2_Flow_New, 2-channel UV in 5_UV_Video)
plus a part-box pkl in 6_Box; a clip decodes only its frame indices, crops one
union bbox covering the selected parts over the whole clip, and resizes.

Layout/TPU adaptations (semantics preserved):
  * output is channels-last uint8 (T, S, S, 7) with channels [rgb 3, uv 2, flow 2];
    the /255 normalization and RandomCrop augment run on device in the jitted step
    (v2 normalizes by /255 only — new_feature_test.py:600 — no mean/std);
  * ``seq_len = len(boxes) - 1`` reproduces the reference's out-of-bounds guard
    (new_feature_test.py:693-695), which also keeps flow (T-1 frames) in range;
  * v2 uniform sampling strides by clip_len, not 4 (new_feature_test.py:676).
"""

from __future__ import annotations

import pickle
import random as pyrandom
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from ..utils.chapath import ChaPath
from ..utils.labels import Labels
from . import part_compose
from .video_io import VideoIO

V2_CHANNELS = 7  # rgb 3 + uv 2 + flow 2


class ChalearnGestureDataset:
    def __init__(self, cfg, name_of_set: str, parts: Optional[Sequence[int]] = None,
                 sampling: Optional[str] = None) -> None:
        assert name_of_set in ("train", "test", "valid")
        self.cfg = cfg
        self.name_of_set = name_of_set
        self.label_list = Labels(cfg).from_set(name_of_set)
        self.parts = list(parts) if parts is not None else part_compose.lHandArmTorso
        self.clip_len = int(cfg.CHALEARN.CLIP_LEN)
        self.input_size = int(cfg.MODEL.INPUT_SIZE)
        if sampling is None:
            sampling = "random" if name_of_set == "train" else "uniform"
        assert sampling in ("random", "uniform")
        self.sampling = sampling

    def __len__(self) -> int:
        return len(self.label_list)

    # -- sampling (v2 uniform uses stride == clip_len) ---------------------------

    def _random_sampling(self, seq_len: int, rng: pyrandom.Random) -> List[int]:
        possible = max(0, seq_len - self.clip_len)
        start = rng.randint(0, possible)
        return [i % seq_len for i in range(start, start + self.clip_len)]

    def _uniform_sampling(self, seq_len: int, rng: pyrandom.Random) -> List[List[int]]:
        if seq_len <= self.clip_len:
            return [self._random_sampling(seq_len, rng)]
        return [
            list(range(t, t + self.clip_len))
            for t in range(0, seq_len - self.clip_len, self.clip_len)
        ]

    # -- feature assembly --------------------------------------------------------

    def _features_from_indices(self, clip_indices: List[int], boxes,
                               rgb_path: Path) -> np.ndarray:
        flow_path = ChaPath(rgb_path).change_base(self.cfg.CHALEARN.FLOW_VIDEO).path
        uv_path = ChaPath(rgb_path).change_base(self.cfg.CHALEARN.UV_VIDEO).path

        boxes_clip = [boxes[i] for i in clip_indices]
        x1, y1, x2, y2 = part_compose.combine_temporal_box_xyxy(boxes_clip, self.parts)
        x1, y1 = max(0, int(x1)), max(0, int(y1))
        x2, y2 = int(x2), int(y2)

        rgb = VideoIO.read_video_TCHW(rgb_path, 0, clip_indices, format="rgb24")
        uv = VideoIO.read_video_TCHW(uv_path, 2, clip_indices)
        flow = VideoIO.read_video_TCHW(flow_path, 2, clip_indices)

        stack = np.concatenate([rgb, uv, flow], axis=1)  # (T, 7, H, W)
        crop = stack[:, :, y1:y2, x1:x2]
        out = np.empty(
            (crop.shape[0], self.input_size, self.input_size, V2_CHANNELS), np.uint8
        )
        for t in range(crop.shape[0]):
            hwc = crop[t].transpose(1, 2, 0)
            out[t] = cv2.resize(hwc, (self.input_size, self.input_size),
                                interpolation=cv2.INTER_LINEAR)
        return out

    def _load_boxes(self, rgb_path: Path):
        box_path = ChaPath(rgb_path).change_base(self.cfg.CHALEARN.BOX).path.with_suffix(".pkl")
        with box_path.open("rb") as f:
            return pickle.load(f)

    # -- Trainer-facing API (matches data.dataset.ChalearnVideoDataset) ---------

    def get_train_clip(self, index: int, rng: pyrandom.Random) -> Dict:
        m, _, label = self.label_list[index]
        rgb_path = Path(self.cfg.CHALEARN.ROOT, self.cfg.CHALEARN.SAMPLE, m)
        boxes = self._load_boxes(rgb_path)
        seq_len = max(1, len(boxes) - 1)
        clip = self._random_sampling(seq_len, rng)
        return {"x": self._features_from_indices(clip, boxes, rgb_path),
                "label": label - 1}

    def get_eval_clips(self, index: int, rng: pyrandom.Random) -> Dict:
        m, _, label = self.label_list[index]
        rgb_path = Path(self.cfg.CHALEARN.ROOT, self.cfg.CHALEARN.SAMPLE, m)
        boxes = self._load_boxes(rgb_path)
        seq_len = max(1, len(boxes) - 1)
        clips = self._uniform_sampling(seq_len, rng)
        return {
            "clips": [self._features_from_indices(c, boxes, rgb_path) for c in clips],
            "label": label - 1,
        }

    def num_eval_clips(self, index: int) -> int:
        """Clip count of get_eval_clips without reading any video data."""
        m, _, _ = self.label_list[index]
        rgb_path = Path(self.cfg.CHALEARN.ROOT, self.cfg.CHALEARN.SAMPLE, m)
        seq_len = max(1, len(self._load_boxes(rgb_path)) - 1)
        if seq_len <= self.clip_len:
            return 1
        return len(range(0, seq_len - self.clip_len, self.clip_len))
