"""Video container I/O for the v2 (video-native) pipeline.

The reference v2 slice stores intermediate tensors as per-channel gray mpeg4
videos written with PyAV and read with decord's indexed `get_batch`
(`/root/reference/new_feature_test.py:61-155`). Neither library is in this image;
the host codec path here is OpenCV (FFmpeg-backed), with the same on-disk layout:
a TCHW array becomes C gray video files named ``{c}_<name>`` next to the target
path. Indexed reads decode sequentially up to the last requested frame (cv2 has no
random access) — clip reads stay cheap because gesture videos are short.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence

import cv2
import numpy as np


class VideoIO:
    FOURCC = "MJPG"  # intra-only: accurate per-frame values, fast seeks

    @staticmethod
    def write_video(filename: Path, video_array: np.ndarray, fps: float = 10.0) -> None:
        """(T, H, W) uint8 gray -> one video file (new_feature_test.py:63-83)."""
        assert video_array.ndim == 3, video_array.shape
        t, h, w = video_array.shape
        filename = Path(filename)
        filename.parent.mkdir(parents=True, exist_ok=True)
        writer = cv2.VideoWriter(
            str(filename), cv2.VideoWriter_fourcc(*VideoIO.FOURCC), fps, (w, h), False
        )
        assert writer.isOpened(), filename
        for frame in video_array:
            writer.write(np.ascontiguousarray(frame))
        writer.release()

    @staticmethod
    def write_video_TCHW(filename: Path, video_array: np.ndarray) -> None:
        """(T, C, H, W) -> C gray files ``{c}_<name>`` (new_feature_test.py:85-92)."""
        assert video_array.ndim == 4, video_array.shape
        filename = Path(filename)
        for c in range(video_array.shape[1]):
            VideoIO.write_video(filename.parent / f"{c}_{filename.name}", video_array[:, c])

    @staticmethod
    def _read_indexed(path: Path, frames: Sequence[int]) -> np.ndarray:
        """(len(frames), H, W, 3) BGR frames at the given indices."""
        cap = cv2.VideoCapture(str(path))
        assert cap.isOpened(), path
        need = sorted(set(int(i) for i in frames))
        got = {}
        idx = 0
        ok, frame = cap.read()
        while ok and need:
            if idx == need[0]:
                got[idx] = frame
                need.pop(0)
            idx += 1
            if need:
                ok, frame = cap.read()
        cap.release()
        if need:
            raise IndexError(f"frames {need} out of range in {path}")
        return np.stack([got[int(i)] for i in frames])

    @staticmethod
    def read_video_TCHW(filename: Path, channels: int, frames: Sequence[int],
                        format: str = "gray") -> np.ndarray:
        """Indexed clip read (new_feature_test.py:94-133). Returns (T, C, H, W)."""
        assert format in ("rgb24", "gray")
        filename = Path(filename)
        if format == "rgb24":
            video = VideoIO._read_indexed(filename, frames)  # THWC BGR
            rgb = video[..., ::-1]  # decord yields RGB; match that convention
            return np.ascontiguousarray(rgb.transpose(0, 3, 1, 2))
        videos = []
        for c in range(channels):
            cpath = filename.parent / f"{c}_{filename.name}"
            assert cpath.is_file(), cpath
            video = VideoIO._read_indexed(cpath, frames)
            videos.append(video[..., 0])  # THW
        return np.stack(videos, axis=1)  # TCHW

    @staticmethod
    def read_video(filename: Path, format: str = "rgb24") -> List[np.ndarray]:
        """Full decode as a frame list (new_feature_test.py:146-155)."""
        assert format in ("gray", "rgb24")
        cap = cv2.VideoCapture(str(Path(filename)))
        frames = []
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            if format == "rgb24":
                frames.append(np.ascontiguousarray(frame[..., ::-1]))
            else:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
        cap.release()
        return frames

    @staticmethod
    def frame_count(filename: Path) -> int:
        cap = cv2.VideoCapture(str(Path(filename)))
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return n
