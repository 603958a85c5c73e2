"""Misc inspection tools.

Counterparts of the reference's loose scripts:
  * ``how_many_classes`` — label statistics (`/root/reference/how_many_classes.py`)
  * ``render_iuv_boxes`` — person-box overlays from an IUV pkl onto video frames,
    written as image files (`/root/reference/load_iuv_pkl.py:17-49` draws them
    interactively with matplotlib; headless environments get files instead).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional, Tuple

import cv2
import numpy as np


def how_many_classes(labels_txt: Path) -> dict:
    with Path(labels_txt).open("r") as f:
        lines = f.readlines()
    labels = [int(l.split(" ")[2]) for l in lines if l.strip()]
    stats = {
        "min": min(labels),
        "max": max(labels),
        "num_classes": len(set(labels)),
        "num_videos": len(labels),
    }
    print(stats["min"], stats["max"], stats["num_classes"])
    print(f"num of videos: {stats['num_videos']}")
    return stats


def render_iuv_boxes(
    iuv_pkl: Path,
    video_path: Path,
    out_dir: Path,
    unpad_offset: Optional[Tuple[int, int]] = None,
    max_frames: int = 50,
) -> int:
    """Overlay the first detection box per frame; returns frames written.

    ``unpad_offset``: (x_pad, y_pad) to shift padded-frame boxes back onto the
    raw video (defaults to half the frame size, the 2x-pad convention)."""
    from .v2.video_io import VideoIO

    with Path(iuv_pkl).open("rb") as f:
        results = pickle.load(f)
    frames = VideoIO.read_video(video_path, format="rgb24")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if frames and unpad_offset is None:
        h, w = frames[0].shape[:2]
        unpad_offset = (w // 2, h // 2)
    written = 0
    for i, (frame, result) in enumerate(zip(frames, results)):
        if i >= max_frames:
            break
        box = result["pred_boxes_XYXY"]
        if len(box) == 0:
            print("No detection")
            continue
        x1, y1, x2, y2 = np.asarray(box[0], np.float32)
        x1, x2 = x1 - unpad_offset[0], x2 - unpad_offset[0]
        y1, y2 = y1 - unpad_offset[1], y2 - unpad_offset[1]
        img = np.ascontiguousarray(frame[..., ::-1])  # RGB -> BGR for cv2
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), (0, 0, 255), 2)
        cv2.imwrite(str(out_dir / f"{i:05d}.jpg"), img)
        written += 1
    return written
