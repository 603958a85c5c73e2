"""Synthetic mini-ChaLearn fixture.

The reference has no test fixtures; its only subsetting knob is
``CHALEARN.SAMPLE_CLASS`` (`chalearn_sample_data.py:27`). This formalizes that idea:
generate a tiny, deterministic on-disk dataset with the exact stage-folder layout the
training pipeline consumes —

    <ROOT>/1_Sample/{train,test,valid}.txt             labels "M K L"
    <ROOT>/<CropX>/<set>/<xxx>/<M_xxxxx>/<fffff>.jpg    crop frame
                                  .../U_<f>.jpg ...     U, V, F0..F4, D companions

(9 files per frame, mirroring what `chalearn_iuv_to_crop.py` writes and
`dataset/chalearn_dataset.py:103-113` reads).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence

import cv2
import numpy as np

from ..utils.labels import write_labels


def generate_raw_fixture(
    cfg,
    num_videos_per_set: int = 2,
    num_classes: int = 2,
    num_frames: int = 10,
    hw=(48, 64),
    sets: Sequence[str] = ("train",),
    seed: int = 0,
    class_sep: int = 50,
) -> None:
    """Raw-stage fixture: 0_Iso/IsoGD_labels/<set>.txt + M_/K_ .avi pairs, the input
    of the full offline pipeline (chalearn_sample_data.py consumes this layout).
    Videos contain a moving bright square on noise so optical flow is non-trivial.

    ``class_sep`` adds a per-class brightness offset ((label-1)*class_sep) so
    labels are separable from pixel content — the strongest accuracy-parity
    proxy available with zero egress: a small model must overfit this to ~1.0
    (mirroring the in-memory synthetic encoding, data/dataset.py:133-138)."""
    rng = np.random.RandomState(seed)
    root = Path(cfg.CHALEARN.ROOT)
    iso = root / cfg.CHALEARN.ISO
    h, w = hw
    for name_of_set in sets:
        lines = []
        for vi in range(num_videos_per_set):
            label = (vi % num_classes) + 1
            xxx = f"{label:03d}"
            vid = f"{vi + 1:05d}"
            m_rel = f"{name_of_set}/{xxx}/M_{vid}.avi"
            k_rel = f"{name_of_set}/{xxx}/K_{vid}.avi"
            lines.append(f"{m_rel} {k_rel} {label}\n")
            for rel in (m_rel, k_rel):
                path = iso / name_of_set / rel
                path.parent.mkdir(parents=True, exist_ok=True)
                writer = cv2.VideoWriter(
                    str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (w, h)
                )
                for t in range(num_frames):
                    offset = (label - 1) * class_sep
                    frame = (rng.randint(0, 60, (h, w, 3)) + offset).clip(
                        0, 255).astype(np.uint8)
                    # moving square (motion for the flow stage)
                    x0 = 4 + 2 * t
                    y0 = 4 + t
                    frame[y0 : y0 + 12, x0 : x0 + 12] = 220
                    writer.write(frame)
                writer.release()
        labels_txt = iso / "IsoGD_labels" / f"{name_of_set}.txt"
        labels_txt.parent.mkdir(parents=True, exist_ok=True)
        labels_txt.write_text("".join(lines))


def generate_fixture(
    cfg,
    num_videos_per_set: int = 4,
    num_classes: int = 3,
    frames_per_video: int = 6,
    crops: Sequence[str] = ("CropLHand",),
    sets: Sequence[str] = ("train", "test"),
    base_size: int = 48,
    seed: int = 0,
) -> None:
    """Write the fixture under cfg.CHALEARN.ROOT."""
    rng = np.random.RandomState(seed)
    root = Path(cfg.CHALEARN.ROOT)
    interval = cfg.CHALEARN.IMG_SAMPLE_INTERVAL

    for name_of_set in sets:
        labels: List = []
        for vi in range(num_videos_per_set):
            label = (vi % num_classes) + 1  # labels are 1-based
            xxx = f"{label:03d}"
            vid = f"{vi + 1:05d}"
            labels.append(
                (f"{name_of_set}/{xxx}/M_{vid}.avi", f"{name_of_set}/{xxx}/K_{vid}.avi", label)
            )
            # 2_Images stage provides the frame listing (chalearn_dataset.py:166-169).
            img_folder = root / cfg.CHALEARN.IMG / name_of_set / xxx / f"M_{vid}"
            img_folder.mkdir(parents=True, exist_ok=True)
            for fi in range(frames_per_video):
                name = f"{fi * interval:05d}.jpg"
                cv2.imwrite(
                    str(img_folder / name),
                    rng.randint(0, 255, (24, 32, 3), dtype=np.uint8),
                )
            for crop in crops:
                folder = root / crop / name_of_set / xxx / f"M_{vid}"
                folder.mkdir(parents=True, exist_ok=True)
                for fi in range(frames_per_video):
                    # Frame numbering matches the sampled-image convention:
                    # every `interval`-th raw frame (chalearn_video_to_images.py:22-28).
                    name = f"{fi * interval:05d}.jpg"
                    h = base_size + int(rng.randint(-8, 9))
                    w = base_size + int(rng.randint(-8, 9))
                    # Class-dependent mean so models can actually fit the data.
                    base = np.full((h, w, 3), 40 + 60 * (label - 1), np.uint8)
                    noise = rng.randint(0, 60, (h, w, 3)).astype(np.uint8)
                    bgr = cv2.add(base, noise)
                    cv2.imwrite(str(folder / name), bgr)
                    for prefix in ("U_", "V_", "D_"):
                        gray = rng.randint(0, 255, (h, w), dtype=np.uint8)
                        cv2.imwrite(str(folder / (prefix + name)), gray)
                    for i in range(5):
                        flow = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
                        cv2.imwrite(str(folder / (f"F{i}_" + name)), flow)
        write_labels(cfg, name_of_set, labels)
