"""Offline preprocessing stages.

The reference's stage scripts (`chalearn_*.py`, orchestrated by
`run_data_preprocess.sh`) re-expressed as callable functions over the same on-disk
stage-folder layout, with every compute-bound inner loop replaced by a batched
device kernel:

  stage                      reference                     here
  -------------------------  ----------------------------  ---------------------------
  sample_data                chalearn_sample_data.py       host copy (I/O-bound)
  video_to_images            chalearn_video_to_images.py   host decode (I/O-bound)
  video_to_flow              chalearn_video_to_flow.py     ops.flow (device, batched
                             pyflow C++ + Pool(18)         over a whole video)
  filter_img_by_flow         chalearn_filter_img_by_flow   ops.flow.flow_energy_filter
  image_to_padded            chalearn_image_to_padded.py   numpy pad (I/O-bound; the
                                                           device op is ops.image.pad2x)
  padded_to_iuv / _to_cse    detectron2 DensePose subproc  IUVProvider (pluggable)
  iuv_to_crop                cv2.findContours chain        ops.components (device)

Each stage keeps the reference's idempotence conventions: skip-if-exists for IUV
dumps (chalearn_padded_to_iuv.py:38-40) and crop files
(chalearn_iuv_to_crop.py:111-112), full-rebuild semantics elsewhere.
"""

from __future__ import annotations

import pickle
import shutil
from glob import glob
from pathlib import Path
from typing import List, Optional, Sequence

import cv2
import numpy as np

from ..config.crop_cfg import crop_part_args
from ..ops.components import largest_component_bbox_batch, part_mask
from ..ops.flow import DEFAULT_PARAMS, FlowParams, flow_energy_filter, video_flow_uint8
from ..utils.labels import parse_label_lines, write_labels
from .iuv_contract import IUVDetection, IUVProvider

import jax.numpy as jnp

SETS = ("train", "test", "valid")


# -- stage 1: class-filtered sample ---------------------------------------------------


def sample_data(cfg, sets: Sequence[str] = SETS) -> None:
    """Filter labels to l <= SAMPLE_CLASS and copy the .avi pairs into 1_Sample
    (chalearn_sample_data.py:19-66)."""
    iso_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.ISO)
    sample_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.SAMPLE)
    allow = int(cfg.CHALEARN.SAMPLE_CLASS)
    for name_of_set in sets:
        txt = iso_root / "IsoGD_labels" / f"{name_of_set}.txt"
        with txt.open() as f:
            labels = parse_label_lines(f.readlines())
        labels = [(m, k, l) for (m, k, l) in labels if l <= allow]
        write_labels(cfg, name_of_set, labels)
        # Reference copies <ISO>/<set>/<m> -> <SAMPLE>/<m>, where label entries
        # already carry the '<set>/xxx/...' prefix (chalearn_sample_data.py:38-45).
        for m, k, _ in labels:
            for rel in (m, k):
                src = iso_root / name_of_set / rel
                dst = sample_root / rel
                if dst.exists():
                    continue
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy(src, dst)


# -- stage 2a: frames -----------------------------------------------------------------


def _decode_video(path: Path) -> List[np.ndarray]:
    cap = cv2.VideoCapture(str(path))
    frames = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()
    return frames


def _sample_videos(cfg) -> List[Path]:
    sample_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.SAMPLE)
    return [Path(p) for p in sorted(glob(str(sample_root / "**" / "*.avi"), recursive=True))]


def _rel_parts(video: Path):
    """(set, xxx, stem) from .../<set>/<xxx>/M_xxxxx.avi."""
    return video.parent.parent.name, video.parent.name, video.stem


def video_to_images(cfg) -> None:
    """Every IMG_SAMPLE_INTERVAL-th frame as %05d.jpg (chalearn_video_to_images.py)."""
    img_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.IMG)
    interval = int(cfg.CHALEARN.IMG_SAMPLE_INTERVAL)
    for video in _sample_videos(cfg):
        name_of_set, xxx, stem = _rel_parts(video)
        folder = img_root / name_of_set / xxx / stem
        folder.mkdir(parents=True, exist_ok=True)
        for num, frame in enumerate(_decode_video(video)):
            if num % interval == 0:
                ok = cv2.imwrite(str(folder / f"{num:05d}.jpg"), frame)
                assert ok, folder  # cv2.imwrite fails silently otherwise (:31)


# -- stage 2b: optical flow -----------------------------------------------------------


def video_to_flow(
    cfg,
    flow_params: FlowParams = DEFAULT_PARAMS,
    chunk: int = 64,
    rgb_only: bool = True,
) -> None:
    """Per-frame flow images for every M_ video (chalearn_video_to_flow.py).

    The pyflow-with-Pool(18) CPU fan-out becomes one batched device call per chunk
    of frames; frame t flows against t-1, frame 0 against itself.
    """
    flow_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.FLOW)
    for video in _sample_videos(cfg):
        if rgb_only and not video.name.startswith("M_"):
            continue
        name_of_set, xxx, stem = _rel_parts(video)
        folder = flow_root / name_of_set / xxx / stem
        folder.mkdir(parents=True, exist_ok=True)
        frames = _decode_video(video)
        if not frames:
            continue
        arr = np.stack(frames)  # (T, H, W, 3) uint8
        outs = []
        start = 0
        while start < len(arr):
            end = min(len(arr), start + chunk)
            # Prepend the previous frame so pair (start-1, start) is computed
            # inside the chunk; drop the duplicated first output.
            lo = max(0, start - 1)
            piece = np.asarray(video_flow_uint8(jnp.asarray(arr[lo:end]), flow_params))
            outs.append(piece if start == 0 else piece[1:])
            start = end
        flow_imgs = np.concatenate(outs, axis=0)
        assert flow_imgs.shape[0] == len(arr)  # count parity (:76)
        for num in range(flow_imgs.shape[0]):
            cv2.imwrite(str(folder / f"{num:05d}.jpg"), flow_imgs[num])


def filter_img_by_flow(cfg, keep_fraction: float = 0.3, min_keep: int = 8) -> None:
    """Keep the top-energy frames per video -> 2_Images_energy
    (chalearn_filter_img_by_flow.py:43-80)."""
    flow_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.FLOW)
    energy_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.IMG_ENERGY)
    for video in _sample_videos(cfg):
        if not video.name.startswith("M_"):
            continue
        name_of_set, xxx, stem = _rel_parts(video)
        flow_files = sorted(glob(str(flow_root / name_of_set / xxx / stem / "*.jpg")))
        if not flow_files:
            continue
        flows = np.stack([cv2.imread(f) for f in flow_files])
        keep_idx, _ = flow_energy_filter(jnp.asarray(flows), keep_fraction, min_keep)
        keep_nums = {int(Path(flow_files[i]).stem) for i in np.asarray(keep_idx)}
        target = energy_root / name_of_set / xxx / stem
        target.mkdir(parents=True, exist_ok=True)
        for num, frame in enumerate(_decode_video(video)):
            if num in keep_nums:
                cv2.imwrite(str(target / f"{num:05d}.jpg"), frame)


# -- stage 3: 2x padding --------------------------------------------------------------


def image_to_padded(cfg) -> None:
    """Center every 2_Images frame in a 2H x 2W zero canvas -> 3_Pad
    (chalearn_image_to_padded.py:16-22); covers both M_ and K_ modalities."""
    img_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.IMG)
    pad_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.PAD)
    for img in sorted(glob(str(img_root / "**" / "*.jpg"), recursive=True)):
        rel = Path(img).relative_to(img_root)
        target = pad_root / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        frame = cv2.imread(img)
        h, w, c = frame.shape
        canvas = np.zeros((2 * h, 2 * w, c), frame.dtype)
        canvas[h // 2 : h // 2 + h, w // 2 : w // 2 + w] = frame
        cv2.imwrite(str(target), canvas)


# -- stage 4: IUV detection -----------------------------------------------------------


def _iuv_to_dict(det: IUVDetection) -> dict:
    """Reference pkl schema (chalearn_iuv_to_crop.py:105-106,207-213), numpy-valued."""
    return {
        "file_name": det.file_name,
        "pred_boxes_XYXY": det.boxes_xyxy,
        "scores": det.scores,
        "pred_densepose": [{"labels": det.labels, "uv": det.uv}],
    }


def padded_to_iuv(cfg, provider: IUVProvider, stage_key: str = "IUV",
                  sets: Sequence[str] = SETS) -> None:
    """Detect on every padded M_ frame; one pkl per class folder
    (chalearn_padded_to_iuv.py:31-45); skip-if-exists (:38-40)."""
    pad_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.PAD)
    iuv_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN[stage_key])
    for name_of_set in sets:
        for class_dir in sorted((pad_root / name_of_set).glob("*")):
            out = iuv_root / name_of_set / f"{class_dir.name}.pkl"
            if out.exists():
                continue
            frames, names = [], []
            for img in sorted(class_dir.glob("M_*/*.jpg")):
                frames.append(cv2.imread(str(img)))
                names.append(str(img))
            if not frames:
                continue
            results = []
            # Frames within a video share a shape; batch per shape group.
            by_shape: dict = {}
            for f, n in zip(frames, names):
                by_shape.setdefault(f.shape, []).append((f, n))
            for group in by_shape.values():
                imgs = np.stack([g[0] for g in group])
                dets = provider.detect(imgs, [g[1] for g in group])
                results.extend(_iuv_to_dict(d) for d in dets)
            out.parent.mkdir(parents=True, exist_ok=True)
            with out.open("wb") as f:
                pickle.dump(results, f)


def padded_to_cse(cfg, provider: IUVProvider, sets: Sequence[str] = SETS) -> None:
    """CSE variant -> 4_CSE (produced, never consumed downstream — parity with
    chalearn_padded_to_cse.py)."""
    padded_to_iuv(cfg, provider, stage_key="CSE", sets=sets)


# -- stage 5: part crops --------------------------------------------------------------


def _load_flow_stack(cfg, body_img_path: Path) -> np.ndarray:
    """The 5 flow frames covering a sampled frame's interval
    (chalearn_iuv_to_crop.py:25-59): numbers img_num-interval+1 .. img_num, clamped
    at 0."""
    interval = int(cfg.CHALEARN.IMG_SAMPLE_INTERVAL)
    img_num = int(body_img_path.stem)
    nums = [max(i, 0) for i in range(img_num - interval + 1, img_num + 1)]
    name_of_set, xxx, m_folder = body_img_path.parent.parts[-3:]
    base = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.FLOW, name_of_set, xxx, m_folder)
    stack = []
    for n in nums:
        p = base / f"{n:05d}.jpg"
        if not p.exists():
            raise FileNotFoundError(f"image has RGB but no flow: {body_img_path} -> {p}")
        stack.append(cv2.imread(str(p)))
    return np.stack(stack)  # (interval, H, W, 3)


def _crop_write(img: np.ndarray, x: int, y: int, w: int, h: int, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img[y : y + h, x : x + w])


def iuv_to_crop(cfg, sets: Sequence[str] = SETS,
                parts: Optional[List] = None) -> None:
    """Body + part crops from the IUV dumps (chalearn_iuv_to_crop.py:61-242).

    Per frame: argmax-score box -> CropBody RGB + 5 padded-flow crops + depth crop;
    then per part group: chart mask -> largest-component bbox (device kernel,
    batched over all part groups at once) -> part RGB / U / V / F0..F4 / D crops.
    """
    parts = parts if parts is not None else crop_part_args
    pad_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.PAD)
    iuv_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.IUV)
    crop_body_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.CROP_BODY)

    for name_of_set in sets:
        for pkl_path in sorted((iuv_root / name_of_set).glob("*.pkl")):
            with pkl_path.open("rb") as f:
                iuv_res = pickle.load(f)
            for item in iuv_res:
                file_path = Path(item["file_name"])
                x_img, x5 = file_path.name, file_path.parent.name
                if "K_" in x5:
                    continue  # depth frames never carry IUV (:195-197)
                x3 = pkl_path.stem
                x3x5img = Path(x3, x5, x_img)
                nsetx3x5img = Path(name_of_set, x3x5img)
                pad_img_path = pad_root / nsetx3x5img
                crop_img_path = crop_body_root / nsetx3x5img
                if item["pred_boxes_XYXY"].shape[0] == 0:
                    print(f"No box detection: {pad_img_path}")
                    continue
                best = int(np.argmax(item["scores"]))
                bx1, by1, bx2, by2 = item["pred_boxes_XYXY"][best].astype(int)
                if bx2 - bx1 < 1 or by2 - by1 < 1:
                    print(f"Degenerate box detection: {pad_img_path}")
                    continue

                # -- body crop + companions (crop_body, :61-94)
                img = cv2.imread(str(pad_img_path))
                _crop_write(img, bx1, by1, bx2 - bx1, by2 - by1, crop_img_path)
                flow = _load_flow_stack(cfg, pad_img_path)
                for i in range(flow.shape[0]):
                    fh, fw, fc = flow[i].shape
                    fpad = np.zeros((fh * 2, fw * 2, fc), img.dtype)
                    fpad[fh // 2 : fh // 2 + fh, fw // 2 : fw // 2 + fw] = flow[i]
                    _crop_write(fpad, bx1, by1, bx2 - bx1, by2 - by1,
                                crop_img_path.parent / f"F{i}_{crop_img_path.name}")
                depth_path = pad_img_path.parent.parent / x5.replace("M_", "K_") / x_img
                depth = cv2.imread(str(depth_path))
                _crop_write(depth, bx1, by1, bx2 - bx1, by2 - by1,
                            crop_img_path.parent / f"D_{crop_img_path.name}")

                # -- part crops (crop_body_parts, :98-183)
                I = np.asarray(item["pred_densepose"][0]["labels"])
                UV = np.asarray(item["pred_densepose"][0]["uv"])
                body_img = cv2.imread(str(crop_img_path))

                masks = np.stack(
                    [np.asarray(part_mask(jnp.asarray(I), idxs)) for idxs, _ in parts]
                )
                bboxes, valids = largest_component_bbox_batch(jnp.asarray(masks))
                bboxes, valids = np.asarray(bboxes), np.asarray(valids)

                for (part_indices, save_name), (x, y, w, h), valid in zip(
                    parts, bboxes, valids
                ):
                    if not valid:
                        continue  # no component or < MIN_PART_SIZE (:122-123,148-149)
                    target = Path(cfg.CHALEARN.ROOT, save_name, nsetx3x5img)
                    if target.exists():
                        continue  # do-not-overwrite (:111-112)
                    _crop_write(body_img, x, y, w, h, target)
                    u8 = (UV[0][y : y + h, x : x + w] * 256.0).astype(np.uint8)
                    v8 = (UV[1][y : y + h, x : x + w] * 256.0).astype(np.uint8)
                    cv2.imwrite(str(target.parent / f"U_{target.name}"), u8)
                    cv2.imwrite(str(target.parent / f"V_{target.name}"), v8)
                    for i in range(int(cfg.CHALEARN.IMG_SAMPLE_INTERVAL)):
                        fimg = cv2.imread(
                            str(crop_img_path.parent / f"F{i}_{crop_img_path.name}")
                        )
                        _crop_write(fimg, x, y, w, h,
                                    target.parent / f"F{i}_{target.name}")
                    dimg = cv2.imread(
                        str(crop_img_path.parent / f"D_{crop_img_path.name}")
                    )
                    _crop_write(dimg, x, y, w, h, target.parent / f"D_{target.name}")


def run_full_pipeline(cfg, provider: IUVProvider,
                      flow_params: FlowParams = DEFAULT_PARAMS,
                      sets: Sequence[str] = SETS) -> None:
    """The whole offline chain (run_data_preprocess.sh:8-15)."""
    sample_data(cfg, sets)
    video_to_images(cfg)
    video_to_flow(cfg, flow_params)
    image_to_padded(cfg)
    padded_to_iuv(cfg, provider, sets=sets)
    iuv_to_crop(cfg, sets=sets)
