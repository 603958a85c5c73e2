"""v2 conversion stages: video-native storage of flow, IUV, UV maps and part boxes.

Counterparts of the reference's converters (`/root/reference/new_feature_test.py`):

  * ``ConvertVideoToFlow``   (:158-225) — RAFT-on-GPU there; here the batched
    device variational-flow kernel (ops/flow.py) with the v2 encoding
    (clip ±30 -> /60 + 0.5 -> x255 uint8), written as 2-channel gray videos into
    ``2_Flow_New``; corrupted/empty videos are skipped.
  * ``ConvertVideoToIUVPkl`` (:229-256) — in-process IUVProvider over the padded
    frames -> one pkl per video in ``4_IUV_New`` (skip-if-exists).
  * ``ConvertIuvPklToUvVideo`` (:259-343) — paste the best box's UV chart (x255
    uint8) into the padded canvas at the box origin, un-pad, write as 2-channel
    gray video into ``5_UV_Video`` (skip when the ``0_`` channel file exists).
  * ``ConvertIuvPklToPartBox`` (:348-436) — per frame, per part 1..24, the
    largest-component bbox (device CC kernel, batched over all 24 parts) in
    body-local coords mapped to global un-padded coords; ``[T][25][xyxy|None]``
    pickled into ``6_Box``.

Coordinate conventions follow the reference: IUV boxes live in the 2x-padded
frame; un-padding subtracts (x_pad, y_pad) = (W/2, H/2) of the original frame
(the reference hardcodes 160/120 for 320x240 input; here they derive from the
video geometry).
"""

from __future__ import annotations

import pickle
from glob import glob
from pathlib import Path
from typing import List, Optional

import cv2
import jax.numpy as jnp
import numpy as np

from ..ops.components import largest_component_bbox_batch
from ..ops.flow import DEFAULT_PARAMS, FlowParams, coarse2fine_flow
from ..pipeline.iuv_contract import IUVProvider
from ..utils.chapath import ChaPath
from .video_io import VideoIO

NUM_PARTS = 25  # 0..24, 0 = background


def _sample_m_videos(cfg) -> List[Path]:
    root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.SAMPLE)
    return [Path(p) for p in sorted(glob(str(root / "**" / "M_*.avi"), recursive=True))]


class ConvertVideoToFlow:
    """Raw videos -> 2-channel flow videos (2_Flow_New).

    ``method='variational'`` (default) uses the batched coarse-to-fine kernel;
    ``method='raft'`` uses the RAFT network (models/raft.py) like the reference's
    v2 path (torchvision raft_large, new_feature_test.py:164-165) — pass trained
    ``raft_variables``, or ``raft_checkpoint`` pointing at a torchvision
    raft_large .pth (converted via models/raft_convert.load_raft_checkpoint),
    for meaningful flow.
    """

    def __init__(self, cfg, flow_params: FlowParams = DEFAULT_PARAMS,
                 batch_size: int = 64, method: str = "variational",
                 raft_variables=None, raft_iters: int = 12,
                 raft_checkpoint=None) -> None:
        assert method in ("variational", "raft")
        self.cfg = cfg
        self.flow_base = cfg.CHALEARN.FLOW_VIDEO
        self.params = flow_params
        self.batch_size = batch_size
        self.method = method
        self._raft = None
        if raft_checkpoint is not None and raft_variables is None:
            from ..models.raft_convert import load_raft_checkpoint

            raft_variables = load_raft_checkpoint(raft_checkpoint)
        self._raft_variables = raft_variables
        if method == "raft":
            from ..models.raft import RAFT

            self._raft = RAFT(num_iters=raft_iters)

    def _pairs_flow(self, im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) [0,1] pairs -> (B, 2, H, W) float flow in pixels."""
        if self.method == "raft":
            import jax

            if self._raft_variables is None:
                self._raft_variables = self._raft.init(
                    jax.random.PRNGKey(0), jnp.asarray(im1[:1]), jnp.asarray(im2[:1])
                )
            up, _ = self._raft.apply(
                self._raft_variables, jnp.asarray(im1), jnp.asarray(im2)
            )
            return np.asarray(up).transpose(0, 3, 1, 2)
        u, v = coarse2fine_flow(jnp.asarray(im1), jnp.asarray(im2), self.params)
        return np.stack([np.asarray(u), np.asarray(v)], axis=1)

    def _flow_from_file(self, filename: Path) -> Optional[np.ndarray]:
        frames = VideoIO.read_video(filename, format="rgb24")
        if len(frames) < 2:
            return None
        arr = np.stack(frames).astype(np.float32) / 255.0
        if self.method == "raft":
            # RAFT needs dims divisible by 8: reflect-pad up, crop after.
            h, w = arr.shape[1:3]
            ph, pw = (-h) % 8, (-w) % 8
            arr_in = np.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        else:
            arr_in = arr
        flows = []
        for start in range(0, len(arr) - 1, self.batch_size):
            end = min(len(arr) - 1, start + self.batch_size)
            f = self._pairs_flow(arr_in[start:end], arr_in[start + 1 : end + 1])
            flows.append(f[:, :, : arr.shape[1], : arr.shape[2]])
        flow = np.concatenate(flows, axis=0)  # (T-1, 2, H, W)
        # v2 encoding (new_feature_test.py:222-225).
        flow = np.clip(flow, -30, 30) / 60 + 0.5
        return np.clip(flow * 255, 0, 255).astype(np.uint8)

    def convert(self) -> None:
        for avi in _sample_m_videos(self.cfg):
            flow_arr = self._flow_from_file(avi)
            if flow_arr is None:
                print(f"Skip corrupted file at {avi}")
                continue
            flow_file = ChaPath(avi).change_base(self.flow_base).path
            VideoIO.write_video_TCHW(flow_file, flow_arr)


class ConvertVideoToIUVPkl:
    """Raw videos -> per-video IUV pkl (4_IUV_New)."""

    def __init__(self, cfg, provider: IUVProvider) -> None:
        self.cfg = cfg
        self.iuv_base = cfg.CHALEARN.IUV_NEW
        self.provider = provider

    def convert(self) -> None:
        for avi in _sample_m_videos(self.cfg):
            pkl_path = ChaPath(avi).change_base(self.iuv_base).path.with_suffix(".pkl")
            if pkl_path.exists():
                continue  # skip-if-exists (new_feature_test.py:248-249)
            frames = VideoIO.read_video(avi, format="rgb24")
            if not frames:
                continue
            arr = np.stack(frames)[..., ::-1]  # back to BGR for the detector
            h, w = arr.shape[1:3]
            padded = np.zeros((arr.shape[0], 2 * h, 2 * w, 3), np.uint8)
            padded[:, h // 2 : h // 2 + h, w // 2 : w // 2 + w] = arr
            dets = self.provider.detect(padded, [str(avi)] * len(frames))
            results = [
                {
                    "file_name": str(avi),
                    "pred_boxes_XYXY": d.boxes_xyxy,
                    "scores": d.scores,
                    "pred_densepose": [{"labels": d.labels, "uv": d.uv}],
                }
                for d in dets
            ]
            pkl_path.parent.mkdir(parents=True, exist_ok=True)
            with pkl_path.open("wb") as f:
                pickle.dump(results, f)


class _PadGeometry:
    """Padded-frame geometry of a video (reference hardcodes 240x320)."""

    def __init__(self, cfg, video: Path):
        cap = cv2.VideoCapture(str(video))
        self.img_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.img_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        cap.release()
        self.y_pad = self.img_h // 2
        self.x_pad = self.img_w // 2
        self.pad_h = self.img_h * 2
        self.pad_w = self.img_w * 2


class ConvertIuvPklToUvVideo:
    """IUV pkls -> un-padded UV chart videos (5_UV_Video)."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        self.iuv_base = cfg.CHALEARN.IUV_NEW
        self.uv_vid_base = cfg.CHALEARN.UV_VIDEO

    def _pkl_list(self) -> List[Path]:
        folder = Path(self.cfg.CHALEARN.ROOT, self.iuv_base)
        return [Path(p) for p in sorted(glob(str(folder / "**" / "*.pkl"), recursive=True))]

    def save_uv(self, iuv_pkl: Path, save_path: Path, geo: _PadGeometry) -> None:
        with iuv_pkl.open("rb") as f:
            results = pickle.load(f)
        uv_maps = []
        for result in results:
            bg = np.zeros((2, geo.pad_h, geo.pad_w), np.uint8)
            box = result["pred_boxes_XYXY"]
            if len(box) == 0:
                print("No detection")
            else:
                x1, y1, _, _ = np.asarray(box[0]).astype(int)
                uv = (np.asarray(result["pred_densepose"][0]["uv"]) * 255.0).astype(np.uint8)
                map_h, map_w = uv.shape[1:]
                y2 = min(y1 + map_h, geo.pad_h)
                x2 = min(x1 + map_w, geo.pad_w)
                bg[:, y1:y2, x1:x2] = uv[:, : y2 - y1, : x2 - x1]
            uv_maps.append(
                bg[:, geo.y_pad : geo.y_pad + geo.img_h, geo.x_pad : geo.x_pad + geo.img_w]
            )
        VideoIO.write_video_TCHW(save_path, np.stack(uv_maps))

    def convert(self) -> None:
        for pkl_path in self._pkl_list():
            out = ChaPath(pkl_path).change_base(self.uv_vid_base).path.with_suffix(".avi")
            if (out.parent / f"0_{out.name}").exists():
                continue  # skip-if-exists (new_feature_test.py:317-318)
            video = ChaPath(pkl_path).change_base(self.cfg.CHALEARN.SAMPLE).path.with_suffix(".avi")
            out.parent.mkdir(parents=True, exist_ok=True)
            self.save_uv(pkl_path, out, _PadGeometry(self.cfg, video))


class ConvertIuvPklToPartBox:
    """IUV pkls -> per-video [T][25][xyxy|None] part-box pkl (6_Box)."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        self.iuv_base = cfg.CHALEARN.IUV_NEW
        self.box_base = cfg.CHALEARN.BOX

    def save_box(self, iuv_pkl: Path, box_path: Path, geo: _PadGeometry) -> None:
        with iuv_pkl.open("rb") as f:
            results = pickle.load(f)
        box_list = []
        for result in results:
            box_part: List[Optional[tuple]] = [None] * NUM_PARTS
            human_box = result["pred_boxes_XYXY"]
            if len(human_box) != 0:
                hx1, hy1, _, _ = np.asarray(human_box[0]).astype(int)
                labels = np.asarray(result["pred_densepose"][0]["labels"])
                masks = np.stack([(labels == p) for p in range(1, NUM_PARTS)])
                bboxes, valids = largest_component_bbox_batch(jnp.asarray(masks))
                bboxes, valids = np.asarray(bboxes), np.asarray(valids)
                for p, ((x, y, w, h), valid) in enumerate(zip(bboxes, valids), start=1):
                    if not valid:
                        continue  # not detected or < 15 px (new_feature_test.py:388-391)
                    x1 = int(x) + hx1 - geo.x_pad
                    y1 = int(y) + hy1 - geo.y_pad
                    box_part[p] = (x1, y1, x1 + int(w), y1 + int(h))
            box_list.append(box_part)
        with box_path.open("wb") as f:
            pickle.dump(box_list, f)

    def convert(self) -> None:
        folder = Path(self.cfg.CHALEARN.ROOT, self.iuv_base)
        for pkl_path in sorted(glob(str(folder / "**" / "*.pkl"), recursive=True)):
            pkl_path = Path(pkl_path)
            box_path = ChaPath(pkl_path).change_base(self.box_base).path
            box_path.parent.mkdir(parents=True, exist_ok=True)
            video = ChaPath(pkl_path).change_base(self.cfg.CHALEARN.SAMPLE).path.with_suffix(".avi")
            self.save_box(pkl_path, box_path, _PadGeometry(self.cfg, video))
