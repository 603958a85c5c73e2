"""Online training path: raw 1_Sample videos -> model-ready clips, zero stage folders.

This inverts the reference's materialize-everything architecture
(`run_data_preprocess.sh:8-15`: six stage folders of JPEGs between the raw
videos and the trainer): with ``cfg.DATA.BACKEND = 'online'`` the Trainer's
dataset decodes the raw M_/K_ .avi pair and produces the (T, size, size, 21)
uint8 clips directly through the fused device graph
(pipeline/device_pipeline.preprocess_clip_on_device — flow, 2x pad, body crop,
part CC boxes, UV rasterization, crop + resize in one jit program). Nothing is
ever written to disk.

Detections are per-sampled-frame inputs to the graph, produced by a pluggable
detector: ``synthetic`` (deterministic geometry — tests and untrained runs) or
``densepose`` (the in-graph DensePoseRCNN with converted weights,
cfg.DATA.DENSEPOSE_PKL). This mirrors the deployment split: detection runs once
per sampled frame; flow/crop/train run per clip.

Clip windows: training samples ``CLIP_LEN`` *sampled* frames (every
IMG_SAMPLE_INTERVAL-th raw frame) with the reference's wraparound policy
(chalearn_dataset.py:123-129); eval uses stride-4 sliding windows (:131-140).
For each sampled frame the window carries its ``interval-1`` preceding raw
frames so the device flow computes the same F0..F4 companions the offline
chain stores (chalearn_iuv_to_crop.py:25-59). At a wraparound seam the first
companion pair spans the seam — one of five flow frames, the same boundary
clamping the reference applies at video start.
"""

from __future__ import annotations

import functools
import random as pyrandom
import warnings
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.crop_cfg import crop_part_args, crop_resize_dict
from ..data.dataset import MISSING_FILL, NUM_MODALITY_CHANNELS
from ..ops.flow import FlowParams
from ..ops.sampling import random_clip_indices, uniform_clip_indices
from ..utils.chunked import run_chunked
from ..utils.labels import get_labels
from .device_pipeline import Detections, preprocess_clip_on_device


def flow_params_from_cfg(cfg) -> FlowParams:
    return FlowParams(
        n_outer=int(cfg.DATA.FLOW_OUTER),
        n_sor=int(cfg.DATA.FLOW_SOR),
        min_width=int(cfg.DATA.FLOW_MIN_WIDTH),
    )


class SyntheticOnlineDetector:
    """Deterministic detections: centered body box, banded part charts.

    The chart bands cover head (23/24), torso (1/2), hands (3/4) and arms so
    every crop stream finds its component. Coordinates are in the 2x-padded
    frame, matching the device pipeline's contract.
    """

    def __init__(self, heatmap_size: int = 56):
        self.heatmap_size = heatmap_size
        self._chart_cache: Optional[np.ndarray] = None

    def _charts(self) -> np.ndarray:
        if self._chart_cache is None:
            hm = self.heatmap_size
            c = np.zeros((hm, hm), np.int32)
            rows = np.broadcast_to(np.arange(hm)[:, None], (hm, hm))
            cols = np.broadcast_to(np.arange(hm)[None, :], (hm, hm))
            c[(rows < hm // 5)] = 23                                   # head
            c[(rows >= hm // 5) & (rows < 2 * hm // 5)] = 1            # torso
            c[(rows >= hm // 5) & (rows < 2 * hm // 5) & (cols >= hm // 2)] = 2
            arm_band = (rows >= 2 * hm // 5) & (rows < 3 * hm // 5)
            c[arm_band & (cols < hm // 2)] = 7                         # l arm
            c[arm_band & (cols >= hm // 2)] = 6                        # r arm
            hand_band = rows >= 3 * hm // 5  # generous: hand crops must clear
            c[hand_band & (cols < hm // 2)] = 4  # the >=15 px rule in tests
            c[hand_band & (cols >= hm // 2)] = 3
            self._chart_cache = c
        return self._chart_cache

    def __call__(self, padded_frames_bgr: np.ndarray) -> Detections:
        s, ph, pw = padded_frames_bgr.shape[:3]
        h, w = ph // 2, pw // 2
        box = np.asarray([w * 0.6, h * 0.55, w * 1.4, h * 1.45], np.float32)
        hm = self.heatmap_size
        charts = np.broadcast_to(self._charts(), (s, hm, hm))
        uu = np.linspace(0.0, 1.0, hm, dtype=np.float32)
        uv = np.broadcast_to(
            np.stack([np.tile(uu, (hm, 1)), np.tile(uu[:, None], (1, hm))]),
            (s, 2, hm, hm),
        )
        return Detections(
            boxes_xyxy=jnp.asarray(np.tile(box, (s, 1))),
            valid=jnp.ones((s,), bool),
            charts=jnp.asarray(charts),
            uv=jnp.asarray(uv),
        )


class DensePoseOnlineDetector:
    """In-graph DensePoseRCNN detections for the online path.

    Runs the detector per sampled (2x-padded) frame and keeps the best valid
    detection — the reference's argmax-score policy
    (chalearn_iuv_to_crop.py:212-213).
    """

    def __init__(self, cfg, variables=None, depth: int = 101,
                 pre_nms_topk: int = 256, post_nms_topk: int = 64,
                 max_detections: int = 8, chart_pooler_size: int = 28,
                 batch_size: int = 20, allow_random_init: bool = False,
                 compute_dtype: str = "auto"):
        from ..detect.densepose import DensePoseRCNN

        if variables is None and str(cfg.DATA.DENSEPOSE_PKL):
            from ..detect.d2_convert import load_densepose_variables

            variables = load_densepose_variables(cfg.DATA.DENSEPOSE_PKL, depth=depth)
        if variables is None and not allow_random_init:
            raise ValueError(
                "DensePoseOnlineDetector has no weights: set DATA.DENSEPOSE_PKL "
                "to a detectron2 model_final_*.pkl (converted via "
                "detect/d2_convert) or pass variables=... explicitly. Training "
                "on a randomly initialized detector produces garbage crops; "
                "tests that want that must pass allow_random_init=True."
            )
        self._allow_random_init = allow_random_init
        # bfloat16 compute on TPU (like detect/provider): the convs ride the
        # MXU at 2x; chart_topk=1 because only the argmax-score detection is
        # kept (the ~30 GFLOP/ROI DeepLab chart head would otherwise run
        # max_detections times for one consumed result).
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        self.model = DensePoseRCNN(
            depth=depth, pre_nms_topk=pre_nms_topk, post_nms_topk=post_nms_topk,
            max_detections=max_detections, chart_pooler_size=chart_pooler_size,
            chart_topk=1, dtype=jnp.dtype(compute_dtype))
        self.heatmap_size = self.model.heatmap_size
        self.variables = variables
        from ..detect.provider import PIXEL_MEAN

        mean = jnp.asarray(PIXEL_MEAN)

        def one(variables, frame):
            res = self.model.apply(variables, frame.astype(jnp.float32) - mean,
                                   train=False)
            # Keep order is score-descending, so the best detection is row 0 —
            # the row chart_topk=1 computed a chart for.
            best = jnp.argmax(res["scores"])
            return (res["boxes"][best], res["valid"][best],
                    res["charts"][0], jnp.stack([res["u"][0], res["v"][0]]))

        # Fixed-size frame batches: vmap over the static-shape single-frame
        # graph — batched convs on the MXU, one transfer per chunk instead of
        # one jit round-trip per frame; utils/chunked pads the remainder so
        # one program serves every call. Default 20 = one chunk per clip's
        # sampled frames with zero padding — the measured per-clip optimum at
        # 480x640 (r3 sweep, ms/frame: 4->6.7, 8->5.6, 16->5.2, 20->5.7; 16
        # loses per clip to 12 padded frames: 20x5.66=113 ms vs 32x5.23=167).
        self.batch_size = max(1, int(batch_size))
        self._batch = jax.jit(
            lambda variables, frames: jax.vmap(partial(one, variables))(frames)
        )

    def __call__(self, padded_frames_bgr: np.ndarray) -> Detections:
        if self.variables is None:
            assert self._allow_random_init  # constructor enforces the pkl
            x = jnp.asarray(padded_frames_bgr[0], jnp.float32)
            self.variables = self.model.init(jax.random.PRNGKey(0), x, train=False)
        # Deliberately NOT to_host (contrast detect/provider.py): these
        # detections feed straight into the device preprocessing graph, the
        # clip is a bounded CLIP_LEN frames (not a whole video), and a host
        # round-trip through the ~5 MB/s tunnel would dwarf the detector
        # itself.
        boxes, valid, charts, uv = run_chunked(
            partial(self._batch, self.variables), padded_frames_bgr,
            self.batch_size)
        return Detections(boxes_xyxy=boxes, valid=valid,
                          charts=charts.astype(jnp.int32), uv=uv)


def make_online_detector(cfg):
    kind = str(cfg.DATA.ONLINE_DETECTOR)
    if kind == "synthetic":
        return SyntheticOnlineDetector()
    if kind == "densepose":
        # Raises unless DATA.DENSEPOSE_PKL is set: silently training on a
        # random-init detector must never happen through the config path.
        # One detector chunk per clip's CLIP_LEN sampled frames: zero padding
        # waste for any config (the r3 batch sweep's per-clip optimum).
        return DensePoseOnlineDetector(
            cfg, batch_size=max(1, int(cfg.CHALEARN.CLIP_LEN)))
    raise ValueError(f"unknown DATA.ONLINE_DETECTOR: {kind}")


@functools.lru_cache(maxsize=None)
def _jitted_preprocess(interval: int, parts_key, flow_params: FlowParams,
                       sampled_start: int):
    """One compiled fused-preprocessing graph per distinct configuration.

    Shared across OnlineVideoDataset instances (jit caches by callable
    identity, so a per-instance functools.partial would recompile per
    instance — minutes through the TPU tunnel; engine/predictor.py constructs
    a fresh dataset per video and must reuse the compiled graph)."""
    parts = tuple((list(ids), folder) for ids, folder in parts_key)
    return jax.jit(partial(
        preprocess_clip_on_device,
        interval=interval, parts=parts, flow_params=flow_params,
        sampled_start=sampled_start,
    ))


class OnlineVideoDataset:
    """Drop-in for ChalearnVideoDataset: same get_train_clip/get_eval_clips
    contract, fed from raw videos through the fused device graph."""

    def __init__(self, cfg, name_of_set: str, sampling: Optional[str] = None,
                 detector=None, flow_params: Optional[FlowParams] = None,
                 labels=None) -> None:
        """``labels`` overrides the label file with explicit (m_rel, k_rel,
        label) entries — absolute video paths work too (Path join keeps them);
        the serving path (engine/predictor.py) uses this to run on ad-hoc
        videos outside any dataset."""
        assert name_of_set in ("train", "test", "valid")
        self.cfg = cfg
        self.name_of_set = name_of_set
        self.clip_len = int(cfg.CHALEARN.CLIP_LEN)
        self.interval = int(cfg.CHALEARN.IMG_SAMPLE_INTERVAL)
        self.crop_folder = cfg.MODEL.R3D_INPUT
        self.crop_size = crop_resize_dict[self.crop_folder]
        self.labels = labels if labels is not None else get_labels(cfg, name_of_set)
        self.sampling = sampling or ("random" if name_of_set == "train" else "uniform")
        self.detector = detector if detector is not None else make_online_detector(cfg)
        self.flow_params = flow_params or flow_params_from_cfg(cfg)
        parts = [p for p in crop_part_args if p[1] == self.crop_folder]
        if not parts:
            raise ValueError(f"{self.crop_folder} is not a part-crop stream")
        self._parts = tuple(parts)
        self._decode_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._seq_len_cache: Dict[int, int] = {}
        # Per-(video, raw frame) detection results: stride-4 eval windows
        # share 16/20 sampled frames and epochs revisit identical frames —
        # without this the detector (the most expensive kernel in the chain)
        # reruns ~5x per frame at eval. Keyed video -> {raw_idx: (box, valid,
        # chart, uv) host arrays}; evicted per video, same bound as
        # _decode_cache.
        self._det_cache: Dict[int, Dict[int, Tuple]] = {}
        self.detector_calls = 0  # frames actually sent to the detector (tests)
        # Container frame-count metadata is spot-checked against one real
        # decode before anything trusts it (see _seq_len_sampled).
        self._metadata_ok: Optional[bool] = None
        parts_key = tuple((tuple(ids), folder) for ids, folder in self._parts)
        # The virtual window carries `interval` leading context frames so
        # every sampled frame's flow companions are real frame pairs.
        self._preprocess = _jitted_preprocess(
            self.interval, parts_key, self.flow_params, self.interval)

    def __len__(self) -> int:
        return len(self.labels)

    # -- decode ------------------------------------------------------------------

    def _decode(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        if index in self._decode_cache:
            return self._decode_cache[index]
        import cv2

        m_rel, k_rel, _ = self.labels[index]
        root = Path(self.cfg.CHALEARN.ROOT, self.cfg.CHALEARN.SAMPLE)

        def read(path, gray):
            cap = cv2.VideoCapture(str(path))
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if gray:
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)[..., None]
                frames.append(frame)
            cap.release()
            return np.stack(frames) if frames else None

        rgb = read(root / m_rel, gray=False)
        depth = read(root / k_rel, gray=True)
        if rgb is None:
            rgb = np.full((1, 64, 64, 3), MISSING_FILL, np.uint8)
        if depth is None or depth.shape[0] != rgb.shape[0]:
            depth = np.full(rgb.shape[:3] + (1,), MISSING_FILL, np.uint8)
        if len(self._decode_cache) >= 8:
            self._decode_cache.pop(next(iter(self._decode_cache)))
        self._decode_cache[index] = (rgb, depth)
        return rgb, depth

    def _metadata_frame_count(self, index: int) -> int:
        import cv2

        m_rel, _, _ = self.labels[index]
        cap = cv2.VideoCapture(
            str(Path(self.cfg.CHALEARN.ROOT, self.cfg.CHALEARN.SAMPLE, m_rel)))
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return n

    def _seq_len_sampled(self, index: int) -> int:
        # Cached, and counted from container metadata when possible: eval
        # batch-packing asks every video for its clip count up front
        # (data/dataset.eval_batches), which must not cost a full decode of
        # the test set per epoch. CAP_PROP_FRAME_COUNT is container metadata
        # and can lie (AVI with broken indices), so the FIRST metadata read
        # per dataset is verified against a real decode; on mismatch the
        # dataset distrusts metadata entirely and decodes (the check runs
        # before any clip count is promised to eval batch-packing, so counts
        # stay consistent within an epoch).
        if index in self._seq_len_cache:
            return self._seq_len_cache[index]
        if index in self._decode_cache:
            n = self._decode_cache[index][0].shape[0]
        elif self._metadata_ok is False:
            n = self._decode(index)[0].shape[0]
        else:
            n = self._metadata_frame_count(index)
            if self._metadata_ok is None and n > 0:
                decoded = self._decode(index)[0].shape[0]
                self._metadata_ok = (n == decoded)
                if not self._metadata_ok:
                    warnings.warn(
                        f"container frame-count metadata ({n}) != decoded "
                        f"frames ({decoded}) for {self.labels[index][0]}; "
                        "falling back to decode-derived sequence lengths")
                n = decoded
            elif n <= 0:  # unreadable metadata: fall back to a real decode
                n = self._decode(index)[0].shape[0]
        val = max(-(-n // self.interval), 1)
        self._seq_len_cache[index] = val
        return val

    # -- clip assembly -----------------------------------------------------------

    def _virtual_window(self, sampled_idx: List[int], t_video: int) -> np.ndarray:
        """Raw-frame indices of the virtual window: sampled frame k sits at
        virtual position (k+1)*interval, preceded by its interval-1 flow
        companions AND one extra leading frame (position k*interval+1's flow
        is the real pair (raw-interval, raw-interval+1), matching the offline
        2_Flow chain, chalearn_iuv_to_crop.py:25-31); indices clamp at the
        video start where the reference's flows clamp too."""
        iv = self.interval
        n = len(sampled_idx) * iv + 1
        raw = np.zeros((n,), np.int64)
        raw[0] = sampled_idx[0] * iv - iv
        for j in range(1, n):
            k = (j - 1) // iv
            delta = (k + 1) * iv - j
            raw[j] = sampled_idx[k] * iv - delta
        return np.clip(raw, 0, t_video - 1)

    def _detections_for(self, index: int, frames: np.ndarray,
                        raw_sampled: np.ndarray) -> Detections:
        """Per-sampled-frame detections, cached by raw frame index.

        The reference computes detections once per frame and reuses them from
        disk across epochs and eval windows (chalearn_padded_to_iuv.py:38-40
        skip-if-exists); stride-4 eval windows share 16/20 sampled frames, so
        re-detecting per clip window would cost ~5x the detector work. The
        detector only sees frames absent from the cache; results are stored as
        host arrays per (video, raw frame).
        """
        if index not in self._det_cache:
            if len(self._det_cache) >= 8:
                self._det_cache.pop(next(iter(self._det_cache)))
            self._det_cache[index] = {}
        cache = self._det_cache[index]
        missing = sorted({int(r) for r in raw_sampled} - cache.keys())
        if missing:
            h, w = frames.shape[1:3]
            padded = np.zeros((len(missing), 2 * h, 2 * w, 3), np.uint8)
            padded[:, h // 2 : h // 2 + h, w // 2 : w // 2 + w] = frames[missing]
            dets = self.detector(padded)
            self.detector_calls += len(missing)
            boxes, valid, charts, uv = jax.device_get(
                (dets.boxes_xyxy, dets.valid, dets.charts, dets.uv))
            for j, r in enumerate(missing):
                cache[r] = (boxes[j], valid[j], charts[j], uv[j])
        rows = [cache[int(r)] for r in raw_sampled]
        return Detections(
            boxes_xyxy=jnp.asarray(np.stack([r[0] for r in rows])),
            valid=jnp.asarray(np.stack([r[1] for r in rows])),
            charts=jnp.asarray(np.stack([r[2] for r in rows])),
            uv=jnp.asarray(np.stack([r[3] for r in rows])),
        )

    def _make_clip(self, index: int, sampled_idx: List[int],
                   device: bool = False) -> np.ndarray:
        """``device=True`` returns the clip as a device array (no device_get):
        the serving path chains it straight into the jitted eval step — a
        fetched-then-reuploaded uint8 clip costs two ~15 MB transfers per clip
        through the TPU tunnel (the measured predictor latency was transfer-
        dominated before this)."""
        rgb, depth = self._decode(index)
        raw_idx = self._virtual_window(sampled_idx, rgb.shape[0])
        frames = rgb[raw_idx]
        depth_w = depth[raw_idx]
        s = len(sampled_idx)
        sampled_pos = np.arange(self.interval, frames.shape[0], self.interval)
        assert len(sampled_pos) == s
        dets = self._detections_for(index, rgb, raw_idx[sampled_pos])
        out = self._preprocess(jnp.asarray(frames), jnp.asarray(depth_w), dets)
        clip = out[self.crop_folder]
        assert clip.shape == (s, self.crop_size, self.crop_size,
                              NUM_MODALITY_CHANNELS)
        if device:
            return clip
        return np.asarray(jax.device_get(clip))

    # -- public API (ChalearnVideoDataset contract) --------------------------------

    def get_train_clip(self, index: int, rng: pyrandom.Random) -> Dict:
        seq = self._seq_len_sampled(index)
        idx = random_clip_indices(seq, self.clip_len, rng)
        return {"x": self._make_clip(index, idx),
                "label": self.labels[index][2] - 1}

    def get_eval_clips(self, index: int, rng: pyrandom.Random,
                       device: bool = False) -> Dict:
        seq = self._seq_len_sampled(index)
        clips = uniform_clip_indices(seq, self.clip_len, rng)
        xs = [self._make_clip(index, ci, device=device) for ci in clips]
        return {"clips": xs, "label": self.labels[index][2] - 1}

    def num_eval_clips(self, index: int) -> int:
        from ..ops.sampling import num_uniform_clips

        return num_uniform_clips(self._seq_len_sampled(index), self.clip_len)
