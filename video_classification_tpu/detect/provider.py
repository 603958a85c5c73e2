"""IUVProvider backed by the JAX DensePose-equivalent network.

Bridges ``DensePoseRCNN`` inference output to the pipeline's IUV contract
(pipeline/iuv_contract.py): picks the best detection per frame, resizes the chart
map (nearest) and U/V fields (bilinear) from heatmap resolution to the box's pixel
size — the role DensePose's post-processor plays in the reference stack
(`/root/reference/chalearn_iuv_to_crop.py:105-106,207-213` consumes exactly
boxes + scores + per-box I labels + UV).

Input handling matches detectron2's DefaultPredictor for the released caffe2
R-101 model: BGR input, mean subtraction with PIXEL_STD=(1,1,1), and
ResizeShortestEdge(min=800, max=1333) with detections scaled back to the
original frame. Pass ``min_size=0`` to skip the resize (tiny tests).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline.iuv_contract import IUVDetection
from ..utils.chunked import run_chunked
from .densepose import DensePoseRCNN

# detectron2 Base-RCNN-FPN pixel stats for caffe2-converted (MSRA) backbones:
# BGR means, unit std (cfg.MODEL.PIXEL_STD defaults to [1,1,1]).
PIXEL_MEAN = np.array([103.53, 116.28, 123.675], np.float32)
PIXEL_STD = np.array([1.0, 1.0, 1.0], np.float32)


class DensePoseIUVProvider:
    def __init__(
        self,
        variables=None,
        depth: int = 101,
        rng_seed: int = 0,
        pre_nms_topk: int = 1000,
        post_nms_topk: int = 1000,
        max_detections: int = 100,
        chart_pooler_size: int = 28,
        min_size: int = 800,
        max_size: int = 1333,
        weights_pkl: Optional[str] = None,
        compute_dtype: str = "auto",
        batch_size: int = 8,
        chart_topk: int = 1,
    ):
        # 'auto': bfloat16 on TPU (MXU-native; ~15% faster inference, detection
        # quality unaffected at uint8-image precision), float32 elsewhere.
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        # chart_topk=1: this provider consumes only the best detection's chart
        # (detect() below, mirroring the reference's argmax-score policy,
        # chalearn_iuv_to_crop.py:212-213) — running the ~30 GFLOP/ROI DeepLab
        # chart head for all `max_detections` boxes would be pure waste.
        self.model = DensePoseRCNN(
            depth=depth,
            pre_nms_topk=pre_nms_topk,
            post_nms_topk=post_nms_topk,
            max_detections=max_detections,
            chart_pooler_size=chart_pooler_size,
            chart_topk=chart_topk,
            dtype=jnp.dtype(compute_dtype),
        )
        if weights_pkl is not None and variables is None:
            from .d2_convert import load_densepose_variables

            variables = load_densepose_variables(weights_pkl, depth=depth)
        self.variables = variables
        self.min_size = min_size
        self.max_size = max_size
        self._rng_seed = rng_seed
        # Frames are detected in fixed-size batches: vmap over the (static-
        # shape) single-image graph batches every conv/head onto the MXU and
        # replaces per-frame host<->device round trips with one per chunk —
        # the dominant cost of the per-frame loop on a remote-tunnel device.
        self.batch_size = max(1, int(batch_size))
        # Always vmapped at the full batch_size — utils/chunked.run_chunked
        # pads the remainder, so ONE program is compiled regardless of the
        # per-call frame count (a recompile costs minutes on the tunnel).
        self._apply_batch = jax.jit(
            lambda variables, imgs: jax.vmap(
                lambda im: self.model.apply(variables, im, train=False)
            )(imgs)
        )

    def _ensure_variables(self, image: np.ndarray):
        if self.variables is None:
            x = jnp.asarray(image, jnp.float32)
            self.variables = self.model.init(
                jax.random.PRNGKey(self._rng_seed), x, train=False
            )

    def _resize_input(self, img: np.ndarray):
        """ResizeShortestEdge(min_size, max_size); returns (resized, scale)."""
        if not self.min_size:
            return img, 1.0
        h, w = img.shape[:2]
        scale = self.min_size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        if (nh, nw) == (h, w):
            return img, 1.0
        return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR), scale

    def detect(self, images: np.ndarray, file_names: Sequence[str]) -> List[IUVDetection]:
        n = images.shape[0]
        if n == 0:
            return []
        # Preprocess all frames on host (uniform input => uniform scale/shape).
        prepped, scales = [], []
        for i in range(n):
            resized, scale = self._resize_input(images[i])
            prepped.append((resized.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD)
            scales.append(scale)
        self._ensure_variables(prepped[0])

        # Batched inference in fixed-size chunks (utils/chunked: one transfer
        # + one statically-shaped program per chunk instead of per frame);
        # to_host bounds peak device memory at one chunk's outputs even for
        # long videos.
        results = run_chunked(
            lambda imgs: self._apply_batch(self.variables, imgs),
            np.stack(prepped), self.batch_size, to_host=True)

        out: List[IUVDetection] = []
        for i in range(n):
            res = jax.tree.map(lambda a: a[i], results)
            scale = scales[i]
            valid = res["valid"]
            boxes = res["boxes"][valid] / scale  # back to original frame coords
            scores = res["scores"][valid]
            name = file_names[i] if i < len(file_names) else ""
            if boxes.shape[0] == 0:
                out.append(
                    IUVDetection(
                        boxes_xyxy=np.zeros((0, 4), np.float32),
                        scores=np.zeros((0,), np.float32),
                        labels=np.zeros((0, 0), np.uint8),
                        uv=np.zeros((2, 0, 0), np.float32),
                        file_name=name,
                    )
                )
                continue
            best = int(np.argmax(scores))
            x1, y1, x2, y2 = boxes[best].astype(int)
            bw, bh = max(int(x2 - x1), 1), max(int(y2 - y1), 1)
            # NMS keep order is score-descending, so the best valid detection
            # is row 0 — which chart_topk guarantees carries a chart; the min
            # is a guard for chart_topk=0 (all rows present).
            row = min(int(np.flatnonzero(valid)[best]),
                      res["charts"].shape[0] - 1)
            charts = res["charts"][row].astype(np.uint8)
            u = res["u"][row]
            v = res["v"][row]
            labels = cv2.resize(charts, (bw, bh), interpolation=cv2.INTER_NEAREST)
            u_full = cv2.resize(u, (bw, bh), interpolation=cv2.INTER_LINEAR)
            v_full = cv2.resize(v, (bw, bh), interpolation=cv2.INTER_LINEAR)
            out.append(
                IUVDetection(
                    boxes_xyxy=boxes.astype(np.float32),
                    scores=scores.astype(np.float32),
                    labels=labels,
                    uv=np.stack([u_full, v_full]).astype(np.float32),
                    file_name=name,
                )
            )
        return out
