"""IUVProvider backed by the JAX DensePose-equivalent network.

Bridges ``DensePoseRCNN`` inference output to the pipeline's IUV contract
(pipeline/iuv_contract.py): picks the best detection per frame, resizes the chart
map (nearest) and U/V fields (bilinear) from heatmap resolution to the box's pixel
size — the role DensePose's post-processor plays in the reference stack.
"""

from __future__ import annotations

from typing import List, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline.iuv_contract import IUVDetection
from .densepose import DensePoseRCNN

# detectron2 image normalization (ImageNet BGR means/stds).
PIXEL_MEAN = np.array([103.53, 116.28, 123.675], np.float32)
PIXEL_STD = np.array([57.375, 57.12, 58.395], np.float32)


class DensePoseIUVProvider:
    def __init__(self, variables=None, depth: int = 50, rng_seed: int = 0):
        self.model = DensePoseRCNN(depth=depth)
        self.variables = variables
        self._rng_seed = rng_seed
        self._apply = jax.jit(
            lambda variables, img: self.model.apply(variables, img, train=False)
        )

    def _ensure_variables(self, image: np.ndarray):
        if self.variables is None:
            x = jnp.asarray(image, jnp.float32)
            self.variables = self.model.init(
                jax.random.PRNGKey(self._rng_seed), x, train=False
            )

    def detect(self, images: np.ndarray, file_names: Sequence[str]) -> List[IUVDetection]:
        out: List[IUVDetection] = []
        for i in range(images.shape[0]):
            img = (images[i].astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
            self._ensure_variables(img)
            res = jax.device_get(self._apply(self.variables, jnp.asarray(img)))
            valid = res["valid"]
            boxes = res["boxes"][valid]
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
            charts = res["charts"][np.flatnonzero(valid)[best]].astype(np.uint8)
            u = res["u"][np.flatnonzero(valid)[best]]
            v = res["v"][np.flatnonzero(valid)[best]]
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
