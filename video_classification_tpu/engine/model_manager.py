"""Model dispatch + batch preparation.

Mirrors the reference ``ModelManager`` (`/root/reference/train.py:39-145`): selects
the architecture by ``MODEL.NAME`` ('res2d' | 'res3d' | 'slowfast-*') and owns the
batch -> model-input mapping. The mapping runs *inside* the jitted step on device:
uint8 batches are normalized ((x/255-0.45)/0.225), optionally RandomCrop-augmented,
then split into pathway inputs.

Channel layout of a batch (N, T, H, W, 21), channels-last:
  0:3 BGR, 3:5 UV, 5:20 flow (5 frames x 3ch), 20:21 depth
(matching `_prepare_slowfast_data`, train.py:125-145 — BGRUV to the slow pathway,
flow stack to the fast pathway; depth unused).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

from ..config.crop_cfg import crop_resize_dict
from ..models import init_my_slowfast, init_res2d, init_res3d
from ..ops.image import normalize, random_crop_batch_mxu


class ModelManager:
    def __init__(self, cfg):
        self.cfg = cfg
        name = cfg.MODEL.NAME
        if name == "res2d":
            self.init_model = self._init_res2d
            self.prepare_data = self._prepare_res2d
            self.finish = self._finish_res2d
        elif name == "res3d":
            self.init_model = self._init_res3d
            self.prepare_data = self._prepare_res3d
            self.finish = lambda x: x
        elif "slowfast" in name:
            self.init_model = self._init_slowfast
            self.prepare_data = self._prepare_slowfast
            self.finish = lambda x: x
        else:
            raise NotImplementedError(name)
        # SlowFast stems consume space-to-depth input natively, so the crop
        # matmul can emit that layout directly (zero-cost repacking).
        self.s2d_crop = "slowfast" in name
        self.crop_size = crop_resize_dict[cfg.MODEL.R3D_INPUT]

    # -- model factories ---------------------------------------------------------
    def _init_slowfast(self):
        return init_my_slowfast(self.cfg, (5, 15), (64, 8))

    def _init_res2d(self):
        return init_res2d(self.cfg)

    def _init_res3d(self):
        return init_res3d(self.cfg)

    # -- batch -> model inputs ---------------------------------------------------
    # Channel split first (on the uint8 tensor — slicing commutes with the
    # elementwise normalize and the spatial crop), so no consumer ever reads
    # the full 21-channel normalized tensor: profiled, the post-crop channel
    # split alone cost ~12 ms/step at batch 32 (a 990 MB bf16 copy).
    def _prepare_slowfast(self, x_norm: jnp.ndarray) -> List[jnp.ndarray]:
        # (N,T,H,W,21): bgr+uv 0:5 slow, flow 5:20 fast (train.py:136-145).
        return [x_norm[..., 0:5], x_norm[..., 5:20]]

    def _prepare_res3d(self, x_norm: jnp.ndarray) -> jnp.ndarray:
        return x_norm[..., 0:5]

    def _prepare_res2d(self, x_norm: jnp.ndarray) -> jnp.ndarray:
        return x_norm[..., 0:5]

    def _finish_res2d(self, x_norm: jnp.ndarray) -> jnp.ndarray:
        # NTHWC -> NHW(T*C): T-major channel order, matching torch's
        # reshape(N, T*C, H, W) of NTCHW (train.py:70-76). Runs after the
        # (purely spatial) crop, with which it commutes.
        n, t, h, w, c = x_norm.shape
        x = jnp.transpose(x_norm, (0, 2, 3, 1, 4))
        return x.reshape(n, h, w, t * c)

    def normalize_and_prepare(
        self, x_uint8: jnp.ndarray, augment_rng: jax.Array | None = None
    ) -> Any:
        dtype = jnp.dtype(self.cfg.TPU.COMPUTE_DTYPE)
        parts = self.prepare_data(x_uint8)
        single = not isinstance(parts, (list, tuple))

        def proc(p: jnp.ndarray) -> jnp.ndarray:
            x = normalize(p, dtype=dtype)
            if augment_rng is not None:
                # Normalize-then-RandomCrop, the reference order (zero fill in
                # normalized space, chalearn_dataset.py:41-46,73-87), via the
                # MXU one-hot-shift formulation (ops/image.random_crop_batch_mxu).
                # Same rng per pathway => identical offsets, as in the
                # reference's single crop of the whole 21-channel stack.
                size = self.crop_size
                x = random_crop_batch_mxu(
                    augment_rng, x, size=size, padding=size // 10,
                    space_to_depth=self.s2d_crop and size % 2 == 0)
            return x

        if single:
            return self.finish(proc(parts))
        return [self.finish(proc(p)) for p in parts]
