"""v2 model manager + trainer wiring.

The v2 slice trains ``init_my_slowfast(cfg, (5, 2), (64, 8))`` — rgb+uv (5ch) on
the slow pathway, raw 2-channel flow on the fast pathway — with SGD momentum 0.9
(`/root/reference/new_feature_test.py:715,731-739,832`). Everything else (epoch
loop, uniform-sampling eval with per-video mean scores, best-acc checkpoints, HTAH
fallback) is the shared engine; this module supplies the dataset factory and the
batch preparation.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import optax

from ..engine.trainer import Trainer, TrainState
from ..models import init_my_slowfast
from ..ops.image import random_crop_batch_mxu
from .dataset import ChalearnGestureDataset


class V2ModelManager:
    """Protocol-compatible with engine.ModelManager for the injected Trainer."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.crop_size = int(cfg.MODEL.INPUT_SIZE)

    def init_model(self):
        return init_my_slowfast(self.cfg, (5, 2), (64, 8))

    def prepare_data(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # channels [rgb 3, uv 2, flow 2]: slow = rgb+uv, fast = flow
        # (new_feature_test.py:731-739).
        return [x[..., 0:5], x[..., 5:7]]

    def normalize_and_prepare(self, x_uint8, augment_rng=None):
        # Pathway split first (slicing commutes with the elementwise
        # normalize and the spatial crop) so no consumer reads the full
        # 7-channel normalized tensor; see engine/model_manager.py.
        def proc(p):
            # v2 normalization is x/255 only (new_feature_test.py:600).
            x = p.astype(jnp.float32) * (1.0 / 255.0)
            x = x.astype(jnp.dtype(self.cfg.TPU.COMPUTE_DTYPE))
            if augment_rng is not None:
                # Normalize-then-crop via the MXU one-hot-shift formulation
                # (zero fill exact in either domain for x/255 normalization;
                # same rng per pathway => one shared crop window).
                size = self.crop_size
                x = random_crop_batch_mxu(
                    augment_rng, x, size=size, padding=size // 10,
                    space_to_depth=size % 2 == 0)
            return x

        return [proc(p) for p in self.prepare_data(x_uint8)]


class V2Trainer(Trainer):
    """engine.Trainer with the v2 dataset, model manager and SGD optimizer."""

    def __init__(self, cfg, mesh=None, parts=None):
        factory = lambda c, s: ChalearnGestureDataset(c, s, parts=parts)
        super().__init__(cfg, mesh=mesh, dataset_factory=factory,
                         model_manager=V2ModelManager(cfg))
        # Replace Adam with the v2 optimizer: SGD momentum 0.9
        # (new_feature_test.py:832). Rebuild state + step with the new tx.
        self.tx = optax.sgd(float(cfg.MODEL.LR), momentum=0.9)
        state = TrainState.create(
            apply_fn=self.model.apply,
            params=jax.device_get(self.state.params),
            batch_stats=jax.device_get(self.state.batch_stats),
            tx=self.tx,
        )
        from ..parallel import replicated

        self.state = jax.device_put(state, replicated(self.mesh))
        self._train_step = self._build_train_step()
