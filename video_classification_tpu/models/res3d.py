"""Single-pathway 3D ResNet-50 (the reference's `res3d` model).

The reference's res3d path loads torchhub ``slow_r50`` with its stem conv rewired to
5 input channels (code disabled but config retained: `/root/reference/train.py:79-89`,
`config/res3d.yaml`). This rebuilds that capability as the slow pathway of the
SlowFast machinery: stem (1,7,7)/(1,2,2), stages 3-4-6-3 with conv_a kernels
((1,1,1),(1,1,1),(3,1,1),(3,1,1)), conv_b (1,3,3), spatial strides (1,2,2,2),
temporal stride 1, global-average head. Input layout (N, T, H, W, 5).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .slowfast import (MODEL_STAGE_DEPTH, ResBasicStem, ResStage, SLOW_CONV_A,
                       SPATIAL_STRIDES, TEMPORAL_STRIDES)


class Res3D(nn.Module):
    num_classes: int
    stem_dim_out: int = 64
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = ResBasicStem(self.stem_dim_out, name="stem", **kw)(x, train)
        stage_dim_out = self.stem_dim_out * 4
        for idx in range(len(self.depths)):
            x = ResStage(
                self.depths[idx],
                dim_inner=stage_dim_out // 4,
                dim_out=stage_dim_out,
                conv_a_kernel=SLOW_CONV_A[idx],
                temporal_stride=TEMPORAL_STRIDES[idx],
                spatial_stride=SPATIAL_STRIDES[idx],
                name=f"stage_{idx + 1}",
                **kw,
            )(x, train)
            stage_dim_out *= 2
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # global avg pool
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(x).astype(jnp.float32)


def init_res3d(cfg) -> Res3D:
    return Res3D(
        num_classes=cfg.CHALEARN.NUM_CLASS,
        depths=MODEL_STAGE_DEPTH[int(cfg.MODEL.DEPTH)],
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
        param_dtype=jnp.dtype(cfg.TPU.PARAM_DTYPE),
    )
