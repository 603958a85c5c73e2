"""2D ResNet-50 with a 50-channel stem (the reference's `res2d` model).

The reference takes torchvision resnet50 and rewires ``conv1`` to 50 input channels
(`/root/reference/train.py:64-76`): a clip of T=10 frames x 5 channels (BGR+UV) is
stacked into the channel dim, making video classification a 2D problem. This is a
from-scratch flax ResNet-50 (bottleneck 3-4-6-3) with identical shapes; input layout
(N, H, W, C) with C = T*5 = 50.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import batch_norm
from .slowfast import MODEL_STAGE_DEPTH


def _conv2d(features, kernel, strides=(1, 1), *, name, dtype, param_dtype,
            use_bias=False):
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding=tuple((k // 2, k // 2) for k in kernel),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


class Bottleneck2d(nn.Module):
    """Bottleneck residual block.

    ``stride_in_1x1=False`` is the torchvision convention (stride on the 3x3);
    ``True`` is the caffe2/MSRA convention detectron2's released backbones use
    (stride on the first 1x1) — the converted DensePose weights need it.
    """

    dim_inner: int
    dim_out: int
    stride: int = 1
    use_downsample: bool = False
    stride_in_1x1: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        s1 = (self.stride, self.stride) if self.stride_in_1x1 else (1, 1)
        s3 = (1, 1) if self.stride_in_1x1 else (self.stride, self.stride)
        shortcut = x
        if self.use_downsample:
            shortcut = _conv2d(self.dim_out, (1, 1), (self.stride, self.stride),
                               name="downsample_conv", **kw)(x)
            shortcut = batch_norm(train, name="downsample_norm",
                                  param_dtype=self.param_dtype)(shortcut)
        y = _conv2d(self.dim_inner, (1, 1), s1, name="conv1", **kw)(x)
        y = batch_norm(train, name="bn1", param_dtype=self.param_dtype)(y)
        y = nn.relu(y).astype(self.dtype)
        y = _conv2d(self.dim_inner, (3, 3), s3, name="conv2", **kw)(y)
        y = batch_norm(train, name="bn2", param_dtype=self.param_dtype)(y)
        y = nn.relu(y).astype(self.dtype)
        y = _conv2d(self.dim_out, (1, 1), name="conv3", **kw)(y)
        y = batch_norm(train, name="bn3", param_dtype=self.param_dtype)(y)
        return nn.relu((shortcut + y).astype(jnp.float32)).astype(self.dtype)


class ResNet50_2D(nn.Module):
    num_classes: int
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = _conv2d(64, (7, 7), (2, 2), name="conv1", **kw)(x)
        x = batch_norm(train, name="bn1", param_dtype=self.param_dtype)(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        dim_inner, dim_out = 64, 256
        for stage, depth in enumerate(self.depths):
            for j in range(depth):
                stride = 2 if (stage > 0 and j == 0) else 1
                x = Bottleneck2d(
                    dim_inner,
                    dim_out,
                    stride=stride,
                    use_downsample=(j == 0),
                    name=f"layer{stage + 1}_{j}",
                    **kw,
                )(x, train)
            dim_inner *= 2
            dim_out *= 2

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc")(x).astype(jnp.float32)


def init_res2d(cfg) -> ResNet50_2D:
    return ResNet50_2D(
        num_classes=cfg.CHALEARN.NUM_CLASS,
        depths=MODEL_STAGE_DEPTH[int(cfg.MODEL.DEPTH)],
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
        param_dtype=jnp.dtype(cfg.TPU.PARAM_DTYPE),
    )
