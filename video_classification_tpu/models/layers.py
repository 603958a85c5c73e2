"""Shared building blocks for the 3D-CNN model zoo.

Layout convention: all video tensors are channels-last ``(N, T, H, W, C)`` — XLA's
preferred TPU layout — vs the reference's NCTHW. Convolutions run in a configurable
compute dtype (bfloat16 by default, cfg.TPU.COMPUTE_DTYPE) with float32 parameters;
batch-norm statistics are always computed in float32.

BatchNorm parity: torch BatchNorm3d(momentum=0.1, eps=1e-5)
(`/root/reference/model/my_slowfast.py:143-145`) equals flax momentum 0.9. Under
`pjit`/GSPMD the program is global-view, so batch statistics are computed over the
full global batch — cross-replica sync-BN comes for free, no axis_name plumbing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # == torch momentum 0.1
BN_EPS = 1e-5


def same_pad(kernel: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """torch-style padding k//2 per dim (exact for odd kernels)."""
    return tuple((k // 2, k // 2) for k in kernel)


def conv3d(features, kernel, strides=(1, 1, 1), use_bias=False, *, name,
           dtype=jnp.float32, param_dtype=jnp.float32) -> nn.Conv:
    """3D conv over (N, T, H, W, C) with torch-style k//2 padding."""
    return nn.Conv(
        features,
        tuple(kernel),
        strides=tuple(strides),
        padding=same_pad(kernel),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def batch_norm(train: bool, *, name, param_dtype=jnp.float32) -> nn.BatchNorm:
    """BatchNorm with torch-parity momentum/eps; float32 statistics."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=jnp.float32,
        param_dtype=param_dtype,
        name=name,
    )


def max_pool_3d(x, kernel, strides, padding):
    return nn.max_pool(
        x,
        window_shape=tuple(kernel),
        strides=tuple(strides),
        padding=tuple((p, p) for p in padding),
    )


def avg_pool_3d(x, kernel, strides=(1, 1, 1)):
    return nn.avg_pool(x, window_shape=tuple(kernel), strides=tuple(strides), padding="VALID")
