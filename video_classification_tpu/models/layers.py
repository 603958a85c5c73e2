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

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
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


class SpaceToDepthConv(nn.Module):
    """Stem conv (1,7,7)/(1,2,2) computed as a (1,4,4)/stride-1 conv in the
    space-to-depth domain.

    The input gradient of a stride-2 convolution is an input-dilated
    (transposed) convolution, which XLA:TPU executes far slower than the
    forward — measured 58 ms of the flagship fast-stem's 218 ms share of a
    533 ms train step (batch 32). Re-expressing the conv over a 2x2
    space-to-depth packing (x: (..., H, W, C) -> (..., H/2, W/2, 4C); kernel
    7x7 -> 4x4 with a leading zero row/col) makes both directions stride-1
    and MXU-friendly: ~3x faster fwd+bwd for the same math (exact up to
    float reassociation).

    The parameter is stored in the canonical nn.Conv layout
    ((1, 7, 7, Cin, features) 'kernel', no bias), so checkpoints, the torch
    converter, and warm starts are unaffected; the rearrangement to the s2d
    kernel is a param-sized reshape traced into the step.

    When ``in_channels`` is set and the input arrives with ``4 * in_channels``
    channels, it is treated as already space-to-depth packed (channel order
    (py, px, c), half spatial size) — ops/image.random_crop_batch_mxu's
    ``space_to_depth=True`` emits that layout straight out of the crop matmul,
    so the repacking transpose never materializes.
    """

    features: int
    in_channels: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, cx = x.shape
        prepacked = self.in_channels is not None and cx == 4 * self.in_channels
        cin = self.in_channels if prepacked else cx
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 7, 7, cin, self.features), self.param_dtype,
        )
        xd = x.astype(self.dtype)
        kd = k.astype(self.dtype)
        if not prepacked and (h % 2 or w % 2):  # odd sizes: plain strided conv
            return jax.lax.conv_general_dilated(
                xd, kd, (1, 2, 2), [(0, 0), (3, 3), (3, 3)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if prepacked:
            xs = xd
        else:
            xs = xd.reshape(b, t, h // 2, 2, w // 2, 2, cin)
            xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                b, t, h // 2, w // 2, 4 * cin)
        # Kernel to s2d domain: pad 7->8 with a zero leading row/col, split each
        # spatial dim into (tap, parity) — tap offsets di,dj in [-2, 1] => SAME
        # padding (2, 1).
        k8 = jnp.pad(kd, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        ks = k8.reshape(1, 4, 2, 4, 2, cin, self.features)
        ks = ks.transpose(0, 1, 3, 2, 4, 5, 6).reshape(1, 4, 4, 4 * cin, self.features)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), ks, (1, 1, 1), [(0, 0), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class BatchNormLean(nn.Module):
    """Bandwidth-lean BatchNorm: f32 statistics, compute-dtype tensor path.

    Functionally equivalent to torch BatchNorm3d(momentum=0.1, eps=1e-5) /
    flax BatchNorm(momentum=0.9), but the large activation tensor is only ever
    read/written in the compute dtype (bfloat16 on TPU): the per-channel mean/var
    reductions accumulate in float32 (XLA fuses the cast into the reduce), and the
    normalization is applied as one fused  x * a + b  with precomputed f32 scalars
    cast down — halving the HBM traffic of the f32-activation formulation, which
    profiling showed dominated the step (the model is HBM-bound, ~17:1
    bytes-to-flops against v5e's ~4:1 balance point).

    Param/stat layout matches flax BatchNorm ({scale, bias} / {mean, var}) so the
    torch converter and checkpoints are unaffected.
    """

    dtype: Any = None  # output/tensor dtype; None = input dtype
    param_dtype: Any = jnp.float32
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        out_dtype = self.dtype or x.dtype
        return x.astype(out_dtype) * inv.astype(out_dtype) + shift.astype(out_dtype)


def batch_norm(train: bool, *, name, param_dtype=jnp.float32, dtype=None) -> BatchNormLean:
    """BatchNorm with torch-parity momentum/eps; float32 statistics, lean I/O."""
    return BatchNormLean(
        use_running_average=not train,
        dtype=dtype,
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
