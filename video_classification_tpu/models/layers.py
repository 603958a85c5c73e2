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

import functools
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
    def __call__(self, x, prepacked: Optional[bool] = None):
        """``prepacked`` makes the packed-input interpretation explicit; the
        default (None) infers it from the channel count, but only after
        checking the count is one of the two legal layouts — a 4x-channel
        input that was NOT s2d-packed must error, not silently produce a
        quarter-resolution output."""
        b, t, h, w, cx = x.shape
        if self.in_channels is not None and cx not in (
                self.in_channels, 4 * self.in_channels):
            raise ValueError(
                f"SpaceToDepthConv(in_channels={self.in_channels}) got "
                f"{cx} input channels; expected {self.in_channels} (unpacked) "
                f"or {4 * self.in_channels} (2x2 s2d-prepacked)")
        if prepacked is None:
            prepacked = self.in_channels is not None and cx == 4 * self.in_channels
        elif prepacked and cx != 4 * (self.in_channels or cx // 4):
            raise ValueError(f"prepacked=True but {cx} channels is not 4x "
                             f"in_channels={self.in_channels}")
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


def pack_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C), channel order (py, px, c)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (0, 2, 1, 3, 4))
    return x.transpose(perm).reshape(*lead, h // 2, w // 2, 4 * c)


def unpack_2x2(x: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Inverse of pack_2x2: (..., H, W, 4C) -> (..., 2H, 2W, C)."""
    *lead, h, w, _ = x.shape
    x = x.reshape(*lead, h, w, 2, 2, channels)
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (0, 2, 1, 3, 4))
    return x.transpose(perm).reshape(*lead, 2 * h, 2 * w, channels)


@functools.lru_cache(maxsize=None)
def _pack_axis_map(k: int, stride: int):
    """Per-axis tap map for a true (k, stride, pad=k//2) conv in the 2x2-packed
    domain: returns (entries, n_taps, pad) where entries[(phase_out, dy)] =
    (tap_index, phase_in). Exact index algebra: true out o = 2Y + p reads true
    in row stride*o + dy - pad = 2*(packed cell) + phase_in."""
    pad = k // 2
    raw = {}
    offs = []
    for p in range(2):
        for dy in range(k):
            r = stride * p + dy - pad  # in-row offset from 2*stride*Y
            e, q = r // 2, r % 2
            raw[(p, dy)] = (e, q)
            offs.append(e)
    lo, hi = min(offs), max(offs)
    entries = {pq: (e - lo, q) for pq, (e, q) in raw.items()}
    return entries, hi - lo + 1, -lo


def _pack_conv_masks(kernel_hw: Tuple[int, int], strides_hw: Tuple[int, int]):
    """Trace-time 0/1 tensor M[Ay, Ax, qin(4), pout(4), dy, dx] mapping a true
    (kh, kw) spatial kernel onto the packed-domain kernel, plus the packed
    conv's spatial padding. Built once per shape (numpy, kernel-sized)."""
    import numpy as np

    (kh, kw), (sh, sw) = kernel_hw, strides_hw
    ey, ny, pady = _pack_axis_map(kh, sh)
    ex, nx, padx = _pack_axis_map(kw, sw)
    m = np.zeros((ny, nx, 4, 4, kh, kw), np.float32)
    for py in range(2):
        for px in range(2):
            for dy in range(kh):
                for dx in range(kw):
                    ay, qy = ey[(py, dy)]
                    ax, qx = ex[(px, dx)]
                    m[ay, ax, qy * 2 + qx, py * 2 + px, dy, dx] = 1.0
    return jnp.asarray(m), ((pady, ny - 1 - pady), (padx, nx - 1 - padx))


class PackedConv3d(nn.Module):
    """conv3d computed in the 2x2 space-to-depth domain.

    Input/output are packed ((..., H/2, W/2, 4C), (py, px, c) channel order);
    the parameter stays in the canonical (kt, kh, kw, Cin, Cout) layout
    (checkpoints/converters unaffected) and is rearranged to the packed-domain
    kernel (kt, Ay, Ax, 4Cin, 4Cout) by a trace-time einsum with an exact 0/1
    phase map. Same math as conv3d up to float reassociation; 4x the lane
    occupancy for small-channel convs (the fast pathway's 8-64 channel tensors
    otherwise pad to 128 lanes, profiled at 1-5 TFLOP/s and ~16x wasted HBM
    bytes per conv).
    """

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        cin = x.shape[-1] // 4
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, cin, self.features), self.param_dtype,
        )
        m, pad_hw = _pack_conv_masks((kh, kw), (sh, sw))
        kp = jnp.einsum("ABqpyx,tyxio->tABqipo", m.astype(self.dtype),
                        k.astype(self.dtype))
        kp = kp.reshape(kt, m.shape[0], m.shape[1], 4 * cin, 4 * self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (st, sh, sw),
            [(kt // 2, kt // 2), *pad_hw],
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
    phase_groups: int = 1  # 4 on 2x2-packed tensors: channel (p, c) blocks
    # share one true channel c; stats reduce over the phase dim too, and the
    # canonical (C,) params/stats tile across phases — so packed and unpacked
    # forms are the same statistics over the same pixels.

    @nn.compact
    def __call__(self, x):
        g = self.phase_groups
        features = x.shape[-1] // g
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
            if g > 1:  # combine the per-phase means (equal pixel counts)
                mean = jnp.mean(mean.reshape(g, features), axis=0)
                mean2 = jnp.mean(mean2.reshape(g, features), axis=0)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        if g > 1:
            inv = jnp.tile(inv, g)
            shift = jnp.tile(shift, g)
        out_dtype = self.dtype or x.dtype
        return x.astype(out_dtype) * inv.astype(out_dtype) + shift.astype(out_dtype)


def batch_norm(train: bool, *, name, param_dtype=jnp.float32, dtype=None,
               phase_groups: int = 1) -> BatchNormLean:
    """BatchNorm with torch-parity momentum/eps; float32 statistics, lean I/O."""
    return BatchNormLean(
        use_running_average=not train,
        dtype=dtype,
        param_dtype=param_dtype,
        phase_groups=phase_groups,
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
