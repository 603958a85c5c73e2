"""Batched device-side image ops.

The reference does all of this per-frame on host CPU with OpenCV
(`dataset/chalearn_dataset.py:60-87`, `chalearn_image_to_padded.py:16-22`). Here each
op is a jit-compatible XLA program over batched tensors, so the whole preprocessing
chain runs fused on device. Layout is channels-last (NHWC / NTHWC) throughout — the
TPU-native layout.

Ops:
  * ``cubic_resize``             — separable bicubic resize, OpenCV INTER_CUBIC kernel
                                   (Keys, A=-0.75), replicate-clamped borders, traced
                                   (dynamic) source sizes supported.
  * ``pad_to_square_resize``     — reference `_pad_resize_img` semantics: center the
                                   content in a max(h,w) square, cubic-resize to a
                                   fixed square size (chalearn_dataset.py:60-71).
  * ``pad2x``                    — center frame in a 2H x 2W zero canvas
                                   (chalearn_image_to_padded.py:16-22).
  * ``normalize``                — fused (x/255 - 0.45)/0.225 uint8->float
                                   (chalearn_dataset.py:41-46).
  * ``random_crop``              — torchvision RandomCrop(size, padding) equivalent
                                   train augment (chalearn_dataset.py:73-87).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

# OpenCV's bicubic coefficient (interpolation.cpp `interpolateCubic`, A = -0.75).
_CUBIC_A = -0.75


def _cubic_kernel(x: jnp.ndarray, a: float = _CUBIC_A) -> jnp.ndarray:
    """Keys cubic convolution kernel on |x| <= 2."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def _resample_axis(img: jnp.ndarray, axis: int, out_size: int, in_size) -> jnp.ndarray:
    """Cubic-resample one axis. ``in_size`` may be a traced scalar (dynamic crop

    sizes); the array extent along ``axis`` is the static canvas size, samples past
    ``in_size`` are never touched because coordinates clamp to [0, in_size-1].

    TPU formulation: the 4-tap weighted gather is a (out, canvas) resampling
    *matrix* applied to the image — a row gather ran at ~2 GB/s on v5e inside
    the vmapped preprocessing graph, while the equivalent dense matmul rides
    the MXU. Duplicate clamped taps accumulate into one matrix entry, so
    W @ x == sum_t w_t * x[idx_t] exactly (modulo float summation order).
    """
    canvas = img.shape[axis]
    in_size = jnp.asarray(in_size, jnp.float32)
    scale = in_size / out_size
    # OpenCV coordinate mapping: src = (dst + 0.5) * scale - 0.5.
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    base = jnp.floor(src)
    frac = src - base
    # 4 taps at offsets -1..2 around floor(src); replicate-clamp into the valid range.
    tap_offsets = jnp.arange(-1, 3, dtype=jnp.float32)
    tap_coords = base[:, None] + tap_offsets[None, :]          # (out, 4)
    tap_idx = jnp.clip(tap_coords, 0, in_size - 1.0).astype(jnp.int32)
    weights = _cubic_kernel(frac[:, None] - tap_offsets[None, :])  # (out, 4)
    tap_idx = jnp.clip(tap_idx, 0, canvas - 1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, 4, canvas), 2)
    w = jnp.sum(jnp.where(cols == tap_idx[:, :, None],
                          weights[:, :, None], 0.0), axis=1)   # (out, canvas)
    moved = jnp.moveaxis(img, axis, 0).astype(jnp.float32)      # (canvas, ...)
    out = jnp.tensordot(w, moved.reshape(canvas, -1),
                        axes=((1,), (0,))).reshape((out_size,) + moved.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def cubic_resize(
    img: jnp.ndarray,
    out_hw: Sequence[int],
    in_hw=None,
) -> jnp.ndarray:
    """Bicubic resize of (..., H, W, C) to (..., out_h, out_w, C), float32 output.

    ``in_hw``: true (h, w) of the content if smaller than the array extent
    (traced scalars allowed); defaults to the array's own H, W.
    """
    h_axis = img.ndim - 3
    w_axis = img.ndim - 2
    in_h = img.shape[h_axis] if in_hw is None else in_hw[0]
    in_w = img.shape[w_axis] if in_hw is None else in_hw[1]
    out = _resample_axis(img, h_axis, int(out_hw[0]), in_h)
    out = _resample_axis(out, w_axis, int(out_hw[1]), in_w)
    return out


def shift2d(img: jnp.ndarray, dy, dx, out_hw: Sequence[int]) -> jnp.ndarray:
    """out[y, x] = img[y + dy, x + dx], zero outside the image; traced dy/dx.

    A per-sample 2-D shift/crop expressed as two one-hot selection matmuls
    (out = S_y @ img @ S_x^T). The alternatives lower badly on TPU: a vmapped
    ``dynamic_slice`` serializes or becomes a generic gather, and 2-D
    fancy-index gathers run at ~2 GB/s (profiled in the preprocessing graph,
    where 13 such crops per frame were 40% of the whole e2e chain). One-hot
    matmuls are exact — each output element is a single 1.0 * v product — and
    batched under vmap they ride the MXU. uint8 inputs use bf16 operands
    (integers 0..255 are exact in bf16) with f32 accumulation for 2x MXU rate.
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    h, w, _ = img.shape
    dy = jnp.asarray(dy, jnp.int32)
    dx = jnp.asarray(dx, jnp.int32)
    op_dtype = jnp.bfloat16 if img.dtype == jnp.uint8 else jnp.float32

    def sel(n_out, n_in, start):
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
        return (cols == rows + start).astype(op_dtype)

    sy = sel(oh, h, dy)                     # (oh, H)
    sx = sel(ow, w, dx)                     # (ow, W)
    out = jnp.einsum("oh,hwc->owc", sy, img.astype(op_dtype),
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,owc->opc", sx, out,
                     preferred_element_type=jnp.float32)
    if img.dtype == jnp.uint8:
        out = jnp.round(out)
    return out.astype(img.dtype)


def pad_to_square_resize(img: jnp.ndarray, size: int, hw=None) -> jnp.ndarray:
    """Center content in a max(h, w) square, bicubic-resize to (size, size).

    Matches `ChalearnVideoDataset._pad_resize_img` (chalearn_dataset.py:60-71):
    nx=(m-w)//2, ny=(m-h)//2 centering with zero fill, INTER_CUBIC resize.

    ``img``: (H, W, C) canvas whose valid content is the top-left ``hw`` region
    (hw may be traced scalars; defaults to full extent). Output float32.
    """
    H, W, C = img.shape
    h = jnp.asarray(H if hw is None else hw[0], jnp.int32)
    w = jnp.asarray(W if hw is None else hw[1], jnp.int32)
    m = jnp.maximum(h, w)
    canvas_m = max(H, W)
    nx = (m - w) // 2
    ny = (m - h) // 2
    # Build the square canvas with content centered; static canvas extent.
    canvas = jnp.zeros((canvas_m, canvas_m, C), img.dtype)
    canvas = jax.lax.dynamic_update_slice(
        canvas, img[: min(H, canvas_m), : min(W, canvas_m)], (0, 0, 0)
    )
    # Mask out anything beyond the true (h, w) content before shifting.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (canvas_m, canvas_m, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (canvas_m, canvas_m, 1), 1)
    valid = (row_ids < h) & (col_ids < w)
    canvas = jnp.where(valid, canvas, 0)
    # Shift content to the centered position: output[y, x] = canvas[y-ny, x-nx]
    # — a one-hot matmul shift (shift2d); the 2-D fancy-index gather this
    # replaces ran at ~2 GB/s under vmap on v5e.
    square = shift2d(canvas, -ny, -nx, (canvas_m, canvas_m))
    return cubic_resize(square, (size, size), in_hw=(m, m))


def pad2x(img: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad (..., H, W, C) to (..., 2H, 2W, C) with content centered.

    Matches `pad_an_img` (chalearn_image_to_padded.py:16-22): content placed at
    rows [h//2, h//2+h), cols [w//2, w//2+w).
    """
    *lead, h, w, c = img.shape
    pads = [(0, 0)] * len(lead) + [(h // 2, h - h // 2), (w // 2, w - w // 2), (0, 0)]
    return jnp.pad(img, pads)


# Normalization constants (chalearn_dataset.py:41-46): mean 0.45, std 0.225 on x/255.
NORM_MEAN = 0.45
NORM_STD = 0.225


def normalize(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Fused uint8 -> normalized float: ((x/255) - 0.45) / 0.225."""
    x = x.astype(jnp.float32)
    out = (x * (1.0 / 255.0) - NORM_MEAN) * (1.0 / NORM_STD)
    return out.astype(dtype)


def denormalize_to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    v = (x.astype(jnp.float32) * NORM_STD + NORM_MEAN) * 255.0
    return jnp.clip(jnp.round(v), 0, 255).astype(jnp.uint8)


def random_crop(
    key: jax.Array, clip: jnp.ndarray, size: int, padding: int
) -> jnp.ndarray:
    """torchvision-style RandomCrop over a (T, H, W, C) clip.

    Zero-pads ``padding`` on every spatial side, then takes one random
    (size, size) window shared across all frames and channels — the reference
    applies one RandomCrop to the whole TCHW stack (chalearn_dataset.py:73-87).
    """
    t, h, w, c = clip.shape
    padded = jnp.pad(clip, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    max_y = h + 2 * padding - size
    max_x = w + 2 * padding - size
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (), 0, max_y + 1)
    ox = jax.random.randint(kx, (), 0, max_x + 1)
    return jax.lax.dynamic_slice(padded, (0, oy, ox, 0), (t, size, size, c))


def random_crop_batch(
    key: jax.Array, clips: jnp.ndarray, size: int, padding: int
) -> jnp.ndarray:
    """Per-sample random crops over (N, T, H, W, C)."""
    keys = jax.random.split(key, clips.shape[0])
    return jax.vmap(functools.partial(random_crop, size=size, padding=padding))(
        keys, clips
    )


def random_crop_batch_mxu(
    key: jax.Array, clips: jnp.ndarray, size: int, padding: int,
    space_to_depth: bool = False,
) -> jnp.ndarray:
    """``random_crop_batch`` re-expressed as two one-hot shift matmuls.

    A vmapped per-sample ``dynamic_slice`` lowers to a sequential while loop
    on TPU (one dynamic-update-slice per batch element — profiled at ~86 ms of
    a 536 ms flagship train step). A padding-then-crop with zero fill is just a
    per-sample spatial shift, and a shift is a matmul by a one-hot
    row/column-selection matrix: out = S_y @ x @ S_x^T with S[i, j] = 1 iff
    j == i + offset - padding (rows shifted in from the pad region are all-zero
    — exactly the reference's zero fill, which lives in *normalized* space,
    chalearn_dataset.py:41-46,73-87, so call this on the normalized tensor).
    One-hot matmuls are exact in any float dtype (each output is a single
    1.0 * v product), so this is bit-equal to random_crop_batch while running
    on the MXU, batched, with no 32-step serial loop and no padded copy.

    Offset derivation matches random_crop_batch key-for-key.

    ``space_to_depth=True`` (even ``size`` only) makes the second matmul write
    its output directly in the 2x2 space-to-depth layout the SlowFast stems
    consume — (N, T, size/2, size/2, 4C) with channel order (py, px, c),
    matching models/layers.SpaceToDepthConv — so the stems' s2d repacking
    costs nothing (the profiled reshape+transpose pair was ~20 ms/step at
    batch 32). Same values, different layout: out[..., Y, X, (py, px, c)] ==
    crop[..., 2Y+py, 2X+px, c].
    """
    n, t, h, w, c = clips.shape
    keys = jax.random.split(key, n)
    ky = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    kx = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
    max_y = h + 2 * padding - size
    max_x = w + 2 * padding - size
    oy = jax.vmap(lambda k: jax.random.randint(k, (), 0, max_y + 1))(ky)
    ox = jax.vmap(lambda k: jax.random.randint(k, (), 0, max_x + 1))(kx)

    span = jnp.arange(size)
    iy = oy[:, None] + span[None, :] - padding  # (N, size): source row or OOB
    ix = ox[:, None] + span[None, :] - padding
    # one_hot of an out-of-range index is an all-zero row => zero fill.
    sy = jax.nn.one_hot(jnp.where((iy >= 0) & (iy < h), iy, -1), h,
                        dtype=clips.dtype)  # (N, size, H)
    sx = jax.nn.one_hot(jnp.where((ix >= 0) & (ix < w), ix, -1), w,
                        dtype=clips.dtype)  # (N, size, W)
    if not space_to_depth:
        out = jnp.einsum("nyh,nthwc->ntywc", sy, clips)
        return jnp.einsum("nxw,ntywc->ntyxc", sx, out)
    assert size % 2 == 0, "space_to_depth needs an even crop size"
    syp = sy.reshape(n, size // 2, 2, h)  # row 2Y+py
    sxp = sx.reshape(n, size // 2, 2, w)
    out = jnp.einsum("nyph,nthwc->ntypwc", syp, clips)
    out = jnp.einsum("nxqw,ntypwc->ntyxpqc", sxp, out)
    return out.reshape(n, t, size // 2, size // 2, 4 * c)
