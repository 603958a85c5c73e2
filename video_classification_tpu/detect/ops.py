"""Detection primitives: ROIAlign and NMS as jit-compatible device ops.

These are the operations detectron2 implements as custom CUDA kernels (SURVEY.md
§2.3: ROIAlign, NMS under the DensePose dependency); here they are expressed as
pure XLA programs — gathers + elementwise for ROIAlign, a fixed-trip greedy loop
for NMS — so the whole detector stays inside one compiled graph.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _corner_blend(flat: jnp.ndarray, idx: jnp.ndarray, row_stride,
                  wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear blend of the 2x2 corners at flat row index ``idx``.

    flat: (R, C) row-major feature rows; idx: (...,) int32 index of the
    top-left corner; row_stride: scalar or (...,)-shaped row pitch (W for a
    single map, the level width for a flattened pyramid); wy/wx: (...,)
    fractional weights. Four direct row gathers instead of building a
    corner-packed 4C copy of the map: the pack materializes 4x the *entire*
    map per call to serve N*s*s sampled rows — for ROI pooling N*s*s is far
    below H*W (64 boxes x 14x14 = 12.5K rows vs 25.5K pyramid pixels), so the
    packed build dominated detector traffic (profiled: 0.27 ms/frame concat +
    0.24 ms dtype converts at 480x640). In-bounds by construction: idx's
    y0/x0 are clamped to h-2/w-2 by the callers, so +1/+stride never leaves
    the map (the convention _warp_bilinear documents). The blend runs in the
    feature dtype (bf16 on TPU) — upcasting to f32 doubled the gather fusion's
    bytes.
    """
    shape = idx.shape
    fi = idx.reshape(-1)
    st = (row_stride if isinstance(row_stride, int)
          else jnp.broadcast_to(row_stride, shape).reshape(-1))

    def take2(start):
        # Rows start and start+1 are the (y, x0) and (y, x0+1) corners —
        # adjacent in row-major order (x0 <= w-2 guarantees no row wrap) —
        # so one slice_sizes=(2, C) gather fetches the pair: half the
        # gathered rows of four single-row takes at the same byte count.
        g = jax.lax.gather(
            flat, start[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2, flat.shape[-1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return g[:, 0], g[:, 1]

    v00, v01 = take2(fi)
    v10, v11 = take2(fi + st)
    wy = wy.reshape(-1, 1).astype(flat.dtype)
    wx = wx.reshape(-1, 1).astype(flat.dtype)
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out.reshape(shape + (flat.shape[-1],))


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at float coords (ys, xs) of any shape -> (..., C).

    Out-of-range coordinates clamp to the border (ROIAlign convention for
    sampling points outside the feature map). TPU formulation: four direct
    contiguous row gathers + blend (_corner_blend) — XLA lowers per-point
    fancy indexing to a slow generic gather (same fix as
    ops/flow._warp_bilinear; ~4x on v5e).
    """
    h, w, c = feat.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    # Base corner clamped to h-2/w-2: at the border the fractional weight is 1
    # and selects the last row/col — identical to min(y0+1, h-1).
    y0 = jnp.minimum(jnp.floor(ys).astype(jnp.int32), max(h - 2, 0))
    x0 = jnp.minimum(jnp.floor(xs).astype(jnp.int32), max(w - 2, 0))
    wy = ys - y0
    wx = xs - x0
    shape = jnp.broadcast_shapes(y0.shape, x0.shape)
    idx = jnp.broadcast_to(y0 * w + x0, shape)
    wy = jnp.broadcast_to(wy, shape)
    wx = jnp.broadcast_to(wx, shape)
    return _corner_blend(feat.reshape(h * w, c), idx, w, wy, wx)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def roi_align(
    feat: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign (Mask R-CNN, aligned=True convention).

    feat: (H, W, C) one level's feature map; boxes: (N, 4) xyxy in image coords.
    Output (N, output_size, output_size, C): each bin averages
    sampling_ratio^2 bilinear samples. The aligned=True half-pixel shift
    (continuous coordinate c maps to pixel index c*scale - 0.5) matches
    detectron2's ROIAlign(aligned=True), which DensePose uses.
    """

    def one_box(box):
        x1, y1, x2, y2 = box * spatial_scale
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        bin_w = bw / output_size
        bin_h = bh / output_size
        n = sampling_ratio
        # Sample point grid: for output bin (i,j), samples at
        # y1 + (i + (k+0.5)/n) * bin_h, k in [0, n).
        grid = (jnp.arange(output_size)[:, None] + (jnp.arange(n)[None, :] + 0.5) / n)
        ys = (y1 + grid.reshape(-1) * bin_h) - 0.5  # aligned=True shift
        xs = (x1 + grid.reshape(-1) * bin_w) - 0.5
        samples = _bilinear_sample(feat, ys[:, None], xs[None, :])
        # (out*n, out*n, C) -> average n x n sample blocks.
        c = samples.shape[-1]
        samples = samples.reshape(output_size, n, output_size, n, c)
        return samples.mean(axis=(1, 3))

    return jax.vmap(one_box)(boxes_xyxy.astype(jnp.float32))


def multilevel_roi_align(
    feats,
    boxes_xyxy: jnp.ndarray,
    output_size: int,
    strides=(4, 8, 16, 32),
    sampling_ratio: int = 2,
    canonical_level: int = 2,
) -> jnp.ndarray:
    """FPN ROIAlign with per-box level assignment over a flattened pyramid.

    feats: list of (1, H_l, W_l, C) maps (P2..P5). Each box samples ONLY its
    assigned level (Lin et al.: k = k0 + log2(sqrt(wh)/224)); the naive
    alternative — pooling every level then selecting — gathers 4x the bytes,
    which profiling showed dominated detector latency. Levels are flattened
    into one (sum H*W, C) buffer so the per-box level becomes pure index
    arithmetic feeding four contiguous corner gathers (_corner_blend — no
    corner-packed 4C copy of the pyramid is materialized).

    Bit-identical to roi_align(level) + take_along_axis selection (tested).
    """
    import numpy as np

    c = feats[0].shape[-1]
    n_levels = len(feats)
    flat = jnp.concatenate([f[0].reshape(-1, c) for f in feats], axis=0)
    hs_np = [f.shape[1] for f in feats]
    ws_np = [f.shape[2] for f in feats]
    offs_np = np.cumsum([0] + [h * w for h, w in zip(hs_np, ws_np)])[:-1]
    hs = jnp.asarray(hs_np, jnp.int32)
    ws = jnp.asarray(ws_np, jnp.int32)
    offs = jnp.asarray(offs_np, jnp.int32)
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    boxes = boxes_xyxy.astype(jnp.float32)
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    # detectron2 assign_boxes_to_levels (modeling/poolers.py): index =
    # clamp(floor(k0 + log2(sqrt(wh)/224 + eps)), min_level, max_level)
    # - min_level, with k0=4, min_level=2 for P2..P5 — i.e. floor(
    # canonical_level + log2(...)) with canonical_level = k0 - min_level = 2.
    # (A canonical 224px box pools from P4 = index 2; 112px from P3.)
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(bw * bh) / 224.0 + 1e-8))
    level = jnp.clip(k, 0, n_levels - 1).astype(jnp.int32)  # (N,)

    scale = inv_strides[level]                       # (N,)
    lh = hs[level]
    lw = ws[level]
    loff = offs[level]

    nboxes = boxes.shape[0]
    s = output_size * sampling_ratio
    grid = (jnp.arange(output_size)[:, None]
            + (jnp.arange(sampling_ratio)[None, :] + 0.5) / sampling_ratio
            ).reshape(-1)                            # (s,)
    x1 = boxes[:, 0] * scale
    y1 = boxes[:, 1] * scale
    bin_w = jnp.maximum((boxes[:, 2] - boxes[:, 0]) * scale, 1e-6) / output_size
    bin_h = jnp.maximum((boxes[:, 3] - boxes[:, 1]) * scale, 1e-6) / output_size
    ys = y1[:, None] + grid[None, :] * bin_h[:, None] - 0.5   # (N, s)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None] - 0.5
    ys = jnp.clip(ys, 0.0, (lh - 1).astype(jnp.float32)[:, None])
    xs = jnp.clip(xs, 0.0, (lw - 1).astype(jnp.float32)[:, None])
    y0 = jnp.minimum(jnp.floor(ys).astype(jnp.int32),
                     jnp.maximum(lh - 2, 0)[:, None])
    x0 = jnp.minimum(jnp.floor(xs).astype(jnp.int32),
                     jnp.maximum(lw - 2, 0)[:, None])
    wy = ys - y0                                      # (N, s)
    wx = xs - x0

    idx = (loff[:, None, None] + y0[:, :, None] * lw[:, None, None]
           + x0[:, None, :])                          # (N, s, s)
    samples = _corner_blend(
        flat, idx, lw[:, None, None],
        jnp.broadcast_to(wy[:, :, None], idx.shape),
        jnp.broadcast_to(wx[:, None, :], idx.shape),
    )                                                 # (N, s, s, C)
    samples = samples.reshape(nboxes, output_size, sampling_ratio,
                              output_size, sampling_ratio, c)
    return samples.mean(axis=(2, 4))


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def nms(
    boxes_xyxy: jnp.ndarray, scores: jnp.ndarray, max_out: int,
    iou_threshold: float = 0.5, backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a static output count.

    Returns (keep_indices (max_out,) int32, keep_mask (max_out,) bool). Suppressed
    slots repeat index 0 with mask False. Fixed-trip fori_loop — no data-dependent
    shapes, so it compiles once and fuses into the detector graph.

    On TPU ('auto') the VMEM-resident Pallas kernel (detect/pallas_nms.py) runs
    instead: on-the-fly IoU rows drop the O(N^2) matrix and the per-iteration
    HBM round-trips. 'xla' | 'pallas' | 'pallas_interpret' force a choice.
    """
    if backend in ("pallas", "pallas_interpret") or (
            backend == "auto" and jax.default_backend() == "tpu"):
        from .pallas_nms import nms_pallas

        return nms_pallas(boxes_xyxy, scores, max_out, iou_threshold,
                          interpret=(backend == "pallas_interpret"))
    n = boxes_xyxy.shape[0]
    iou = box_iou(boxes_xyxy, boxes_xyxy)
    neg_inf = jnp.finfo(jnp.float32).min

    def body(i, state):
        live_scores, keep_idx, keep_mask = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > neg_inf / 2
        keep_idx = keep_idx.at[i].set(jnp.where(valid, best, 0))
        keep_mask = keep_mask.at[i].set(valid)
        # Suppress the chosen box and all high-IoU boxes.
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best
        )
        live_scores = jnp.where(valid & suppress, neg_inf, live_scores)
        return live_scores, keep_idx, keep_mask

    init = (
        scores.astype(jnp.float32),
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, keep_idx, keep_mask = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_mask


def clip_boxes(boxes: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    x1 = jnp.clip(boxes[:, 0], 0, w)
    y1 = jnp.clip(boxes[:, 1], 0, h)
    x2 = jnp.clip(boxes[:, 2], 0, w)
    y2 = jnp.clip(boxes[:, 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def apply_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 clip: float = 4.135,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """R-CNN box decoding: (dx, dy, dw, dh) deltas on xyxy anchors.

    ``weights`` are detectron2 Box2BoxTransform normalizers — (1,1,1,1) for the
    RPN, (10,10,5,5) for the ROI box head; ``clip`` is its scale_clamp
    log(1000/16).
    """
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    wx, wy, ww, wh = weights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(jnp.clip(dw, -clip, clip))
    h = ah * jnp.exp(jnp.clip(dh, -clip, clip))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
