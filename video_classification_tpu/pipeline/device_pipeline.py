"""Fused on-device preprocessing: raw video -> model-ready part-crop clips.

This is the TPU-native inversion of the reference's offline chain (SURVEY.md §7
step 8): instead of materializing every intermediate as JPEG files across six
stage folders, one jit-compiled graph takes a decoded video (uint8 frames in HBM)
plus per-frame detections and produces, for every crop stream, the (S, size, size,
21)-channel clips the model consumes — optical flow, 2x padding, body cropping,
per-part largest-component boxes, UV rasterization, cropping and cubic resizing
all fused on device with static shapes.

Correspondence with the offline stages (same semantics, zero disk):
  video_to_flow        -> ops.flow.video_flow_uint8 over the raw frames
  image_to_padded      -> ops.image.pad2x
  padded_to_iuv        -> detections input (in-graph DensePoseRCNN or injected)
  iuv_to_crop          -> body dynamic-slice + chart-resolution CC boxes scaled to
                          pixel coords + per-part crop/resize of the 21-ch canvas

Design notes:
  * dynamic crops with static shapes: crops are taken by dynamic-slicing a
    zero-padded canvas and tracking the true (h, w); the final
    ``pad_to_square_resize`` consumes traced sizes (ops/image.py).
  * connected components run at the chart head's heatmap resolution and the
    resulting boxes scale to pixel coordinates — equivalent to the reference's
    findContours on the upsampled label map (nearest upsampling preserves
    components), at a fraction of the cost; the >=15 px rule applies at pixel
    scale (chalearn_iuv_to_crop.py:148-149).
  * missing parts (no component or too small) yield constant-127 frames, the
    missing-crop convention of the training dataset (chalearn_dataset.py:115-116).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config.crop_cfg import crop_part_args, crop_resize_dict
from ..ops.components import MIN_PART_SIZE, largest_component_bbox
from ..ops.flow import DEFAULT_PARAMS, FlowParams, video_flow_uint8
from ..ops.image import pad_to_square_resize, shift2d
from ..data.dataset import MISSING_FILL


class Detections(NamedTuple):
    """Per-sampled-frame detection results (box coords in the 2x-padded frame)."""

    boxes_xyxy: jnp.ndarray  # (S, 4) float32; best box per frame
    valid: jnp.ndarray       # (S,) bool
    charts: jnp.ndarray      # (S, hm, hm) int32, 0..24
    uv: jnp.ndarray          # (S, 2, hm, hm) float32 in [0, 1]


def _pad2x_batch(x: jnp.ndarray) -> jnp.ndarray:
    t, h, w = x.shape[:3]
    pads = [(0, 0), (h // 2, h - h // 2), (w // 2, w - w // 2)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pads)


def _dynamic_crop_to_canvas(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray,
                            canvas_hw: Tuple[int, int]) -> jnp.ndarray:
    """Slice a (canvas_h, canvas_w) window starting at traced (y, x); content
    beyond the image is zero.

    One-hot matmul shift (ops/image.shift2d): under the per-frame vmap a
    dynamic_slice lowers to a ~2 GB/s generic gather — 13 of these per frame
    (body rgb/depth/5 flows + 6 part crops) were ~40% of the whole measured
    e2e preprocessing cost; the matmul form rides the MXU."""
    return shift2d(img, y, x, canvas_hw)


def _resize_chart_to_canvas(chart: jnp.ndarray, uv: jnp.ndarray,
                            bh: jnp.ndarray, bw: jnp.ndarray,
                            canvas_hw: Tuple[int, int]):
    """Upsample the (hm, hm) chart (nearest) and uv (bilinear) to the true box
    size (traced), placed at the canvas origin; outside the box -> 0.

    The sample coordinate of row y depends only on y and of column x only on
    x, so both resamplings are separable: nearest is a pair of one-hot
    selection matmuls and bilinear a pair of two-tap weight matmuls
    (out = W_y @ m @ W_x^T) — the per-pixel 2-D gathers they replace ran at
    ~2 GB/s over the (2H, 2W) canvas on v5e. One-hot rows make the nearest
    path exact; the bilinear path is the same weighted sum in a different
    summation order."""
    hm = chart.shape[0]
    ch, cw = canvas_hw
    rows = jnp.arange(ch, dtype=jnp.float32)
    cols = jnp.arange(cw, dtype=jnp.float32)
    inside = (rows[:, None] < bh) & (cols[None, :] < bw)
    fy = (rows + 0.5) * hm / jnp.maximum(bh, 1).astype(jnp.float32)  # (ch,)
    fx = (cols + 0.5) * hm / jnp.maximum(bw, 1).astype(jnp.float32)  # (cw,)
    src = jnp.arange(hm, dtype=jnp.int32)

    def one_hot(idx):
        return (src[None, :] == idx[:, None]).astype(jnp.float32)

    iy = jnp.clip(fy.astype(jnp.int32), 0, hm - 1)
    ix = jnp.clip(fx.astype(jnp.int32), 0, hm - 1)
    py, px = one_hot(iy), one_hot(ix)               # (ch, hm), (cw, hm)
    chart_full = py @ chart.astype(jnp.float32) @ px.T
    chart_full = jnp.where(inside, chart_full.astype(chart.dtype), 0)

    # Bilinear for UV: two taps per row/column accumulated into the weight
    # matrices (y1 may clamp onto y0; adding the one-hots then sums the two
    # weights to 1.0 on that row — identical to the clamped-gather formula).
    gy = jnp.clip(fy - 0.5, 0.0, hm - 1.0)
    gx = jnp.clip(fx - 0.5, 0.0, hm - 1.0)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, hm - 1)
    x1 = jnp.minimum(x0 + 1, hm - 1)
    wy = (gy - y0)[:, None]
    wx = (gx - x0)[:, None]
    wy_mat = (1.0 - wy) * one_hot(y0) + wy * one_hot(y1)  # (ch, hm)
    wx_mat = (1.0 - wx) * one_hot(x0) + wx * one_hot(x1)  # (cw, hm)
    u_full = jnp.where(inside, wy_mat @ uv[0] @ wx_mat.T, 0.0)
    v_full = jnp.where(inside, wy_mat @ uv[1] @ wx_mat.T, 0.0)
    return chart_full, u_full, v_full


def _build_body_canvas(
    rgb_pad, depth_pad, flow_pad_stack, det_box, chart, uv, canvas_hw
):
    """The 21-channel body-aligned canvas for one sampled frame.

    rgb_pad: (2H, 2W, 3); depth_pad: (2H, 2W, 1); flow_pad_stack: (5, 2H, 2W, 3);
    det_box: (4,) xyxy in padded coords. Returns (canvas, body_h, body_w)."""
    x1, y1, x2, y2 = det_box.astype(jnp.int32)
    bh = jnp.maximum(y2 - y1, 1)
    bw = jnp.maximum(x2 - x1, 1)
    body_rgb = _dynamic_crop_to_canvas(rgb_pad, y1, x1, canvas_hw)
    body_depth = _dynamic_crop_to_canvas(depth_pad, y1, x1, canvas_hw)
    flows = [
        _dynamic_crop_to_canvas(flow_pad_stack[i], y1, x1, canvas_hw)
        for i in range(flow_pad_stack.shape[0])
    ]
    chart_full, u_full, v_full = _resize_chart_to_canvas(chart, uv, bh, bw, canvas_hw)
    u8 = jnp.clip(u_full * 256.0, 0, 255).astype(jnp.uint8)[..., None]
    v8 = jnp.clip(v_full * 256.0, 0, 255).astype(jnp.uint8)[..., None]
    canvas = jnp.concatenate([body_rgb, u8, v8, *flows, body_depth], axis=-1)
    return canvas, chart_full, bh, bw


def _part_clip_from_canvas(canvas, chart_small, bh, bw, part_indices, size, hm,
                           part_canvas_hw):
    """One part's crop from the body canvas -> (size, size, 21) float32.

    CC boxes are found at chart (heatmap) resolution and scaled to pixels. The
    crop lands in a fixed ``part_canvas_hw`` window (the original frame size — a
    part crop never usefully exceeds the person's pixel extent); sizes clip to it.
    """
    mask = jnp.zeros(chart_small.shape, bool)
    for pid in part_indices:
        mask = mask | (chart_small == pid)
    bbox, valid = largest_component_bbox(mask, min_size=0)  # size rule in pixels below
    hx, hy, hw_, hh = bbox[0], bbox[1], bbox[2], bbox[3]
    # Heatmap -> pixel coordinates of the body crop.
    sx = bw.astype(jnp.float32) / hm
    sy = bh.astype(jnp.float32) / hm
    px = (hx.astype(jnp.float32) * sx).astype(jnp.int32)
    py = (hy.astype(jnp.float32) * sy).astype(jnp.int32)
    pw = jnp.maximum((hw_.astype(jnp.float32) * sx).astype(jnp.int32), 1)
    ph = jnp.maximum((hh.astype(jnp.float32) * sy).astype(jnp.int32), 1)
    valid = valid & (pw >= MIN_PART_SIZE) & (ph >= MIN_PART_SIZE)
    pw = jnp.minimum(pw, part_canvas_hw[1])
    ph = jnp.minimum(ph, part_canvas_hw[0])

    shifted = _dynamic_crop_to_canvas(canvas, py, px, part_canvas_hw)
    out = pad_to_square_resize(shifted.astype(jnp.float32), size, hw=(ph, pw))
    missing = jnp.full_like(out, float(MISSING_FILL))
    return jnp.where(valid, out, missing), valid


# CC at heatmap resolution: the mask size equals the chart head's output.
def preprocess_clip_on_device(
    frames_bgr: jnp.ndarray,      # (T_raw, H, W, 3) uint8 raw video
    frames_depth: jnp.ndarray,    # (T_raw, H, W, 1) uint8 depth video
    detections: Detections,       # per *sampled* frame (S = ceil(T_raw/interval))
    interval: int = 5,
    parts: Sequence = None,
    flow_params: FlowParams = DEFAULT_PARAMS,
    flow_images: jnp.ndarray = None,  # optional precomputed (T_raw, H, W, 3) uint8
    flow_pair_chunk: int = 4,
    sampled_start: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Returns {crop_folder: (S, size, size, 21) uint8} + {'<folder>_valid': (S,)}.

    ``sampled_start`` is the window position of the first sampled frame: 0 for
    a raw video fed from its first frame (the flow companions of sampled frame
    0 then clamp to the zero self-flow, exactly like the reference at a video
    start, chalearn_iuv_to_crop.py:30 / chalearn_video_to_flow.py:62-66);
    ``interval`` for a mid-video virtual window carrying ``interval`` leading
    context frames so every companion flow is a real frame pair
    (pipeline/online.OnlineVideoDataset._virtual_window).
    """
    parts = list(parts) if parts is not None else crop_part_args
    t_raw, h, w = frames_bgr.shape[:3]
    sampled = jnp.arange(sampled_start, t_raw, interval)
    s = sampled.shape[0]
    hm = detections.charts.shape[-1]
    canvas_hw = (2 * h, 2 * w)

    if flow_images is None:
        # Chunked: bounds solver memory (full-res all-pairs flow has crashed
        # the remote TPU worker at batch >= 8 — see ops/flow.video_flow_uint8).
        flow_images = video_flow_uint8(frames_bgr, flow_params,
                                       pair_chunk=flow_pair_chunk)
    flow_pad = _pad2x_batch(flow_images)
    rgb_pad = _pad2x_batch(frames_bgr)
    depth_pad = _pad2x_batch(frames_depth)

    # Flow companion indices per sampled frame: n-interval+1 .. n, clamped >= 0
    # (chalearn_iuv_to_crop.py:25-31).
    offsets = jnp.arange(-interval + 1, 1)
    flow_idx = jnp.maximum(sampled[:, None] + offsets[None, :], 0)  # (S, 5)

    def per_frame(si):
        canvas, chart_full, bh, bw = _build_body_canvas(
            rgb_pad[sampled[si]],
            depth_pad[sampled[si]],
            flow_pad[flow_idx[si]],
            detections.boxes_xyxy[si],
            detections.charts[si],
            detections.uv[si],
            canvas_hw,
        )
        outs = {}
        for part_indices, folder in parts:
            size = crop_resize_dict[folder]
            clip, valid = _part_clip_from_canvas(
                canvas, detections.charts[si], bh, bw, part_indices, size, hm,
                part_canvas_hw=(h, w),
            )
            det_ok = detections.valid[si]
            clip = jnp.where(det_ok, clip, jnp.full_like(clip, float(MISSING_FILL)))
            outs[folder] = jnp.clip(jnp.round(clip), 0, 255).astype(jnp.uint8)
            outs[folder + "_valid"] = valid & det_ok
        return outs

    # Chunked map: lax.map over chunks of vmapped frames — sequential chunks
    # bound peak HBM to `frame_chunk` canvases while each chunk still fills
    # the chip (a pure per-frame lax.map left the VPU latency-bound on small
    # ops; pure vmap would hold every frame's ~100 MB canvas set at once).
    frame_chunk = min(4, s)
    n_chunks = -(-s // frame_chunk)
    pad = n_chunks * frame_chunk - s
    frame_ids = jnp.arange(s)
    if pad:
        frame_ids = jnp.concatenate([frame_ids, jnp.zeros((pad,), jnp.int32)])
    frame_ids = frame_ids.reshape(n_chunks, frame_chunk)
    stacked = jax.lax.map(jax.vmap(per_frame), frame_ids)
    stacked = jax.tree.map(
        lambda a: a.reshape((n_chunks * frame_chunk,) + a.shape[2:])[:s], stacked)
    return stacked
