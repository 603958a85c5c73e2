"""Pallas TPU kernel for greedy NMS.

The XLA fixed-trip NMS (detect/ops.nms) materializes the (N, N) IoU matrix in
HBM and round-trips the live-score vector every iteration: ~8 us per greedy
step on v5e, ~8 ms for the detector's RPN stage (1000 iterations over 5000
candidates), and the matrix itself is O(N^2) memory (100 MB at N=5000).

This kernel keeps the whole solve VMEM-resident and computes each chosen box's
IoU row on the fly (O(N) per step instead of O(N^2) once): boxes arrive as
four (1, N) coordinate rows + scores, the greedy loop runs as an in-kernel
fori_loop, and per-iteration work is a handful of VPU ops over N lanes.
Outputs match detect/ops.nms exactly (same tie-breaking argmax semantics) —
golden-tested against it in interpret mode and used on TPU automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python float: jnp constants would be captured tracers


def _nms_kernel(max_out: int, thr: float,
                x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                idx_out, mask_out):
    x1 = x1_ref[0]
    y1 = y1_ref[0]
    x2 = x2_ref[0]
    y2 = y2_ref[0]
    n = x1.shape[0]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, max_out), 1)

    def body(i, carry):
        live, idx_vec, mask_vec = carry
        best = jnp.argmax(live)
        best_score = jnp.max(live)
        valid = best_score > _NEG / 2
        # Mosaic has no dynamic_slice on vector values: pick the chosen box's
        # coordinates with masked reductions instead (O(N) VPU, trivial).
        sel = (lane == best)
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0))
        by1 = jnp.sum(jnp.where(sel, y1, 0.0))
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0))
        by2 = jnp.sum(jnp.where(sel, y2, 0.0))
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(area + barea - inter, 1e-9)
        suppress = (iou > thr) | sel
        # Mosaic has no scalar stores to VMEM either: accumulate the outputs
        # as (1, max_out) vectors in the loop carry, store once at the end.
        slot = (out_lane == i)
        idx_vec = jnp.where(slot, jnp.where(valid, best, 0).astype(jnp.int32),
                            idx_vec)
        mask_vec = jnp.where(slot, valid.astype(jnp.int32), mask_vec)
        live = jnp.where(valid & suppress, jnp.float32(_NEG), live)
        return live, idx_vec, mask_vec

    init = (scores_ref[0].astype(jnp.float32),
            jnp.zeros((1, max_out), jnp.int32),
            jnp.zeros((1, max_out), jnp.int32))
    _, idx_vec, mask_vec = jax.lax.fori_loop(0, max_out, body, init)
    idx_out[:] = idx_vec
    mask_out[:] = mask_vec


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def nms_pallas(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
               max_out: int, iou_threshold: float = 0.5,
               interpret: bool = False):
    """Greedy NMS, VMEM-resident. Same contract as detect/ops.nms."""
    n = boxes_xyxy.shape[0]
    b = boxes_xyxy.astype(jnp.float32)
    rows = [b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3],
            scores.astype(jnp.float32)[None, :]]
    kernel = functools.partial(_nms_kernel, max_out, float(iou_threshold))
    idx, mask = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((1, max_out), jnp.int32)] * 2,
        # memory_space=VMEM is load-bearing: the default (compiler-chosen)
        # space lands in HBM and every suppression round round-trips it.
        in_specs=[pl.BlockSpec((1, n), lambda: (0, 0),
                               memory_space=pltpu.VMEM) for _ in range(5)],
        out_specs=[pl.BlockSpec((1, max_out), lambda: (0, 0),
                                memory_space=pltpu.VMEM) for _ in range(2)],
        interpret=interpret,
    )(*rows)
    return idx[0], mask[0].astype(bool)
