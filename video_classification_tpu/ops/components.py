"""Connected-components labeling and largest-component bounding box.

Replaces the reference's per-frame ``cv2.findContours`` -> per-contour
``boundingRect`` -> largest-area -> reject < 15 px chain
(`/root/reference/chalearn_iuv_to_crop.py:114-149`) with a batched, jit-compatible
device kernel:

  1. label propagation: initialize every foreground pixel with its linear index,
     then iteratively min-pool labels over the 4-neighborhood (masked to the
     foreground) until fixpoint — each component converges to its minimum index;
     iteration count is driven by ``lax.while_loop`` on a change flag, bounded by
     H+W (the maximum geodesic diameter);
  2. per-component *bounding-box area* via two segment reductions (min/max row/col
     per label), matching cv2's boundingRect area (w*h of the component's bbox, the
     quantity the reference maximizes — chalearn_iuv_to_crop.py:139-147);
  3. argmax over components, reject if bbox w < 15 or h < 15
     (chalearn_iuv_to_crop.py:148-149).

Semantic note: cv2.findContours with RETR_TREE also emits inner contours, but outer
contours dominate any inner one in bbox area, so "largest contour bbox" ==
"largest connected-component bbox" (8-connectivity). cv2 contours use
8-connectivity; we propagate over the 8-neighborhood to match.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

MIN_PART_SIZE = 15  # chalearn_iuv_to_crop.py:148


def _min_pool_labels(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """One 8-neighborhood min propagation step; background stays at INF."""
    inf = jnp.iinfo(jnp.int32).max
    p = jnp.pad(labels, ((1, 1), (1, 1)), constant_values=inf)
    neigh = jnp.stack(
        [
            p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:],
            p[:-2, :-2], p[:-2, 2:], p[2:, :-2], p[2:, 2:],
        ]
    ).min(0)
    out = jnp.minimum(labels, neigh)
    return jnp.where(fg, out, inf)


def _use_pallas_cc(backend: str, h: int, w: int) -> bool:
    from .pallas_components import fits_vmem

    if backend in ("pallas", "pallas_interpret"):
        return True
    if backend == "xla":
        return False
    return jax.default_backend() == "tpu" and fits_vmem(h, w)


def label_components(mask: jnp.ndarray, max_iters: int | None = None,
                     backend: str = "auto") -> jnp.ndarray:
    """Connected-component labels (8-connectivity) for a bool (H, W) mask.

    Foreground pixels get the minimum linear index of their component; background
    pixels get INT32_MAX.

    Backend selection mirrors ops/flow: 'auto' uses the Pallas VMEM-resident
    propagation kernel on TPU when the mask fits the VMEM budget (the XLA path
    round-trips the label map through HBM every iteration), the XLA
    while-loop otherwise; 'xla' | 'pallas' | 'pallas_interpret' force a choice.
    """
    h, w = mask.shape
    if _use_pallas_cc(backend, h, w):
        from .pallas_components import label_components_pallas

        return label_components_pallas(
            mask[None], n_iters=max_iters,
            interpret=(backend == "pallas_interpret"),
        )[0]
    inf = jnp.iinfo(jnp.int32).max
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels = jnp.where(mask, lin, inf)
    if max_iters is None:
        max_iters = h + w  # worst-case geodesic diameter bound

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = _min_pool_labels(labels, mask)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return labels


def _component_extents_xla(mask: jnp.ndarray, max_iters: int | None = None):
    """Per-pixel component bbox extents by masked min/max propagation.

    Every foreground neighbor is by definition in the same 8-connected
    component, so min/max-pooling each pixel's (row, col) over the masked
    neighborhood converges every pixel to its component's extents within the
    geodesic diameter — the same fixpoint argument as label propagation, but
    it removes the per-component segment reduction entirely (XLA lowers a TPU
    scatter-min/max to a sequential per-update while loop: ~0.39 ms per
    (frame, part) mask, ~47 ms of a 0.94 s e2e preprocessing clip)."""
    h, w = mask.shape
    inf = jnp.iinfo(jnp.int32).max
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    state0 = (
        jnp.where(mask, rows, inf), jnp.where(mask, rows, -1),
        jnp.where(mask, cols, inf), jnp.where(mask, cols, -1),
    )
    if max_iters is None:
        max_iters = h + w

    def pool(x, op, fill):
        p = jnp.pad(x, ((1, 1), (1, 1)), constant_values=fill)
        n = op(op(op(op(x, p[:-2, 1:-1]), p[2:, 1:-1]), p[1:-1, :-2]),
               p[1:-1, 2:])
        n = op(op(op(op(n, p[:-2, :-2]), p[:-2, 2:]), p[2:, :-2]), p[2:, 2:])
        return n

    def step(state):
        mnr, mxr, mnc, mxc = state
        return (
            jnp.where(mask, pool(mnr, jnp.minimum, inf), inf),
            jnp.where(mask, pool(mxr, jnp.maximum, -1), -1),
            jnp.where(mask, pool(mnc, jnp.minimum, inf), inf),
            jnp.where(mask, pool(mxc, jnp.maximum, -1), -1),
        )

    def cond(carry):
        state, changed, it = carry
        return jnp.logical_and(changed, it < max_iters)

    def body(carry):
        state, _, it = carry
        new = step(state)
        changed = functools.reduce(
            jnp.logical_or,
            [jnp.any(n != s) for n, s in zip(new, state)])
        return new, changed, it + 1

    (state, _, _) = jax.lax.while_loop(cond, body,
                                       (state0, jnp.bool_(True), 0))
    return state


def _use_pallas_extents(backend: str, h: int, w: int) -> bool:
    from .pallas_components import fits_vmem_extents

    if backend in ("pallas", "pallas_interpret"):
        return True
    if backend == "xla":
        return False
    return jax.default_backend() == "tpu" and fits_vmem_extents(h, w)


def largest_component_bbox(
    mask: jnp.ndarray, min_size: int = MIN_PART_SIZE, backend: str = "auto"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(bbox xywh int32, valid bool) of the largest-bbox-area component.

    Reproduces the reference selection rule exactly: per component take
    cv2.boundingRect's (w*h), pick the max, discard if w<min_size or h<min_size
    or no foreground (chalearn_iuv_to_crop.py:121-149). Pass ``min_size=0`` when
    the caller applies the size rule at a different scale (device_pipeline runs
    CC at heatmap resolution and checks size in pixels).

    Implementation: per-pixel component-extent propagation (no per-component
    segment scatter; see _component_extents_xla). The max over pixels of the
    per-pixel bbox area equals the max over components, and jnp.argmax's
    first-maximum tie-break picks the component with the smallest first
    (row-major) pixel — identical to the previous smallest-min-label bucket
    argmax. Backend selection mirrors label_components ('auto' = Pallas
    VMEM-resident propagation on TPU when the mask fits, XLA while-loop
    otherwise).
    """
    h, w = mask.shape
    if _use_pallas_extents(backend, h, w):
        from .pallas_components import component_extents_pallas

        mnr, mxr, mnc, mxc = (
            a[0] for a in component_extents_pallas(
                mask[None], None, interpret=(backend == "pallas_interpret")))
    else:
        mnr, mxr, mnc, mxc = _component_extents_xla(mask)
    widths = jnp.where(mxc >= 0, mxc - mnc + 1, 0).reshape(-1)
    heights = jnp.where(mxr >= 0, mxr - mnr + 1, 0).reshape(-1)
    areas = widths * heights
    best = jnp.argmax(areas)
    bw, bh = widths[best], heights[best]
    bbox = jnp.stack([mnc.reshape(-1)[best], mnr.reshape(-1)[best], bw, bh]
                     ).astype(jnp.int32)
    valid = (areas[best] > 0) & (bw >= min_size) & (bh >= min_size)
    bbox = jnp.where(valid, bbox, jnp.zeros(4, jnp.int32))
    return bbox, valid


def part_mask(I: jnp.ndarray, part_indices) -> jnp.ndarray:
    """OR of (I == pid) over a part-index group (chalearn_iuv_to_crop.py:114-119)."""
    m = jnp.zeros(I.shape, bool)
    for pid in part_indices:
        m = m | (I == pid)
    return m


largest_component_bbox_batch = jax.vmap(largest_component_bbox)
