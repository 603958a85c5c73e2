"""Pallas TPU kernel for connected-component label propagation.

The CC-labeling inner loop (ops/components.py) is an iterative 8-neighborhood
min-propagation whose trip count can reach H+W; in plain XLA every iteration
round-trips the (H, W) label map through HBM. This kernel keeps the labels in
VMEM for the whole propagation (grid = one program per mask in the batch), with
the neighbor mins computed from static-slice shifts — the same Mosaic-friendly
formulation as the flow SOR kernel (ops/pallas_flow.py).

Fixed trip count: the propagation runs ``n_iters`` times unconditionally (the
XLA path early-exits on a change flag; in VMEM an iteration is cheap enough that
the fixed bound wins). Matches ops/components.label_components bit-for-bit:
foreground pixels get their component's minimum linear index, background INT32_MAX.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(h: int, w: int) -> bool:
    # labels + mask + ~2 temporaries, int32.
    return 4 * h * w * 4 <= _VMEM_BUDGET_BYTES


_INF = jnp.iinfo(jnp.int32).max


def _shift_min(x, dy: int, dx: int):
    """Shifted copy with INF fill (labels outside the image are no-ops in min)."""
    h, w = x.shape
    if dy > 0:
        x = jnp.concatenate([jnp.full((dy, w), _INF, x.dtype), x[:-dy]], axis=0)
    elif dy < 0:
        x = jnp.concatenate([x[-dy:], jnp.full((-dy, w), _INF, x.dtype)], axis=0)
    if dx > 0:
        x = jnp.concatenate([jnp.full((h, dx), _INF, x.dtype), x[:, :-dx]], axis=1)
    elif dx < 0:
        x = jnp.concatenate([x[:, -dx:], jnp.full((h, -dx), _INF, x.dtype)], axis=1)
    return x


def _cc_kernel(n_iters, mask_ref, labels_out):
    mask = mask_ref[0] != 0
    h, w = mask.shape
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels = jnp.where(mask, lin, _INF)

    def body(_, labels):
        neigh = labels
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            neigh = jnp.minimum(neigh, _shift_min(labels, dy, dx))
        return jnp.where(mask, jnp.minimum(labels, neigh), _INF)

    labels = jax.lax.fori_loop(0, n_iters, body, labels)
    labels_out[0] = labels


def _ext_kernel(n_iters, mask_ref, mnr_out, mxr_out, mnc_out, mxc_out):
    """Per-component bbox extents by masked min/max propagation.

    Same fixpoint argument as label propagation: every foreground neighbor is
    by definition in the same 8-connected component, so min/max-pooling each
    pixel's (row, col) over the masked neighborhood converges every pixel to
    its component's bbox extents within the geodesic diameter. This replaces
    the scatter-based segment min/max in ops/components.largest_component_bbox
    — XLA lowers a TPU scatter to a sequential per-update while loop, which
    profiled at ~0.39 ms per (frame, part) mask in the crop stage (~47 ms of a
    0.94 s e2e clip)."""
    mask = mask_ref[0] != 0
    h, w = mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    neg = jnp.int32(-1)
    mnr = jnp.where(mask, rows, _INF)
    mxr = jnp.where(mask, rows, neg)
    mnc = jnp.where(mask, cols, _INF)
    mxc = jnp.where(mask, cols, neg)

    def _shift(x, dy, dx, fill):
        if dy > 0:
            x = jnp.concatenate([jnp.full((dy, w), fill, x.dtype), x[:-dy]], 0)
        elif dy < 0:
            x = jnp.concatenate([x[-dy:], jnp.full((-dy, w), fill, x.dtype)], 0)
        if dx > 0:
            x = jnp.concatenate([jnp.full((h, dx), fill, x.dtype), x[:, :-dx]], 1)
        elif dx < 0:
            x = jnp.concatenate([x[:, -dx:], jnp.full((h, -dx), fill, x.dtype)], 1)
        return x

    offsets = ((1, 0), (-1, 0), (0, 1), (0, -1),
               (1, 1), (1, -1), (-1, 1), (-1, -1))

    def cond(carry):
        _, changed, it = carry
        return jnp.logical_and(changed, it < n_iters)

    def body(carry):
        state, _, it = carry
        mnr, mxr, mnc, mxc = state
        nnr, xxr, nnc, xxc = mnr, mxr, mnc, mxc
        for dy, dx in offsets:
            nnr = jnp.minimum(nnr, _shift(mnr, dy, dx, _INF))
            xxr = jnp.maximum(xxr, _shift(mxr, dy, dx, neg))
            nnc = jnp.minimum(nnc, _shift(mnc, dy, dx, _INF))
            xxc = jnp.maximum(xxc, _shift(mxc, dy, dx, neg))
        new = (jnp.where(mask, nnr, _INF), jnp.where(mask, xxr, neg),
               jnp.where(mask, nnc, _INF), jnp.where(mask, xxc, neg))
        # Early exit at the fixpoint: real part masks converge in tens of
        # iterations, far under the H+W worst-case geodesic bound; the change
        # reduce is one pass over VMEM-resident fields and pays for itself
        # many times over.
        changed = (jnp.any(new[0] != mnr) | jnp.any(new[1] != mxr)
                   | jnp.any(new[2] != mnc) | jnp.any(new[3] != mxc))
        return new, changed, it + 1

    (mnr, mxr, mnc, mxc), _, _ = jax.lax.while_loop(
        cond, body, ((mnr, mxr, mnc, mxc), jnp.bool_(True), jnp.int32(0)))
    mnr_out[0] = mnr
    mxr_out[0] = mxr
    mnc_out[0] = mnc
    mxc_out[0] = mxc


def fits_vmem_extents(h: int, w: int) -> bool:
    # 4 extent fields + mask + ~4 shift temporaries, int32.
    return 9 * h * w * 4 <= _VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnums=(1, 2))
def component_extents_pallas(
    masks: jnp.ndarray, n_iters: int | None = None, interpret: bool = False
):
    """Batched per-component bbox extents: (B, H, W) -> 4 x (B, H, W) int32.

    Foreground pixels hold their component's (min_row, max_row, min_col,
    max_col); background holds (INT32_MAX, -1, INT32_MAX, -1)."""
    b, h, w = masks.shape
    if n_iters is None:
        n_iters = h + w
    kernel = functools.partial(_ext_kernel, n_iters)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(grid=(b,), in_specs=[spec], out_specs=[spec] * 4)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.int32)] * 4,
        interpret=interpret,
    )(masks.astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(1, 2))
def label_components_pallas(
    masks: jnp.ndarray, n_iters: int | None = None, interpret: bool = False
) -> jnp.ndarray:
    """Batched CC labels: (B, H, W) bool/int -> (B, H, W) int32."""
    b, h, w = masks.shape
    if n_iters is None:
        n_iters = h + w  # worst-case geodesic diameter
    kernel = functools.partial(_cc_kernel, n_iters)
    grid_spec = pl.GridSpec(
        grid=(b,),
        # memory_space=VMEM is load-bearing: the default (compiler-chosen)
        # space lands in HBM and every propagation sweep round-trips it.
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        interpret=interpret,
    )(masks.astype(jnp.int32))
