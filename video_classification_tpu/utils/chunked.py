"""Fixed-size chunked execution of a vmapped per-item graph.

Shared by the detector inference paths (detect/provider.py,
pipeline/online.py): running N items through a jitted, vmapped single-item
graph in chunks of one static ``batch_size`` — the last (or only) chunk is
padded by repeating the final item and the padded rows are dropped — so every
call reuses ONE compiled program regardless of N. Through the axon TPU tunnel
a recompile costs minutes, so letting the batch shape follow the per-call item
count (e.g. ``min(batch_size, n)``) would recompile per distinct remainder;
padding up keeps shapes static per the repo convention (CLAUDE.md).
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np


def run_chunked(apply_batch: Callable, items: np.ndarray, batch_size: int,
                to_host: bool = False):
    """Map ``apply_batch`` (a jitted vmapped graph taking (batch_size, ...))
    over ``items`` in fixed-size chunks; returns the per-chunk output trees
    concatenated along axis 0 (padded rows removed).

    By default outputs stay on device — callers ``jax.device_get`` if they
    need host arrays. ``to_host=True`` fetches each chunk's outputs as it
    completes and concatenates on host: peak device memory is then one
    chunk's outputs instead of the whole video's (long videos with large
    per-frame outputs — charts/uv heatmaps — would otherwise scale peak HBM
    with video length)."""
    n = items.shape[0]
    bs = max(1, int(batch_size))
    outs: List = []
    for lo in range(0, n, bs):
        chunk = np.asarray(items[lo:lo + bs])
        pad = bs - chunk.shape[0]
        if pad:  # repeat the last item; padded rows dropped below
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        out = apply_batch(jnp.asarray(chunk))
        if pad:
            out = jax.tree.map(lambda a: a[:-pad], out)
        if to_host:
            out = jax.device_get(out)
        outs.append(out)
    if len(outs) == 1:
        return outs[0]
    cat = np.concatenate if to_host else jnp.concatenate
    return jax.tree.map(lambda *xs: cat(xs), *outs)
