"""Temporal sequence parallelism: shard the clip's T axis over the mesh.

The reference handles long videos purely by sampling (CLIP_LEN=20 windows,
SURVEY.md §5 "long-context"); the model itself is a 3D CNN, so the TPU-native way
to scale the temporal footprint is to shard T across mesh devices and exchange
one-frame halos between neighbors for the temporal convolutions — a
`shard_map` + `lax.ppermute` pattern whose transfers ride the ICI.

`conv3d_temporal_sharded` computes a stride-1 SAME conv3d with the T axis sharded:
each shard receives `kt//2` halo frames from each neighbor (zero at the clip
boundary, matching SAME zero padding) and convolves locally with VALID temporal
padding — bitwise equal to the unsharded convolution.

`halo_exchange_t` is the reusable primitive for running any local temporal
operator under `shard_map`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def halo_exchange_t(x_local: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Append `halo` frames from each temporal neighbor: (N, Tl, ...) ->
    (N, Tl + 2*halo, ...). Boundary shards get zeros (SAME-conv semantics).

    Must run inside shard_map/pmap with `axis_name` bound.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # data moves to the right neighbor
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(x_local[:, -halo:], axis_name, fwd)
    from_right = jax.lax.ppermute(x_local[:, :halo], axis_name, bwd)
    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([from_left, x_local, from_right], axis=1)


def conv3d_temporal_sharded(
    x: jnp.ndarray,
    w: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
) -> jnp.ndarray:
    """SAME, stride-1 conv3d over (N, T, H, W, Cin) with T sharded on `axis_name`.

    w: (kt, kh, kw, Cin, Cout). T must divide the mesh axis size and each local
    shard must hold at least kt//2 frames.
    """
    kt, kh, kw = w.shape[:3]
    halo = kt // 2
    t = x.shape[1]
    size = mesh.shape[axis_name]
    assert t % size == 0, (t, size)
    assert t // size >= halo, "shard shorter than the halo"

    def local_fn(xl, wl):
        xh = halo_exchange_t(xl, halo, axis_name) if halo else xl
        return jax.lax.conv_general_dilated(
            xh,
            wl,
            window_strides=(1, 1, 1),
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis_name), P()),
        out_specs=P(None, axis_name),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
    w = jax.device_put(w, NamedSharding(mesh, P()))
    return fn(x, w)
