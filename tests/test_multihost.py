"""Multi-host helpers, faked on the 8-device virtual CPU mesh.

A real multi-process run needs multiple OS processes; what these tests pin is
the host-side math the multi-host path depends on: the per-host index split,
the row->device layout of the assembled global array (shard-by-host then
assemble == single-host shard_batch), and that a jit step consumes the
assembled array identically.
"""

import numpy as np
import jax
import jax.numpy as jnp

from video_classification_tpu.parallel import (
    assemble_fake_multihost,
    global_batch_from_local,
    host_batch_indices,
    initialize_distributed,
    make_mesh,
    shard_batch,
)


def _mesh(devices):
    return make_mesh(devices=devices)


def test_initialize_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_host_batch_indices_partition():
    order = list(range(20))
    a = host_batch_indices(order, global_batch=8, n_processes=2, index=0)
    b = host_batch_indices(order, global_batch=8, n_processes=2, index=1)
    # Same number of steps on every host; contiguous sub-blocks; drop_last.
    assert len(a) == len(b) == 2
    assert a[0] == [0, 1, 2, 3] and b[0] == [4, 5, 6, 7]
    assert a[1] == [8, 9, 10, 11] and b[1] == [12, 13, 14, 15]
    # Union over hosts per step == the global batch rows, no overlap.
    for sa, sb in zip(a, b):
        assert sorted(sa + sb) == sorted(set(sa + sb))


def test_single_process_local_equals_shard_batch(devices):
    mesh = _mesh(devices)
    batch = {
        "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "label": np.arange(8, dtype=np.int32),
    }
    a = global_batch_from_local(mesh, batch)  # process_count()==1: local==global
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_fake_two_host_assembly_matches_global(devices):
    mesh = _mesh(devices)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    labels = np.arange(16, dtype=np.int32)
    local0 = {"x": x[:8], "label": labels[:8]}
    local1 = {"x": x[8:], "label": labels[8:]}
    fake = assemble_fake_multihost(mesh, [local0, local1])
    want = shard_batch(mesh, {"x": x, "label": labels})
    for k in ("x", "label"):
        assert fake[k].shape == want[k].shape
        np.testing.assert_array_equal(np.asarray(fake[k]), np.asarray(want[k]))
        assert fake[k].sharding.is_equivalent_to(want[k].sharding, fake[k].ndim)

    # A global-view jit program consumes the assembled array identically.
    f = jax.jit(lambda a: jnp.sum(a, axis=1))
    np.testing.assert_allclose(np.asarray(f(fake["x"])), x.sum(axis=1))


def test_host_batch_indices_small_remainder_fills_full_batch():
    """A final block smaller than half the global batch must still tile up to
    the full batch (a single slice-append can only double it), so every host
    gets equal local shard sizes."""
    from video_classification_tpu.parallel.multihost import host_batch_indices

    order = list(range(19))  # last block = 3 rows, global batch 8
    b0 = host_batch_indices(order, 8, n_processes=2, index=0, drop_last=False)
    b1 = host_batch_indices(order, 8, n_processes=2, index=1, drop_last=False)
    assert [len(b) for b in b0] == [4, 4, 4]
    assert [len(b) for b in b1] == [4, 4, 4]
    assert b0[-1] + b1[-1] == [16, 17, 18, 16, 17, 18, 16, 17]
