"""Multi-host (multi-process / DCN) execution helpers.

The reference is strictly single-GPU (SURVEY.md §2.2); scaling past one host is
TPU-native machinery with no reference counterpart. The model here is JAX's
single-controller-per-process SPMD: every process runs the same program over
the global mesh; each feeds only the batch rows that live on its own devices
and `jax.make_array_from_process_local_data` assembles the logical global
array. Collectives ride ICI within a slice and DCN across slices — configure a
('slice', 'data') mesh via cfg.TPU.MESH_SHAPE/MESH_AXES so GSPMD keeps the
gradient all-reduce hierarchical.

This is wired into the shipped entry points — no hand-written loop needed.
On every participating host, run the SAME command:

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=p \
        python -m video_classification_tpu train slowfast-HTAH

Executed for real (not just faked topology) by tests/test_multihost_real.py:
two OS processes x 4 virtual CPU devices each, one 8-device global mesh,
`JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo` standing in for ICI/DCN — both
processes report the identical all-reduced loss and only process 0 writes
checkpoints. On a real TPU pod the same command works with no collectives
env var (the TPU runtime provides them).

`__main__` calls :func:`initialize_distributed` (a no-op without a
coordinator); when ``jax.process_count() > 1`` the Trainer feeds
`data.dataset.train_batches_for_host` blocks through
:func:`global_batch_from_local` (engine/trainer.py train_epoch), slices eval
batches per host (`Trainer._shard_eval_batch`), all-gathers eval scores via a
replicated out-sharding, and restricts checkpoint writes to process 0.

The Trainer's single-host path (`shard_batch`) is the process_count()==1
special case of `global_batch_from_local` — both produce a batch-sharded
global array; only the host-side feeding differs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .mesh import data_sharding, replicated


def initialize_distributed(cfg=None,
                           coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """`jax.distributed.initialize` from explicit args or the environment.

    Returns True if multi-process mode was initialized. No-ops (returns False)
    when no coordinator is configured and the standard TPU auto-detection
    environment is absent, so single-host runs never pay a timeout. Safe to
    call twice (the second call is ignored).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # TPU pod auto-detection: only when there is more than one worker —
    # single-host TPU images (including the axon tunnel) set
    # TPU_WORKER_HOSTNAMES=localhost, which must not trigger a coordinator.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    tpu_auto = bool(len([h for h in hostnames.split(",") if h.strip()]) > 1
                    or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not tpu_auto:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e):
            return jax.process_count() > 1
        raise
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_batch_indices(order: Sequence[int], global_batch: int,
                       n_processes: Optional[int] = None,
                       index: Optional[int] = None,
                       drop_last: bool = True) -> List[List[int]]:
    """Split an epoch's (already shuffled) index order into this host's rows.

    Every process must see the same ``order`` (same shuffle seed) and the same
    number of steps; process p takes the contiguous sub-block p of each global
    batch — contiguous, because a batch-sharded global array lays process p's
    addressable shards on rows [p*B/P, (p+1)*B/P).
    """
    p = n_processes if n_processes is not None else process_count()
    i = index if index is not None else process_index()
    assert global_batch % p == 0, (global_batch, p)
    per_host = global_batch // p
    out = []
    for start in range(0, len(order), global_batch):
        block = list(order[start:start + global_batch])
        if len(block) < global_batch:
            if drop_last:
                break
            # Tile the remainder up to the full batch (a single slice-append
            # can only double it — e.g. 3 rows can't fill 8 that way, which
            # would hand the hosts unequal local shard sizes).
            reps = -(-global_batch // len(block))
            block = (block * reps)[:global_batch]
        out.append(block[i * per_host:(i + 1) * per_host])
    return out


def global_batch_from_local(mesh, local_batch: Dict[str, Any],
                            batch_axis=None,
                            global_batch: Optional[int] = None) -> Dict[str, Any]:
    """Per-host local rows -> logical global batch-sharded jax.Arrays.

    ``local_batch`` holds this process's rows only (global/process_count).
    Scalars and 0-d entries are replicated. Single-process, this equals
    `shard_batch` exactly (tested on the virtual mesh).
    """
    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        sharding = data_sharding(mesh, x.ndim, batch_axis)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)


def assemble_fake_multihost(mesh, local_parts: Sequence[Dict[str, Any]],
                            batch_axis=None) -> Dict[str, Any]:
    """Test-only: emulate P processes on one process.

    Each entry of ``local_parts`` is what process p would pass to
    `global_batch_from_local`. Builds the same logical global array via
    per-device single-shard assembly (`make_array_from_single_device_arrays`) —
    exercising the exact row->device layout contract the multi-host path
    relies on, without multiple OS processes.
    """
    p = len(local_parts)

    def put(*locals_):
        arrs = [np.asarray(a) for a in locals_]
        if arrs[0].ndim == 0:
            return jax.device_put(arrs[0], replicated(mesh))
        global_shape = (sum(a.shape[0] for a in arrs),) + arrs[0].shape[1:]
        sharding = data_sharding(mesh, arrs[0].ndim, batch_axis)
        devices = sharding._device_assignment
        n_dev = len(devices)
        per_dev = global_shape[0] // n_dev
        shards = []
        full = np.concatenate(arrs, axis=0)
        for d in range(n_dev):
            shard = full[d * per_dev:(d + 1) * per_dev]
            shards.append(jax.device_put(shard, devices[d]))
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards)

    return jax.tree.map(put, *local_parts)
