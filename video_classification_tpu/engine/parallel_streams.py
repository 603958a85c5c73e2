"""Stream-parallel training: one crop stream per device group.

The reference trains its six part streams strictly sequentially on one GPU
(`/root/reference/train.py:405-419` loops the yaml list). The streams share
nothing — different crop folders, separate checkpoints — so on a TPU slice
they are embarrassingly parallel: give each stream its own sub-mesh of the
device grid and run the Trainers concurrently. Host threads only drive
dispatch (JAX execution is async per device); device work never contends.

This composes with data parallelism: ``devices_per_stream > 1`` gives every
stream a multi-chip data-parallel sub-mesh, so a v5e-8 can run e.g. 4 streams
x 2-chip DP, or all 6 reference streams on one chip each with 2 spare.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional, Sequence

import jax

from ..config.defaults import load_model_cfg
from ..parallel import make_mesh


def assign_device_groups(devices: Sequence, n_streams: int,
                         devices_per_stream: int) -> List[List]:
    """Contiguous, disjoint device groups, one per stream (round-robin reuse
    only when streams exceed capacity — groups then time-share a device set)."""
    n = len(devices)
    per = max(1, devices_per_stream)
    capacity = max(1, n // per)
    groups = []
    for s in range(n_streams):
        slot = s % capacity
        groups.append(list(devices[slot * per:(slot + 1) * per]))
    return groups


def train_streams_parallel(
    model_names: Sequence[str],
    cfg_overrides: Optional[List[str]] = None,
    devices_per_stream: int = 1,
    cfg_factory: Optional[Callable] = None,
    trainer_factory: Optional[Callable] = None,
) -> Dict[str, float]:
    """Train every stream concurrently; returns {name: best accuracy}.

    ``cfg_factory(name) -> cfg`` overrides the default yaml loading (tests);
    ``trainer_factory(cfg, mesh) -> trainer-with-.train()`` likewise.
    """
    if trainer_factory is None:
        from .trainer import Trainer

        trainer_factory = lambda cfg, mesh: Trainer(cfg, mesh=mesh)  # noqa: E731
    if cfg_factory is None:
        overrides = list(cfg_overrides or [])
        cfg_factory = lambda name: load_model_cfg(name, overrides=overrides)  # noqa: E731

    devices = jax.devices()
    groups = assign_device_groups(devices, len(model_names), devices_per_stream)
    results: Dict[str, float] = {}
    errors: Dict[str, BaseException] = {}

    def run(name: str, group):
        try:
            cfg = cfg_factory(name)
            mesh = make_mesh(cfg, devices=group)
            results[name] = float(trainer_factory(cfg, mesh).train())
        except BaseException as e:  # surfaced after join
            errors[name] = e

    threads = [threading.Thread(target=run, args=(nm, g), name=f"stream-{nm}")
               for nm, g in zip(model_names, groups)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # Per-stream completion report: an overnight 6-stream run must say which
    # streams finished and which died, not just the first failure.
    for name in model_names:
        if name in results:
            print(f"stream {name}: done, best acc {results[name]:.4f}")
        elif name in errors:
            print(f"stream {name}: FAILED: {errors[name]!r}")
    if errors:
        detail = "; ".join(f"{n}: {e!r}" for n, e in errors.items())
        err = RuntimeError(
            f"{len(errors)}/{len(model_names)} streams failed ({detail}); "
            f"completed: {sorted(results)}")
        # Chain the first failure for its traceback; the message carries all.
        raise err from next(iter(errors.values()))
    return results
