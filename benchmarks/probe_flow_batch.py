"""Probe: full-resolution flow program stability x batch size (VERDICT r3 #3).

The 2026-08-16 finding was that 240x320 optical-flow programs at batch >= 8
crash the remote TPU worker on BOTH the XLA and Pallas-SOR backends, pinning
the guarded path at pair_chunk=4 (ops/flow.py:385-388 rationale). The fused
level kernel (ops/pallas_flow._flow_level_kernel) replaced those multi-
thousand-op XLA level graphs with 9 pallas_calls per pair, so the per-program
op count and live-set collapsed; this probe re-characterizes the ceiling.

Usage: BATCH=8 [H=240 W=320] python benchmarks/probe_flow_batch.py
Prints one JSON line {"batch": B, "ok": true, "ms_per_pair": x} on success;
a crash/hang surfaces as a nonzero exit (run under `timeout`).

FINDINGS (2026-08-19, v5e through the axon tunnel):
- BATCH=4: ok, 7.18 ms/pair (cold cache). BATCH=8: wedged the worker again
  (600 s timeout, tunnel dead afterwards; recovered in ~60 min).
- This RULES OUT per-program XLA op count / graph size as the cause: the
  fused level kernel collapsed the level graphs to 9 pallas_calls per pair
  (~100 HLO ops total) and batch 8 still kills the worker, exactly like the
  multi-thousand-op per-op XLA path did on 2026-08-16.
- Remaining suspects are in the worker/compile-helper, not our program
  structure: per-call device wall-time (8 pairs x ~9 fused levels in one
  dispatch) tripping a worker watchdog, or a worker-side memory limit while
  lowering grid=8 programs with ~14 MB/program VMEM demand. HBM live set is
  ~50 MB at batch 8 — not plausibly the ceiling.
- Practical ceiling therefore stays pair_chunk=4 (ops/flow.py guarded path);
  raising it needs a tunnel-side fix, not a kernel restructure.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    from video_classification_tpu.ops.flow import DEFAULT_PARAMS, coarse2fine_flow
    from video_classification_tpu.utils.synthetic import coherent_motion_frames

    b = int(os.environ.get("BATCH", "8"))
    h = int(os.environ.get("H", "240"))
    w = int(os.environ.get("W", "320"))
    frames = coherent_motion_frames(b + 1, h, w, jax.random.PRNGKey(0))
    im1 = frames[:-1].astype(jnp.float32) / 255.0
    im2 = frames[1:].astype(jnp.float32) / 255.0

    fn = jax.jit(lambda a, c: coarse2fine_flow(a, c, DEFAULT_PARAMS))
    u, v = fn(im1, im2)
    float(jnp.sum(u) + jnp.sum(v))  # tunnel-safe fence
    reps = int(os.environ.get("REPS", "3"))
    t0 = time.perf_counter()
    for _ in range(reps):
        u, v = fn(im1, im2)
    float(jnp.sum(u) + jnp.sum(v))
    ms = (time.perf_counter() - t0) / reps / b * 1e3
    print(json.dumps({"batch": b, "h": h, "w": w, "ok": True,
                      "ms_per_pair": round(ms, 3)}))


if __name__ == "__main__":
    main()
