"""Probe: Mosaic fori_loop iteration cost vs pltpu.roll cost on v5e.

The fused flow kernel's warp loop issues O(n^2 * c) lane rolls per outer
iteration. Default modes (one (240, 384) f32 field, N loop iterations):
  static     - roll amount is the Python constant 383 (roll by -1)
  dynamic    - roll amount is (i % 7 + 1) from the traced loop index
  sdyn       - dynamic SUBLANE (axis=0) rolls for comparison
  cc_lane    - static rotate written as concat of two static slices
  cc_row     - same on the row axis
  noop       - body is acc + 1e-9 only: the per-iteration floor
  unroll4/8  - noop body repeated 4x/8x per iteration (N/4, N/8 trips):
               does amortizing the loop overhead recover VPU rates?
Extra argv modes: tracedtrip (noop with a TRACED trip count), tracedroll
(dynamic roll + traced trip count).

FINDINGS (2026-08-20, v5e): us_per_roll static 4.31 | dynamic 4.63 | sdyn
4.54 | cc_lane 4.44 | cc_row 4.46 | noop 4.35 -> the fori_loop ITERATION,
not the roll, is the cost: ~4.3 us per iteration regardless of body
(carried-field VMEM round-trip + no cross-iteration pipelining). Fatter
bodies amortize it — see unroll4/unroll8.

Usage: python benchmarks/probe_roll.py [modes...]   (real TPU, ~1 min)
"""
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H, W = 240, 384
N = int(os.environ.get("N", "512"))


def _kernel(mode, x_ref, o_ref):
    x = x_ref[0]

    def body(i, acc):
        if mode == "static":
            r = pltpu.roll(acc, W - 1, axis=1)
        elif mode == "dynamic":
            r = pltpu.roll(acc, i % 7 + 1, axis=1)
        elif mode == "sdyn":
            r = pltpu.roll(acc, i % 7 + 1, axis=0)
        elif mode == "cc_lane":
            # Static rotate as concat of two static slices (the _shift
            # formulation pallas_flow._sor_kernel uses, closed into a rotate).
            r = jnp.concatenate([acc[:, W - 1:], acc[:, :W - 1]], axis=1)
        elif mode == "cc_row":
            r = jnp.concatenate([acc[H - 1:, :], acc[:H - 1, :]], axis=0)
        elif mode == "noop":  # loop-overhead floor
            r = acc
        elif mode in ("unroll4", "unroll8"):
            r = acc
            for _ in range(int(mode[-1]) - 1):
                r = r + 1e-9
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        return r + 1e-9  # defeat rotate-composition folding

    if mode == "tracedtrip":
        # Same noop body but the trip count is a TRACED scalar (read from the
        # input): measures the pipelining penalty of dynamic loop bounds —
        # the fused flow kernel's warp loops have r_dyn-dependent trips.
        n_t = (x_ref[0, 0, 0] * 0).astype(jnp.int32) + N

        def body_t(i, acc):
            return acc + 1e-9

        o_ref[0] = jax.lax.fori_loop(0, n_t, body_t, x)
    elif mode == "tracedroll":
        n_t = (x_ref[0, 0, 0] * 0).astype(jnp.int32) + N

        def body_tr(i, acc):
            return pltpu.roll(acc, i % 7 + 1, axis=1) + 1e-9

        o_ref[0] = jax.lax.fori_loop(0, n_t, body_tr, x)
    else:
        trips = N // int(mode[-1]) if mode.startswith("unroll") else N
        o_ref[0] = jax.lax.fori_loop(0, trips, body, x)


def run(mode):
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W) / (H * W)
    fn = jax.jit(pl.pallas_call(
        functools.partial(_kernel, mode),
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, H, W), jnp.float32),
    ))
    t0 = time.perf_counter()
    o = fn(x)
    float(jnp.sum(o))
    compile_s = time.perf_counter() - t0
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(o)
    float(jnp.sum(o))
    us_per_roll = (time.perf_counter() - t0) / reps / N * 1e6
    return compile_s, us_per_roll


if __name__ == "__main__":
    out = {}
    import sys
    modes = sys.argv[1:] or ("static", "dynamic", "sdyn", "cc_lane",
                             "cc_row", "noop")
    for mode in modes:
        c, u = run(mode)
        out[mode] = {"compile_s": round(c, 1), "us_per_roll": round(u, 3)}
        print(mode, out[mode], flush=True)
    print(json.dumps(out))
