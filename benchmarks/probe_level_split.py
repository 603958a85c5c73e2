"""Probe: where does the fused level kernel's time go? (warp vs SOR vs glue)

Times flow_level_fused_pallas at the finest level (240x320, c=3, b=4) across
(n_outer, n_sor) settings; differencing isolates the per-outer fixed cost
(warp + IRLS weights) from the per-SOR-sweep cost, and comparing with the
full coarse2fine_flow wall time bounds the XLA glue (pyramid build, per-level
flow upsample).

Usage: python benchmarks/probe_level_split.py  (real TPU; ~2 min warm cache)

FINDINGS (2026-08-19, v5e, finest level 240x320 c=3 b=4, ms/pair):
full 2.952 | sor1 2.572 | outer1 1.270 | min 1.313
-> per SOR half-sweep pair: 0.0019 ms (30 sweeps x 7 outers = 13% of full);
   per-outer fixed (warp + IRLS + smoothness): 0.366 ms = ~87%.
The packed red-black SOR idea is dead — sweeps are near-free once VMEM-
resident. The per-outer warp_all (dynamic pltpu.roll amounts + traced
fori_loop trip counts from r_dyn) and the IRLS/smoothness block are where
the kernel's time goes; static-shift warp variants are the next lever.
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


def time_level(im1, im2, u, v, params, reps=5):
    from video_classification_tpu.ops.pallas_flow import flow_level_fused_pallas

    uo, vo, _ = flow_level_fused_pallas(im1, im2, u, v, params)
    float(jnp.sum(uo) + jnp.sum(vo))
    t0 = time.perf_counter()
    for _ in range(reps):
        uo, vo, _ = flow_level_fused_pallas(im1, im2, u, v, params)
    float(jnp.sum(uo) + jnp.sum(vo))
    return (time.perf_counter() - t0) / reps / im1.shape[0] * 1e3


def main():
    from video_classification_tpu.ops.flow import DEFAULT_PARAMS
    from video_classification_tpu.utils.synthetic import coherent_motion_frames

    b, h, w = 4, 240, 320
    frames = coherent_motion_frames(b + 1, h, w, jax.random.PRNGKey(0))
    im1 = frames[:-1].astype(jnp.float32) / 255.0
    im2 = frames[1:].astype(jnp.float32) / 255.0
    u = jnp.zeros((b, h, w), jnp.float32)
    v = jnp.zeros((b, h, w), jnp.float32)

    out = {}
    p = DEFAULT_PARAMS
    for n_outer, n_sor, tag in [
        (p.n_outer, p.n_sor, "full"),        # 7 x (warp + 30 SOR)
        (p.n_outer, 1, "sor1"),              # 7 x (warp + 1 SOR)
        (1, p.n_sor, "outer1"),              # 1 x (warp + 30 SOR)
        (1, 1, "min"),
    ]:
        q = p._replace(n_outer=n_outer, n_sor=n_sor)
        out[tag] = round(time_level(im1, im2, u, v, q), 3)

    # Derived split (ms/pair at the finest level):
    per_sweep = (out["full"] - out["sor1"]) / (p.n_outer * (p.n_sor - 1))
    per_outer_fixed = out["sor1"] / p.n_outer  # warp + IRLS + 1 sweep
    out["per_sor_sweep_ms"] = round(per_sweep, 4)
    out["per_outer_warp_irls_ms"] = round(per_outer_fixed - per_sweep, 4)
    out["sor_share_of_full"] = round(
        per_sweep * p.n_outer * p.n_sor / out["full"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
