"""Probe: warp share of the fused level kernel's per-outer fixed cost.

probe_level_split showed the fused 240x320 level kernel's time is entirely
the per-outer fixed block (SOR sweeps are free); this splits that block by
ablating the warp (warped := im2, everything else identical). full - nowarp
is the warp's share; nowarp bounds IRLS + smoothness + SOR setup + the
maxflow reduction.

Caveat: u = v = 0 init means the dynamic warp radius ramps up from 1 across
outer iterations; production finest levels inherit upsampled coarse flow
(r_dyn ~ ceil(max|flow|)), so the measured warp share UNDERSTATES the real
per-level warp cost for large-motion pairs (advisor r4).

Usage: python benchmarks/probe_outer_split.py   (real TPU, ~3 min cold)
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


def time_level(im1, im2, u, v, params, ablate, reps=8):
    from video_classification_tpu.ops.pallas_flow import flow_level_fused_pallas

    uo, vo, _ = flow_level_fused_pallas(im1, im2, u, v, params,
                                     ablate_warp=ablate)
    float(jnp.sum(uo) + jnp.sum(vo))
    t0 = time.perf_counter()
    for _ in range(reps):
        uo, vo, _ = flow_level_fused_pallas(im1, im2, u, v, params,
                                         ablate_warp=ablate)
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
    for ablate, tag in [(False, "full"), (True, "nowarp")]:
        out[tag] = round(time_level(im1, im2, u, v, DEFAULT_PARAMS, ablate), 3)
    out["warp_ms_per_pair"] = round(out["full"] - out["nowarp"], 3)
    out["warp_share"] = round(out["warp_ms_per_pair"] / out["full"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
