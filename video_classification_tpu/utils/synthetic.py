"""Synthetic device-resident video fixtures for benches and profiles.

Zero egress means no real ChaLearn footage on this host; benchmarks that
exercise the optical-flow path must still see *coherent motion*, because the
warp backend is an adaptive radius cascade (ops/flow._warp): pure-noise frames
solve to near-zero flow and would route every warp through the cheapest tier,
flattering any number derived from them. The blob fixture below moves at
~3 px/frame — the scale of real consecutive-raw-frame hand motion in the
ChaLearn clips the reference processes (chalearn_video_to_flow.py:62-66
computes flow between consecutive raws).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coherent_motion_frames(t: int, h: int, w: int,
                           key: jax.Array | None = None) -> jnp.ndarray:
    """(T, H, W, 3) uint8 frames: a textured blob translating ~3 px/frame.

    A Gaussian blob carrying a sinusoidal texture (locked to the blob, so it
    translates with it) moves diagonally over a static random background. The
    flow solver recovers real nonzero flow on consecutive pairs, so warp-tier
    selection, SOR convergence behavior, and flow-energy statistics all match
    what real footage produces — unlike i.i.d. noise frames.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    bg = jax.random.uniform(key, (h, w, 3), jnp.float32, 0.25, 0.75)
    t_idx = jnp.arange(t, dtype=jnp.float32)
    cy = h * 0.3 + 1.5 * t_idx
    cx = w * 0.25 + 2.5 * t_idx
    blob = jnp.exp(-(((yy - cy[:, None, None]) / (h * 0.08)) ** 2
                     + ((xx - cx[:, None, None]) / (w * 0.08)) ** 2))
    tex = 0.5 + 0.5 * jnp.sin(0.7 * (yy - cy[:, None, None])) \
        * jnp.sin(0.9 * (xx - cx[:, None, None]))
    fr = bg[None] * (1.0 - blob[..., None]) + (tex * blob)[..., None]
    return (fr * 255.0).astype(jnp.uint8)
