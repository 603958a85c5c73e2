"""Clip samplers.

Reproduces the reference's two sampling policies (chalearn_dataset.py:123-140):

  * random: one contiguous CLIP_LEN window with a uniformly random start in
    [0, max(0, seq_len - clip_len)]; if the video is shorter than the clip, indices
    wrap around via ``i % seq_len``.
  * uniform: sliding windows with stride 4 over [0, seq_len - clip_len); a short
    video yields a single random (wraparound) clip.

Device variants are static-shape: seq_len may be a traced scalar, and the uniform
sampler returns a fixed (max_clips, clip_len) index array plus a validity mask so it
can live inside jit.
"""

from __future__ import annotations

import random as _pyrandom
from typing import List, Tuple

import jax
import jax.numpy as jnp

UNIFORM_STRIDE = 4  # chalearn_dataset.py:137


# -- host (Python int) versions — used by the file-based dataset ----------------

def random_clip_indices(seq_len: int, clip_len: int, rng: _pyrandom.Random) -> List[int]:
    possible_start = max(0, seq_len - clip_len)
    start = rng.randint(0, possible_start)  # both ends inclusive
    return [i % seq_len for i in range(start, start + clip_len)]


def uniform_clip_indices(seq_len: int, clip_len: int, rng: _pyrandom.Random) -> List[List[int]]:
    if seq_len <= clip_len:
        return [random_clip_indices(seq_len, clip_len, rng)]
    return [
        list(range(t, t + clip_len))
        for t in range(0, seq_len - clip_len, UNIFORM_STRIDE)
    ]


def num_uniform_clips(seq_len: int, clip_len: int) -> int:
    if seq_len <= clip_len:
        return 1
    return len(range(0, seq_len - clip_len, UNIFORM_STRIDE))


# -- device (traced) versions -----------------------------------------------------

def random_clip_indices_device(
    key: jax.Array, seq_len: jnp.ndarray, clip_len: int
) -> jnp.ndarray:
    """(clip_len,) int32 indices; seq_len may be traced."""
    seq_len = jnp.asarray(seq_len, jnp.int32)
    possible_start = jnp.maximum(0, seq_len - clip_len)
    start = jax.random.randint(key, (), 0, possible_start + 1)
    idx = start + jnp.arange(clip_len, dtype=jnp.int32)
    return idx % jnp.maximum(seq_len, 1)


def uniform_clip_indices_device(
    seq_len: jnp.ndarray, clip_len: int, max_clips: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape uniform sampling.

    Returns (indices, mask): indices (max_clips, clip_len) int32, mask (max_clips,)
    bool marking real clips. Short videos produce one clip starting at 0 with
    wraparound (the deterministic case of the reference's fallback: start range
    collapses to [0, 0]).
    """
    seq_len = jnp.asarray(seq_len, jnp.int32)
    starts = jnp.arange(max_clips, dtype=jnp.int32) * UNIFORM_STRIDE
    n_real = jnp.where(
        seq_len <= clip_len,
        1,
        jnp.maximum(1, -(-(seq_len - clip_len) // UNIFORM_STRIDE)),
    )
    # ceil((seq_len - clip_len)/stride) == len(range(0, seq_len-clip_len, stride))
    mask = jnp.arange(max_clips) < n_real
    idx = starts[:, None] + jnp.arange(clip_len, dtype=jnp.int32)[None, :]
    idx = idx % jnp.maximum(seq_len, 1)
    return idx, mask
