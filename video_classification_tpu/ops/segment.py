"""Per-video score aggregation.

Test-time evaluation scores every uniformly-sampled clip, then averages the softmax
scores of all clips belonging to the same video and takes the argmax
(train.py:337-364). Here the ragged [clips-per-video] structure is expressed as a
segment-id vector so the whole aggregation is one device-side segment-mean — no host
loop over videos.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def segment_ids_from_counts(samples_per_video: List[int], total: int | None = None) -> np.ndarray:
    """[3, 2, ...] -> [0,0,0,1,1,...] (host-side, shapes are data-dependent)."""
    ids = np.repeat(np.arange(len(samples_per_video)), samples_per_video)
    if total is not None:
        assert ids.shape[0] == total
    return ids.astype(np.int32)


def per_video_scores(
    clip_scores: jnp.ndarray, segment_ids: jnp.ndarray, num_videos: int
) -> jnp.ndarray:
    """Mean clip score per video: (N_clips, C) -> (num_videos, C)."""
    sums = jax.ops.segment_sum(clip_scores, segment_ids, num_segments=num_videos)
    counts = jax.ops.segment_sum(
        jnp.ones((clip_scores.shape[0],), clip_scores.dtype),
        segment_ids,
        num_segments=num_videos,
    )
    return sums / jnp.maximum(counts, 1.0)[:, None]


def per_video_accuracy(
    clip_scores: jnp.ndarray,
    clip_labels: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_videos: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Video-level top-1 accuracy with mean-score aggregation (train.py:344-364).

    Returns (accuracy scalar, per-video correctness bool vector). ``clip_labels``
    must be constant within each segment (asserted by the reference; here the first
    clip's label per video is used).
    """
    video_scores = per_video_scores(clip_scores, segment_ids, num_videos)
    preds = jnp.argmax(video_scores, axis=-1)
    # First label of each segment.
    first = jax.ops.segment_min(clip_labels, segment_ids, num_segments=num_videos)
    correct = preds == first
    return jnp.mean(correct.astype(jnp.float32)), correct


def softmax_scores(logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax over classes (train.py:338 applies exp/sum on host; fused here)."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
