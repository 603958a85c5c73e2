"""Clip-sampler and segment-aggregation tests vs the reference's numpy semantics."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from video_classification_tpu.ops import (
    random_clip_indices,
    uniform_clip_indices,
    num_uniform_clips,
    random_clip_indices_device,
    uniform_clip_indices_device,
    segment_ids_from_counts,
    per_video_scores,
    per_video_accuracy,
    softmax_scores,
)


def _ref_random_sampling(seq_len, clip_len, rng):
    # chalearn_dataset.py:123-129, verbatim
    possible_start_idx = max(0, seq_len - clip_len)
    start_idx = rng.randint(0, possible_start_idx)
    return [i % seq_len for i in range(start_idx, start_idx + clip_len)]


def _ref_uniform_sampling(seq_len, clip_len, rng):
    # chalearn_dataset.py:131-140, verbatim
    clips = []
    if seq_len <= clip_len:
        clips.append(_ref_random_sampling(seq_len, clip_len, rng))
    else:
        for t in range(0, seq_len - clip_len, 4):
            clips.append(list(range(t, t + clip_len)))
    return clips


def test_random_sampling_matches_reference():
    for seq_len in [5, 19, 20, 21, 37, 100]:
        a = random.Random(42)
        b = random.Random(42)
        got = random_clip_indices(seq_len, 20, a)
        want = _ref_random_sampling(seq_len, 20, b)
        assert got == want


def test_uniform_sampling_matches_reference():
    for seq_len in [5, 20, 21, 24, 25, 60, 101]:
        a = random.Random(7)
        b = random.Random(7)
        got = uniform_clip_indices(seq_len, 20, a)
        want = _ref_uniform_sampling(seq_len, 20, b)
        assert got == want
        assert num_uniform_clips(seq_len, 20) == len(want)


def test_random_sampling_device():
    key = jax.random.PRNGKey(0)
    for seq_len in [5, 20, 50]:
        idx = np.asarray(random_clip_indices_device(key, seq_len, 20))
        assert idx.shape == (20,)
        assert idx.min() >= 0 and idx.max() < seq_len
        if seq_len >= 20:
            # contiguous window
            assert np.all(np.diff(idx) == 1)
        else:
            # wraparound from start 0
            assert list(idx) == [i % seq_len for i in range(20)]


def test_uniform_sampling_device_matches_host():
    clip_len, max_clips = 20, 32
    for seq_len in [5, 20, 21, 24, 25, 60, 101]:
        idx, mask = uniform_clip_indices_device(seq_len, clip_len, max_clips)
        idx, mask = np.asarray(idx), np.asarray(mask)
        want = _ref_uniform_sampling(seq_len, clip_len, random.Random(0))
        assert mask.sum() == len(want)
        for i, w in enumerate(want):
            assert list(idx[i]) == [x % seq_len for x in w]


def test_per_video_aggregation_matches_reference():
    # Reference aggregation (train.py:337-364): softmax clip scores, mean per
    # video, argmax, compare with the (constant) video label.
    rng = np.random.RandomState(0)
    samples_per_video = [3, 1, 5, 2]
    n = sum(samples_per_video)
    num_class = 7
    logits = rng.randn(n, num_class).astype(np.float32)
    labels = np.repeat(rng.randint(0, num_class, len(samples_per_video)), samples_per_video)

    # Reference-style computation.
    ps = np.exp(logits) / np.sum(np.exp(logits), axis=1, keepdims=True)
    correct, read = [], 0
    for ns in samples_per_video:
        preds = ps[read : read + ns].mean(axis=0)
        correct.append(np.argmax(preds) == labels[read])
        read += ns
    want_acc = np.mean(correct)

    seg = segment_ids_from_counts(samples_per_video, n)
    scores = softmax_scores(jnp.asarray(logits))
    acc, corr = per_video_accuracy(scores, jnp.asarray(labels), jnp.asarray(seg), len(samples_per_video))
    assert np.isclose(float(acc), want_acc)
    np.testing.assert_array_equal(np.asarray(corr), np.array(correct))

    vs = np.asarray(per_video_scores(scores, jnp.asarray(seg), len(samples_per_video)))
    read = 0
    for vi, ns in enumerate(samples_per_video):
        np.testing.assert_allclose(vs[vi], ps[read : read + ns].mean(axis=0), rtol=1e-5, atol=1e-7)
        read += ns
