"""Fused on-device preprocessing graph tests.

Feeds synthetic detections with a known chart layout and verifies that part
crops land where the offline semantics say they should: torso crop contains the
torso pixels, missing parts produce 127-fill, UV channels rasterize, flow
companions select the right frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_classification_tpu.pipeline.device_pipeline import (
    Detections,
    preprocess_clip_on_device,
)
from video_classification_tpu.ops.flow import FlowParams

FAST_FLOW = FlowParams(n_outer=1, n_sor=4, min_width=16)


def _synthetic_inputs(t_raw=10, h=48, w=64, hm=28):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (t_raw, h, w, 3), dtype=np.uint8)
    depth = rng.randint(0, 255, (t_raw, h, w, 1), dtype=np.uint8)
    s = len(range(0, t_raw, 5))
    # Person box: central half of the padded (2h, 2w) frame.
    box = np.array([w // 2, h // 2, w // 2 + w, h // 2 + h], np.float32)
    boxes = np.tile(box, (s, 1))
    charts = np.zeros((s, hm, hm), np.int32)
    charts[:, 8:20, 8:20] = 1          # torso block (12x12 of 28 -> ~43% of box)
    charts[:, 22:, :6] = 4             # left hand bottom-left
    uv = np.zeros((s, 2, hm, hm), np.float32)
    uv[:, 0] = np.linspace(0, 1, hm)[None, None, :]
    uv[:, 1] = np.linspace(0, 1, hm)[None, :, None]
    dets = Detections(
        boxes_xyxy=jnp.asarray(boxes),
        valid=jnp.ones((s,), bool),
        charts=jnp.asarray(charts),
        uv=jnp.asarray(uv),
    )
    return jnp.asarray(frames), jnp.asarray(depth), dets


def test_device_pipeline_shapes_and_torso():
    frames, depth, dets = _synthetic_inputs()
    out = preprocess_clip_on_device(frames, depth, dets, flow_params=FAST_FLOW)
    # 10 frames, interval 5 -> 2 sampled frames.
    assert out["CropHTAH"].shape == (2, 192, 192, 21)
    assert out["CropTorso"].shape == (2, 128, 128, 21)
    assert out["CropLHand"].shape == (2, 64, 64, 21)
    # Torso box is 12/28 of a 64x48 body: ~27x20 px >= 15 -> valid.
    assert bool(out["CropTorso_valid"][0])
    torso = np.asarray(out["CropTorso"][0])
    assert not (torso == 127).all()
    # UV channels (3:5) rasterized: non-constant inside the crop.
    assert torso[..., 3].std() > 1.0


def test_device_pipeline_missing_part():
    frames, depth, dets = _synthetic_inputs()
    # Right hand (chart 3) never present -> CropRHand invalid, 127-filled.
    out = preprocess_clip_on_device(frames, depth, dets, flow_params=FAST_FLOW)
    assert not bool(out["CropRHand_valid"][0])
    np.testing.assert_array_equal(np.asarray(out["CropRHand"][0]),
                                  np.full((64, 64, 21), 127, np.uint8))


def test_device_pipeline_small_part_rejected():
    frames, depth, dets = _synthetic_inputs()
    # Left hand occupies 6x6 of 28 -> ~13x10 px < 15 -> rejected by min-size.
    out = preprocess_clip_on_device(frames, depth, dets, flow_params=FAST_FLOW)
    assert not bool(out["CropLHand_valid"][0])


def test_device_pipeline_invalid_detection():
    frames, depth, dets = _synthetic_inputs()
    dets = dets._replace(valid=jnp.zeros_like(dets.valid))
    out = preprocess_clip_on_device(frames, depth, dets, flow_params=FAST_FLOW)
    np.testing.assert_array_equal(np.asarray(out["CropTorso"][0]),
                                  np.full((128, 128, 21), 127, np.uint8))


def test_device_pipeline_jits():
    frames, depth, dets = _synthetic_inputs()

    fn = jax.jit(
        lambda f, d, det: preprocess_clip_on_device(f, d, det, flow_params=FAST_FLOW)
    )
    out = fn(frames, depth, dets)
    assert out["CropTorso"].dtype == jnp.uint8
