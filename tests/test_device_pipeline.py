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


def test_resize_chart_to_canvas_matches_gather_formula():
    """The separable weight-matmul upsampling == the per-pixel gather formula
    it replaced (nearest for charts exactly; bilinear for UV to float tol)."""
    from video_classification_tpu.pipeline.device_pipeline import (
        _resize_chart_to_canvas,
    )

    hm, ch, cw = 14, 40, 52
    rng = np.random.RandomState(3)
    chart = rng.randint(0, 25, (hm, hm)).astype(np.int32)
    uv = rng.rand(2, hm, hm).astype(np.float32)
    for bh, bw in [(33, 47), (40, 52), (7, 12), (1, 1)]:
        got_c, got_u, got_v = jax.jit(
            lambda c, u, bh=bh, bw=bw: _resize_chart_to_canvas(
                c, u, jnp.int32(bh), jnp.int32(bw), (ch, cw)))(
                    jnp.asarray(chart), jnp.asarray(uv))
        rows = np.arange(ch)[:, None]
        cols = np.arange(cw)[None, :]
        inside = (rows < bh) & (cols < bw)
        fy = (np.arange(ch) + 0.5) * hm / max(bh, 1)
        fx = (np.arange(cw) + 0.5) * hm / max(bw, 1)
        iy = np.clip(fy.astype(np.int32), 0, hm - 1)
        ix = np.clip(fx.astype(np.int32), 0, hm - 1)
        want_c = np.where(inside, chart[iy[:, None], ix[None, :]], 0)
        np.testing.assert_array_equal(np.asarray(got_c), want_c)
        gy = np.clip(fy - 0.5, 0.0, hm - 1.0)
        gx = np.clip(fx - 0.5, 0.0, hm - 1.0)
        y0 = np.floor(gy).astype(np.int32)
        x0 = np.floor(gx).astype(np.int32)
        y1 = np.minimum(y0 + 1, hm - 1)
        x1 = np.minimum(x0 + 1, hm - 1)
        wy = (gy - y0)[:, None]
        wx = (gx - x0)[None, :]
        for m, got in ((uv[0], got_u), (uv[1], got_v)):
            want = (m[y0][:, x0] * (1 - wy) * (1 - wx)
                    + m[y0][:, x1] * (1 - wy) * wx
                    + m[y1][:, x0] * wy * (1 - wx)
                    + m[y1][:, x1] * wy * wx)
            np.testing.assert_allclose(np.asarray(got), np.where(inside, want, 0),
                                       atol=1e-5)
