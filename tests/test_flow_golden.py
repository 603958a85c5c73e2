"""Checked-in flow regression goldens at the real ChaLearn frame size.

Zero egress makes true pyflow golden outputs unobtainable, so the protection
here is against *silent drift*: tests/goldens/flow_240x320.npz freezes the
solver's uint8 flow images (full reference parameters, 240x320 frames,
generated on the CPU/XLA backend). Any future solver edit that moves the
quantized output — the exact tensor the model trains on — fails loudly.

The TPU test additionally pins the Pallas VMEM SOR path against the same
golden (the auto backend at 240x320 on TPU), closing the r1 gap of the Pallas
kernel only being interpret-tested at toy sizes.
"""

from pathlib import Path

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from video_classification_tpu.ops.flow import FlowParams, video_flow_uint8

GOLDEN = Path(__file__).parent / "goldens" / "flow_240x320.npz"


def make_frames(seed=0, t=3, h=240, w=320):
    """Deterministic synthetic frames: smooth translated pattern + tiny noise
    (regenerated here rather than stored — the golden stores only outputs)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for k in range(t):
        dx, dy = 1.7 * k, -1.1 * k
        f = (127 + 60 * np.sin((xx - dx) / 23.0) * np.cos((yy - dy) / 17.0)
             + 40 * np.sin(((xx - dx) + (yy - dy)) / 41.0))
        f = f[..., None].repeat(3, -1) + rng.randn(h, w, 3) * 2.0
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return np.stack(frames)


def _check(got: np.ndarray, want: np.ndarray, frac: float, tol: int):
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    within = float((diff <= tol).mean())
    assert within >= frac, (within, float(diff.max()))


@pytest.mark.slow
def test_flow_golden_full_size_xla():
    want = np.load(GOLDEN)["flow_images"]
    got = np.asarray(video_flow_uint8(
        jnp.asarray(make_frames()), FlowParams(backend="xla")))
    assert got.shape == want.shape == (3, 240, 320, 3)
    # Same backend/platform family as generation: essentially exact; allow
    # +-1 uint8 for compiler fma/reassociation churn across versions.
    _check(got, want, frac=0.999, tol=1)


@pytest.mark.slow
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pins the TPU (Pallas auto) backend against the golden")
def test_flow_golden_full_size_tpu_pallas():
    want = np.load(GOLDEN)["flow_images"]
    got = np.asarray(video_flow_uint8(jnp.asarray(make_frames()), FlowParams()))
    # Cross-backend (CPU golden vs TPU pallas): quantized flow must agree to
    # within the uint8 tolerance the model contract gives us.
    _check(got, want, frac=0.98, tol=2)
