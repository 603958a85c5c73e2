"""Serving-path tests: raw video -> class probabilities.

Checkpoints are synthesized (random-init variables written through the real
save_checkpoint path) — what these pin is the full inference chain: decode ->
online device preprocessing -> jitted eval -> per-video aggregation -> ranked
classes, plus the 5-stream ensemble's fusion plumbing.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.data.fixture import generate_raw_fixture
from video_classification_tpu.engine import Predictor, save_checkpoint
from video_classification_tpu.engine.predictor import EnsemblePredictor
from video_classification_tpu.ops.flow import FlowParams
from video_classification_tpu.pipeline.online import SyntheticOnlineDetector
from video_classification_tpu.pipeline.stages import sample_data

FAST_FLOW = FlowParams(n_outer=1, n_sor=2, min_width=16)


def _cfg(tmp_path, name="slowfast-pred-test", crop="CropLHand"):
    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    cfg.CHALEARN.NUM_CLASS = 3
    cfg.CHALEARN.SAMPLE_CLASS = 3
    cfg.CHALEARN.CLIP_LEN = 2
    cfg.CHALEARN.BATCH_SIZE = 2
    cfg.MODEL.DEPTH = 18
    cfg.MODEL.NAME = name
    cfg.MODEL.R3D_INPUT = crop
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA.FLOW_OUTER = 1
    cfg.DATA.FLOW_SOR = 2
    cfg.DATA.FLOW_MIN_WIDTH = 16
    return cfg


def _save_random_ckpt(cfg):
    """Init-and-save through the real checkpoint path (no training)."""
    import functools

    import jax.numpy as jnp

    from video_classification_tpu.engine.model_manager import ModelManager

    mm = ModelManager(cfg)
    model = mm.init_model()
    t = int(cfg.CHALEARN.CLIP_LEN)
    x0 = jnp.zeros((1, t, mm.crop_size, mm.crop_size, 21), jnp.uint8)
    init = jax.jit(functools.partial(model.init, train=False))
    variables = init(jax.random.PRNGKey(1), mm.normalize_and_prepare(x0))
    path = save_checkpoint(cfg, jax.device_get(variables), epoch=0, acc=0.5)
    assert path is not None


@pytest.fixture()
def video_root(tmp_path):
    cfg = _cfg(tmp_path)
    generate_raw_fixture(cfg, num_videos_per_set=1, num_classes=1, num_frames=12,
                         hw=(64, 96), sets=("train",))
    sample_data(cfg, sets=("train",))
    m = next(Path(tmp_path, "1_Sample").glob("**/M_*.avi"))
    k = Path(str(m).replace("M_", "K_"))
    return tmp_path, m, k


@pytest.mark.slow
def test_predictor_single_stream(video_root):
    tmp_path, m, k = video_root
    cfg = _cfg(tmp_path)
    _save_random_ckpt(cfg)
    pred = Predictor(cfg, detector=SyntheticOnlineDetector(),
                     flow_params=FAST_FLOW)
    y = pred.predict(str(m), str(k), top_k=3)
    assert y["probs"].shape == (3,)
    np.testing.assert_allclose(y["probs"].sum(), 1.0, atol=1e-5)
    assert len(y["top"]) == 3
    assert 1 <= y["top"][0][0] <= 3  # labels are reported 1-based
    assert y["clips"] >= 1
    # Deterministic: the same video scores identically.
    y2 = pred.predict(str(m), str(k), top_k=3)
    np.testing.assert_allclose(y["probs"], y2["probs"], atol=1e-6)


@pytest.mark.slow
def test_predictor_missing_depth(video_root):
    tmp_path, m, _ = video_root
    cfg = _cfg(tmp_path)
    _save_random_ckpt(cfg)
    pred = Predictor(cfg, detector=SyntheticOnlineDetector(),
                     flow_params=FAST_FLOW)
    y = pred.predict(str(m), None)  # no K_ video -> 127-fill depth channel
    assert y["probs"].shape == (3,)


@pytest.mark.slow
def test_ensemble_predictor(video_root, monkeypatch):
    tmp_path, m, k = video_root
    streams = ["slowfast-pred-a", "slowfast-pred-b"]
    for name in streams:
        _save_random_ckpt(_cfg(tmp_path, name=name))

    # load_model_cfg resolves yaml names; patch it to our synthetic streams.
    import video_classification_tpu.engine.predictor as predictor_mod

    def fake_load(name, overrides=None):
        return _cfg(tmp_path, name=name)

    monkeypatch.setattr(predictor_mod, "load_model_cfg", fake_load)
    ens = EnsemblePredictor(part_yamls=streams,
                            detector=SyntheticOnlineDetector(),
                            flow_params=FAST_FLOW)
    y = ens.predict(str(m), str(k), top_k=2)
    assert y["probs"].shape == (3,)
    np.testing.assert_allclose(y["probs"].sum(), 1.0, atol=1e-5)
    assert set(y["per_stream"]) == set(streams)
    assert len(y["top"]) == 2
