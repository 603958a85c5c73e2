"""Serving-latency harness: raw video -> prediction through engine/predictor.

The reference has no inference entry point (train-loop eval prints only); the
Predictor is net-new capability, so this harness records its end-to-end warm
latency as a first-class number:

    python benchmarks/bench_infer.py          # real TPU (or VCT_PLATFORM=cpu)
    FRAMES=100 HW=240x320 sets the synthetic raw-video shape.

Prints one JSON line {"infer_sec_per_video": s, "clips": n, ...} last. Uses
the synthetic online detector (the converted-DensePose leg is measured
separately by bench_detector.py) so the number isolates decode + fused device
preprocessing + clip scoring + aggregation — the serving path's own work.
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VCT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VCT_PLATFORM"])

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    import tempfile
    from pathlib import Path

    from video_classification_tpu.config import load_model_cfg
    from video_classification_tpu.data.fixture import generate_raw_fixture
    from video_classification_tpu.engine.predictor import Predictor

    frames = int(os.environ.get("FRAMES", "100"))
    h, w = (int(v) for v in os.environ.get("HW", "240x320").split("x"))

    root = tempfile.mkdtemp(prefix="vct_infer_")
    cfg = load_model_cfg("slowfast-HTAH")
    cfg.CHALEARN.ROOT = root
    cfg.DATA.ONLINE_DETECTOR = "synthetic"
    cfg.DEBUG = True
    generate_raw_fixture(cfg, num_videos_per_set=1, num_classes=2,
                         num_frames=frames, sets=("test",), hw=(h, w))
    test_dir = Path(root, cfg.CHALEARN.ISO, "test")
    m_path = next(test_dir.rglob("M_*.avi"))
    k_path = Path(str(m_path).replace("M_", "K_", 1))

    pred = Predictor(cfg)  # warns: no checkpoint — latency, not accuracy
    out = pred.predict(str(m_path), str(k_path))  # compile + warm
    t0 = time.perf_counter()
    reps = int(os.environ.get("ITERS", "3"))
    for _ in range(reps):
        out = pred.predict(str(m_path), str(k_path))
    sec = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "infer_sec_per_video": round(sec, 3),
        "clips": int(out["clips"]),
        "frames": frames,
        "hw": f"{h}x{w}",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
