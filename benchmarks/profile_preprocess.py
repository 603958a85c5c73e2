"""Capture a device profile of the e2e preprocessing graph and print top ops.

Usage: python benchmarks/profile_preprocess.py [logdir]

Profiles `preprocess_clip_on_device` at the bench.py --e2e-child config (one
100-frame 240x320 clip -> 21-channel crop stacks) and aggregates device time
by HLO op category. Works through the axon tunnel (same trace.json.gz parsing
as profile_step.py); this is how the ~2 GB/s vmapped crop/resize gathers were
found and replaced with one-hot matmuls (ops/image.shift2d).
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VCT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VCT_PLATFORM"])

from video_classification_tpu.config import get_cfg
from video_classification_tpu.ops.flow import FlowParams
from video_classification_tpu.pipeline.device_pipeline import (
    Detections,
    preprocess_clip_on_device,
)


def build():
    cfg = get_cfg()
    interval = int(cfg.CHALEARN.IMG_SAMPLE_INTERVAL)
    t_raw, h, w, hm = int(cfg.CHALEARN.CLIP_LEN) * interval, 240, 320, 112
    s = -(-t_raw // interval)
    key = jax.random.PRNGKey(0)
    # Coherent motion so the warp cascade profiles at the real-footage tier
    # (noise frames -> near-zero flow -> cheapest tier; see utils/synthetic).
    from video_classification_tpu.utils.synthetic import coherent_motion_frames

    frames = coherent_motion_frames(t_raw, h, w, key)
    depth = frames[..., :1]
    dets = Detections(
        boxes_xyxy=jnp.tile(
            jnp.asarray([[w * 0.5, h * 0.5, w * 1.5, h * 1.5]], jnp.float32),
            (s, 1)),
        valid=jnp.ones((s,), bool),
        charts=jax.random.randint(key, (s, hm, hm), 0, 25, jnp.int32),
        uv=jax.random.uniform(key, (s, 2, hm, hm), jnp.float32),
    )
    fn = jax.jit(lambda f, d, det: preprocess_clip_on_device(
        f, d, det, interval=interval, flow_params=FlowParams()))
    return fn, frames, depth, dets


def capture(logdir: str, reps: int = 2):
    fn, frames, depth, dets = build()
    out = fn(frames, depth, dets)
    key0 = "CropHTAH"
    float(jnp.sum(out[key0][0].astype(jnp.float32)))
    jax.profiler.start_trace(logdir)
    for _ in range(reps):
        out = fn(frames, depth, dets)
    float(jnp.sum(out[key0][0].astype(jnp.float32)))
    jax.profiler.stop_trace()
    return reps


def report(logdir: str, steps: int):
    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        a = e.get("args", {})
        op = a.get("tf_op", "") or e.get("name", "")
        if not op:
            continue
        # Group by the leading op kind plus the jax source scope when present.
        kind = re.split(r"[.\d]", e.get("name", op))[0]
        scope = op.split("/")[-1][:48]
        r = agg[(kind, scope)]
        r[0] += float(a.get("device_duration_ps", 0) or 0)
        r[1] += float(a.get("model_flops", 0) or 0)
        r[2] += float(a.get("raw_bytes_accessed", 0) or 0)
        r[3] += 1
    print(f"{'ms/clip':>8} {'GFLOP/s':>8} {'GB/s':>6} {'n':>5}  key")
    tot = 0.0
    for (kind, scope), (dps, fl, by, n) in sorted(
            agg.items(), key=lambda kv: -kv[1][0]):
        sec = dps / 1e12
        tot += sec
        if sec / steps * 1e3 < 0.5:
            continue
        print(f"{sec/steps*1e3:8.2f} {fl/max(sec,1e-12)/1e9:8.1f} "
              f"{by/max(sec,1e-12)/1e9:6.0f} {n:5d}  {kind:28s} {scope}")
    print(f"total attributed: {tot/steps*1e3:.1f} ms/clip")


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vct_pre_profile"
    steps = capture(logdir)
    report(logdir, steps)
