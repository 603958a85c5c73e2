"""Preprocessing-chain profiler: where pre_sec_per_clip actually goes.

The honest e2e chain (bench.py) is dominated by on-device preprocessing
(~1.5 s/clip at round 2's end: optical flow over every raw frame + the
canvas/part-crop graph). This harness profiles `preprocess_clip_on_device`
on the real chip with the same device-trace methodology as
benchmarks/bench_detector.py and prints a grouped op table.

    python benchmarks/profile_preprocess.py            # time + op table
    FRAMES=40 ... raw window length | HW=240x320 | FLOW=0 (skip flow leg)

Groups flow solver (warp gather / SOR / pyramid / IRLS prep), canvas build,
connected components, and the part crop/resize separately so each round can
see which leg regressed or improved.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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

GROUPS = [
    (r"sor_solve|pallas", "flow: pallas SOR"),
    (r"_warp_bilinear|take_along_axis", "flow: warp gather"),
    (r"resize|gaussian|blur", "flow: pyramid+resizes"),
    (r"coarse2fine|_flow_level|flow", "flow: IRLS prep"),
    (r"largest_component|components", "part: connected components"),
    (r"pad_to_square|cubic", "part: crop resize"),
    (r"_resize_chart|_build_body|dynamic_slice|dynamic.update", "canvas build"),
]


def report(logdir: str, denom: float):
    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    # Only the "XLA Ops" thread: the "XLA Modules" thread carries one span per
    # program and would double-count everything under it.
    ops_tids = {(pid, tid) for (pid, tid), n in (
        ((e["pid"], e["tid"]), e["args"]["name"]) for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    ) if pid in dev and n == "XLA Ops"}
    agg = collections.defaultdict(lambda: [0.0, 0.0])
    ops = collections.defaultdict(lambda: [0.0, 0.0])
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_tids:
            continue
        a = e.get("args", {})
        op = a.get("tf_op", "") or e.get("name", "")
        key = "other"
        for pat, name in GROUPS:
            if re.search(pat, op, re.I):
                key = name
                break
        dps = float(a.get("device_duration_ps", 0) or 0)
        by = float(a.get("raw_bytes_accessed", 0) or 0)
        agg[key][0] += dps
        agg[key][1] += by
        name = f"{e.get('name', '')[:44]} | {a.get('tf_op', '')[-72:]}"
        ops[name][0] += dps
        ops[name][1] += by
    print(f"{'ms/clip':>9} {'GB/s':>6}  group")
    tot = 0.0
    for key, (dps, by) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        sec = dps / 1e12
        tot += sec
        print(f"{sec/denom*1e3:9.1f} {by/max(sec,1e-12)/1e9:6.0f}  {key}")
    print(f"total attributed: {tot/denom*1e3:.0f} ms/clip")
    print("\ntop ops:")
    for name, (dps, by) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:30]:
        sec = dps / 1e12
        print(f"{sec/denom*1e3:9.2f} {by/max(sec,1e-12)/1e9:6.0f}  {name}")


def main():
    from video_classification_tpu.config.crop_cfg import crop_part_args
    from video_classification_tpu.ops.flow import FlowParams
    from video_classification_tpu.pipeline.device_pipeline import (
        Detections, preprocess_clip_on_device)

    t_raw = int(os.environ.get("FRAMES", "100"))
    h, w = (int(v) for v in os.environ.get("HW", "240x320").split("x"))
    interval = 5
    s = -(-t_raw // interval)
    hm = 112
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (t_raw, h, w, 3)), jnp.uint8)
    depth = jnp.asarray(rng.randint(0, 256, (t_raw, h, w, 1)), jnp.uint8)
    boxes = np.tile(np.asarray([[w * 0.55, h * 0.55, w * 1.45, h * 1.45]],
                               np.float32), (s, 1))
    charts = rng.randint(0, 25, (s, hm, hm)).astype(np.int32)
    dets = Detections(
        boxes_xyxy=jnp.asarray(boxes),
        valid=jnp.ones((s,), bool),
        charts=jnp.asarray(charts),
        uv=jnp.asarray(rng.rand(s, 2, hm, hm).astype(np.float32)),
    )
    flow_params = FlowParams()
    fn = jax.jit(lambda fr, de, dt: preprocess_clip_on_device(
        fr, de, dt, interval=interval, parts=tuple(crop_part_args),
        flow_params=flow_params))

    key0 = crop_part_args[0][1]
    out = fn(frames, depth, dets)
    float(jnp.sum(out[key0].astype(jnp.float32)))  # compile+warm
    t0 = time.perf_counter()
    reps = int(os.environ.get("ITERS", "2"))
    for _ in range(reps):
        out = fn(frames, depth, dets)
    float(jnp.sum(out[key0].astype(jnp.float32)))
    sec = (time.perf_counter() - t0) / reps
    print(json.dumps({"pre_sec_per_clip": round(sec, 3),
                      "frames": t_raw, "hw": f"{h}x{w}"}))

    logdir = os.environ.get("LOGDIR", "/tmp/vct_pre_profile")
    jax.profiler.start_trace(logdir)
    out = fn(frames, depth, dets)
    float(jnp.sum(out[key0].astype(jnp.float32)))
    jax.profiler.stop_trace()
    report(logdir, denom=1.0)


if __name__ == "__main__":
    main()
