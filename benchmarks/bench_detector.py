"""Detector latency harness: ms/frame at the honest ChaLearn shape.

The DensePose detector is the dominant cost of the end-to-end chain
(VERDICT r2: ~105 ms/frame at 480x640 was ~1-2% MFU and was only recorded in
commit messages). This harness makes it a first-class, regression-tracked
number:

    python benchmarks/bench_detector.py            # latency only
    PROFILE=1 python benchmarks/bench_detector.py  # + device-trace op table
    DB=4 ... batch size | DEPTH=101 | HW=480x640 | DTYPE=bfloat16
    PRE_NMS=256 POST_NMS=64 ... proposal budgets (bench_detector_sweep.py
    records the depth x budget option table)

Prints one JSON line {"det_ms_per_frame": ..., "batch": ..., "hw": ...} last,
so callers (bench.py) can parse it with the same convention as the e2e child.

Config matches the online path's detector (pipeline/online.py
DensePoseOnlineDetector): depth-101 R-CNN, pre/post NMS 256/64, 8 detections,
chart head for the top detection only (chart_topk=1), bf16 on TPU.
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


def build(depth: int, hw, dtype: str, batch: int):
    from video_classification_tpu.detect.densepose import DensePoseRCNN
    from video_classification_tpu.detect.provider import PIXEL_MEAN

    model = DensePoseRCNN(depth=depth,
                          pre_nms_topk=int(os.environ.get("PRE_NMS", "256")),
                          post_nms_topk=int(os.environ.get("POST_NMS", "64")),
                          max_detections=8, chart_pooler_size=28, chart_topk=1,
                          dtype=jnp.dtype(dtype))
    h, w = hw
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (batch, h, w, 3)).astype(np.float32)
    frames -= np.asarray(PIXEL_MEAN)
    x = jnp.asarray(frames)
    variables = jax.jit(lambda im: model.init(
        jax.random.PRNGKey(0), im, train=False))(x[0])
    fn = jax.jit(lambda v, imgs: jax.vmap(
        lambda im: model.apply(v, im, train=False))(imgs))
    return model, variables, fn, x


def fence(out):
    # Host-value fetch: the only reliable completion fence on the axon tunnel.
    return float(jnp.sum(out["scores"]).astype(jnp.float32))


def measure(fn, variables, x, iters: int):
    out = fn(variables, x)  # compile + warmup
    fence(out)
    for _ in range(2):
        out = fn(variables, x)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, x)
    fence(out)
    dt = time.perf_counter() - t0
    return dt / iters / x.shape[0] * 1e3  # ms per frame


def profile(fn, variables, x, logdir: str):
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = fn(variables, x)
    fence(out)
    jax.profiler.stop_trace()
    report(logdir, steps=3, batch=x.shape[0])


GROUPS = [
    (r"backbone/(stem|res2)", "backbone res2+stem"),
    (r"backbone/res3", "backbone res3"),
    (r"backbone/res4", "backbone res4"),
    (r"backbone/res5", "backbone res5"),
    (r"backbone/fpn", "fpn"),
    (r"rpn/", "rpn head"),
    (r"box_head", "box head"),
    (r"decoder/", "decoder"),
    (r"densepose_head", "chart head (deeplab)"),
    (r"densepose_predictor", "chart predictor"),
    (r"while", "nms/loops"),
]


def report(logdir: str, steps: int, batch: int):
    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    # Per-op events live on the "XLA Ops" thread; the "XLA Modules" thread
    # carries one span per executed program that would double-count every op
    # underneath it (it showed up as an opaque multi-ms "jit__lambda" row).
    ops_tids = {(pid, tid) for (pid, tid), n in (
        ((e["pid"], e["tid"]), e["args"]["name"]) for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    ) if pid in dev and n == "XLA Ops"}
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_tids:
            continue
        a = e.get("args", {})
        op = a.get("tf_op", "") or e.get("name", "")
        key = "other"
        for pat, name in GROUPS:
            if re.search(pat, op):
                key = name
                break
        kind = ("conv" if ("conv_general" in op or "dot_general" in op)
                else "gather" if "gather" in op else "other")
        r = agg[(key, kind)]
        r[0] += float(a.get("device_duration_ps", 0) or 0)
        r[1] += float(a.get("model_flops", 0) or 0)
        r[2] += float(a.get("raw_bytes_accessed", 0) or 0)
    print(f"{'ms/frame':>9} {'TFLOP/s':>8} {'GB/s':>6}  key")
    tot = 0.0
    denom = steps * batch
    for (key, kind), (dps, fl, by) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        sec = dps / 1e12
        tot += sec
        if sec / denom * 1e3 < 0.05:
            continue
        print(f"{sec/denom*1e3:9.2f} {fl/max(sec,1e-12)/1e12:8.1f} "
              f"{by/max(sec,1e-12)/1e9:6.0f}  {key} {kind}")
    print(f"total attributed: {tot/denom*1e3:.1f} ms/frame")
    if os.environ.get("DETAIL"):
        # Top individual ops (raw XLA op name + tf_op) — for drilling into
        # the 'other' bucket.
        ops = collections.defaultdict(lambda: [0.0, 0.0])
        for e in tr["traceEvents"]:
            if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_tids:
                continue
            a = e.get("args", {})
            name = f"{e.get('name', '')[:48]} | {a.get('tf_op', '')[-70:]}"
            ops[name][0] += float(a.get("device_duration_ps", 0) or 0)
            ops[name][1] += float(a.get("raw_bytes_accessed", 0) or 0)
        print("\ntop ops:")
        for name, (dps, by) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:25]:
            sec = dps / 1e12
            print(f"{sec/denom*1e3:9.3f} {by/max(sec,1e-12)/1e9:6.0f}  {name}")


def main():
    depth = int(os.environ.get("DEPTH", "101"))
    batch = int(os.environ.get("DB", "4"))
    dtype = os.environ.get(
        "DTYPE", "bfloat16" if jax.default_backend() == "tpu" else "float32")
    hw = tuple(int(v) for v in os.environ.get("HW", "480x640").split("x"))
    model, variables, fn, x = build(depth, hw, dtype, batch)
    ms = measure(fn, variables, x, iters=int(os.environ.get("ITERS", "5")))
    if os.environ.get("PROFILE"):
        profile(fn, variables, x, os.environ.get("LOGDIR", "/tmp/vct_det_profile"))
    rec = {"det_ms_per_frame": round(ms, 2), "batch": batch,
           "hw": f"{hw[0]}x{hw[1]}", "dtype": dtype, "depth": depth}
    if os.environ.get("BOXES"):
        # Per-frame argmax-score box (the one detection the crop chain
        # consumes) — bench_detector_sweep.py compares these across proposal
        # budgets as a zero-egress stability proxy.
        out = fn(variables, x)
        best = jnp.argmax(out["scores"], axis=-1)
        boxes = jax.device_get(
            jnp.take_along_axis(out["boxes"],
                                best[:, None, None], axis=1))[:, 0]
        rec["boxes"] = [[round(float(v), 2) for v in b] for b in boxes]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
