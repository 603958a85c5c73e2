"""Capture a device profile of the flagship train step and print the top ops.

Usage: python benchmarks/profile_step.py [logdir]  (BB=batch env knob).
Parses the trace.json.gz device lane directly — works through the axon
tunnel; event args carry tf_op / model_flops / raw_bytes_accessed, which is
how the crop while-loop (86 ms), the s2d repack transposes (~20 ms) and the
lane-padded fast pathway (~42 ms) were found.
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

from video_classification_tpu.config import load_model_cfg
from video_classification_tpu.engine import Trainer
from video_classification_tpu.parallel import make_mesh


def capture(logdir: str, b: int):
    cfg = load_model_cfg("slowfast-HTAH")
    cfg.CHALEARN.ROOT = "/tmp/bench_root"
    cfg.CHALEARN.BATCH_SIZE = b
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 8
    cfg.DATA.SYNTHETIC_SEQ_LEN = cfg.CHALEARN.CLIP_LEN + 4
    cfg.DEBUG = True
    tr = Trainer(cfg, mesh=make_mesh(cfg))
    x = jnp.zeros((b, cfg.CHALEARN.CLIP_LEN, tr.mm.crop_size, tr.mm.crop_size, 21),
                  jnp.uint8)
    label = jnp.zeros((b,), jnp.int32)
    w = jnp.ones((b,), jnp.float32)
    state, rng = tr.state, jax.random.PRNGKey(0)
    for i in range(3):
        state, m = tr._train_step(state, x, label, w, jax.random.fold_in(rng, i))
    float(m["loss"])
    jax.profiler.start_trace(logdir)
    for i in range(3):
        state, m = tr._train_step(state, x, label, w, jax.random.fold_in(rng, 9 + i))
    float(m["loss"])
    jax.profiler.stop_trace()


def report(logdir: str, steps: int = 3):
    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        a = e.get("args", {})
        op = a.get("tf_op", "")
        if not op:
            continue
        m = re.search(r"(blocks_\d+)(_pathway_\d+|_fuse)?", op)
        blk = (m.group(1) + (m.group(2) or "")) if m else "non-model"
        drc = "bwd" if "transpose(jvp" in op else "fwd"
        kind = "conv" if ("conv_general" in op or "dot_general" in op) else "other"
        r = agg[(blk, drc, kind)]
        r[0] += float(a.get("device_duration_ps", 0) or 0)
        r[1] += float(a.get("model_flops", 0) or 0)
        r[2] += float(a.get("raw_bytes_accessed", 0) or 0)
    print(f"{'ms/step':>8} {'TFLOP/s':>8} {'GB/s':>6}  key")
    tot = 0.0
    for (blk, drc, kind), (dps, fl, by) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        sec = dps / 1e12
        tot += sec
        if sec / steps * 1e3 < 1.0:
            continue
        print(f"{sec/steps*1e3:8.2f} {fl/sec/1e12:8.1f} {by/sec/1e9:6.0f}  "
              f"{blk:22s} {drc} {kind}")
    print(f"total attributed: {tot/steps*1e3:.1f} ms/step")


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vct_profile"
    capture(logdir, int(os.environ.get("BB", "16")))
    report(logdir)
