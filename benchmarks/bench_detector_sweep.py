"""Detector config option table: depth x proposal-budget latency trade.

VERDICT r4 task #7: after the flow work, the detector (~20 x 4 ms/frame per
clip) is ~19% of the e2e budget; record what cheaper configs would buy and
what they risk, WITHOUT changing the default (the reference uses the R101
model for accuracy, chalearn_padded_to_iuv.py:25 — any speed alternative
stays opt-in).

For each (depth, pre/post-NMS budget) the sweep measures ms/frame at the
online-path shape (480x640, bf16, batch 4) and — since zero egress means no
trained weights, making true recall unmeasurable — a structural proxy for
output stability: the IoU of the argmax-score detection box against the
default config's (same random-init weights per depth, same frames). Low IoU
means the budget change alters WHICH proposal wins (the part crops all hang
off that one box, chalearn_iuv_to_crop.py:212-213), i.e. a real risk knob,
not a free speedup.

Usage: python benchmarks/bench_detector_sweep.py   (real TPU, ~15 min cold)
Writes benchmarks/DETECTOR_TABLE.json and prints a markdown table.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (depth, pre_nms, post_nms)  — first row per depth is that depth's ref.
    (101, 256, 64),   # DEFAULT (pipeline/online.py DensePoseOnlineDetector)
    (101, 128, 32),
    (101, 64, 16),
    (50, 256, 64),
    (50, 128, 32),
    (50, 64, 16),
]


def run_one(depth, pre, post):
    """bench_detector in a subprocess (wedged-tunnel isolation, like bench.py)
    with BOXES=1 so it also prints the argmax box for the proxy check."""
    env = dict(os.environ, DEPTH=str(depth), PRE_NMS=str(pre),
               POST_NMS=str(post), DB="4", HW="480x640", BOXES="1")
    p = subprocess.run([sys.executable, os.path.join(HERE, "bench_detector.py")],
                       env=env, capture_output=True, text=True, timeout=1500)
    for line in reversed(p.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from depth={depth} pre={pre}: "
                       f"{p.stdout[-500:]}\n{p.stderr[-500:]}")


def iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / ua if ua > 0 else 0.0


def main():
    rows = []
    ref_boxes = {}
    for depth, pre, post in CONFIGS:
        r = run_one(depth, pre, post)
        r.update(depth=depth, pre_nms=pre, post_nms=post)
        boxes = r.pop("boxes", None)
        if boxes is not None:
            if (depth, 256, 64) == (depth, pre, post):
                ref_boxes[depth] = boxes
            ref = ref_boxes.get(depth)
            if ref:
                r["top_box_iou_vs_default"] = round(
                    sum(iou(a, b) for a, b in zip(boxes, ref)) / len(boxes), 3)
        rows.append(r)
        print(r, flush=True)

    with open(os.path.join(HERE, "DETECTOR_TABLE.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("\n| depth | pre/post NMS | ms/frame | top-box IoU vs default |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['depth']} | {r['pre_nms']}/{r['post_nms']} | "
              f"{r.get('det_ms_per_frame')} | "
              f"{r.get('top_box_iou_vs_default', '—')} |")


if __name__ == "__main__":
    main()
