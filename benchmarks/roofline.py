"""Analytic roofline for the flagship train step (VERDICT r3 task #6 / r4 #2).

Lowers the REAL jitted train step (the Trainer's own program, fwd+bwd+update)
and statically analyzes every convolution / dot_general in the StableHLO:
FLOPs, bf16 bytes moved, arithmetic intensity, and an achievable-throughput
bound per op:

    achievable = min(PEAK * mxu_util,  AI * HBM_BW)

where mxu_util models the systolic-array tiling loss of the implicit GEMM
(M = batch*spatial padded to 8 sublanes, K = Cin*kernel and N = Cout padded
to 128 lanes) and AI * HBM_BW is the memory roofline. The model-level
ceiling is the FLOP-weighted harmonic mean over ops — what a perfect
scheduler could reach if every op ran at its own bound and everything else
(BN, transposes, fusions, the optimizer) were free. Comparing bench.py's
measured model_tflops_per_sec against this ceiling says how much of the gap
to "197 TFLOP/s peak" is the MODEL'S SHAPE (small channels, 112px crops,
depthwise-ish time convs) vs real scheduling headroom.

Runs entirely on CPU (lowering only, no TPU needed):
    BB=16 python benchmarks/roofline.py
Writes benchmarks/ROOFLINE.json; prose conclusions live in
benchmarks/ROOFLINE.md.
"""
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VCT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VCT_PLATFORM"])

PEAK_TFLOPS = 197e12  # v5e bf16 (bench.py:11)
HBM_BW = 819e9        # v5e HBM GB/s


def ru(x, m):
    return -(-x // m) * m


def lower_train_step():
    from video_classification_tpu.config import load_model_cfg
    from video_classification_tpu.engine import Trainer
    from video_classification_tpu.parallel import make_mesh

    b = int(os.environ.get("BB", "16"))
    cfg = load_model_cfg("slowfast-HTAH")
    cfg.CHALEARN.ROOT = "/tmp/bench_root"
    cfg.CHALEARN.BATCH_SIZE = b
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 8
    cfg.DATA.SYNTHETIC_SEQ_LEN = cfg.CHALEARN.CLIP_LEN + 4
    cfg.DEBUG = True
    tr = Trainer(cfg, mesh=make_mesh(cfg))
    x = jnp.zeros((b, int(cfg.CHALEARN.CLIP_LEN), tr.mm.crop_size,
                   tr.mm.crop_size, 21), jnp.uint8)
    y = jnp.zeros((b,), jnp.int32)
    w = jnp.ones((b,), jnp.float32)
    lowered = tr._train_step.lower(
        tr.state, x, y, w, jax.random.PRNGKey(0))
    return lowered.as_text(), b


SHAPE = re.compile(r"tensor<([0-9x]+)x(bf16|f32|f16)>")


def shapes_of(line):
    return [([int(d) for d in m.group(1).split("x")], m.group(2))
            for m in SHAPE.finditer(line)]


def dtype_bytes(dt):
    return {"bf16": 2, "f16": 2, "f32": 4}[dt]


def analyze(text):
    ops = []
    for line in text.splitlines():
        if "stablehlo.convolution" in line:
            ss = shapes_of(line)
            if len(ss) < 3:
                continue
            (lhs, ldt), (rhs, rdt), (out, odt) = ss[0], ss[1], ss[-1]
            # rhs is the kernel: [spatial..., Cin, Cout] (XLA default here).
            # Contraction size K = prod(kernel spatial) * Cin; N' = Cout.
            cout = rhs[-1]
            k = 1
            for d in rhs[:-1]:
                k *= d
            m = 1
            for d in out:
                m *= d
            if not (cout and k and m):
                continue
            m //= cout
            flops = 2.0 * m * k * cout
            byt = (prod_bytes(lhs, ldt) + prod_bytes(rhs, rdt)
                   + prod_bytes(out, odt))
            util = (min(1.0, k / ru(k, 128))
                    * min(1.0, cout / ru(cout, 128))
                    * min(1.0, m / ru(m, 8)))
            ops.append(dict(kind="conv", lhs=lhs, rhs=rhs, out=out,
                            flops=flops, bytes=byt, util=util))
        elif "stablehlo.dot_general" in line:
            ss = shapes_of(line)
            if len(ss) < 3:
                continue
            (lhs, ldt), (rhs, rdt), (out, odt) = ss[0], ss[1], ss[-1]
            cd = re.search(r"contracting_dims = \[([0-9, ]*)\] x", line)
            bd = re.search(r"batching_dims = \[([0-9, ]*)\] x", line)
            k = 1
            if cd and cd.group(1).strip():
                for i in cd.group(1).replace(" ", "").split(","):
                    k *= lhs[int(i)]
            kb = 1
            if bd and bd.group(1).strip():
                for i in bd.group(1).replace(" ", "").split(","):
                    kb *= lhs[int(i)]
            pl_, pr = 1, 1
            for d in lhs:
                pl_ *= d
            for d in rhs:
                pr *= d
            m = pl_ // max(kb * k, 1)
            n = pr // max(kb * k, 1)
            flops = 2.0 * kb * m * k * n
            if not (m and k and n):
                continue
            byt = (prod_bytes(lhs, ldt) + prod_bytes(rhs, rdt)
                   + prod_bytes(out, odt))
            util = (min(1.0, k / ru(k, 128)) * min(1.0, n / ru(n, 128))
                    * min(1.0, m / ru(m, 8)))
            ops.append(dict(kind="dot", lhs=lhs, rhs=rhs, out=out,
                            flops=flops, bytes=byt, util=util))
    return ops


def prod_bytes(shape, dt):
    n = dtype_bytes(dt)
    for d in shape:
        n *= d
    return n


def main():
    text, b = lower_train_step()
    ops = analyze(text)
    total_flops = sum(o["flops"] for o in ops)
    # FLOP-weighted harmonic mean of per-op achievable throughput.
    t_ideal = 0.0
    for o in ops:
        ai = o["flops"] / max(o["bytes"], 1)
        o["achievable_tflops"] = min(PEAK_TFLOPS * o["util"],
                                     ai * HBM_BW) / 1e12
        t_ideal += o["flops"] / (o["achievable_tflops"] * 1e12)
    ceiling = total_flops / t_ideal / 1e12 if t_ideal else 0.0

    agg = {}
    for o in ops:
        key = (o["kind"], tuple(o["rhs"]))
        a = agg.setdefault(key, dict(kind=o["kind"], rhs=o["rhs"], n=0,
                                     flops=0.0, bytes=0.0,
                                     achievable_tflops=o["achievable_tflops"],
                                     util=o["util"]))
        a["n"] += 1
        a["flops"] += o["flops"]
        a["bytes"] += o["bytes"]
    rows = sorted(agg.values(), key=lambda a: -a["flops"])
    print(f"batch {b}: {len(ops)} matmul-class ops, "
          f"{total_flops/1e12:.2f} TFLOP total")
    print(f"{'kind':5} {'n':>3} {'TFLOP':>7} {'GB':>7} {'util':>5} "
          f"{'achv TF/s':>9}  kernel")
    for a in rows[:25]:
        print(f"{a['kind']:5} {a['n']:3d} {a['flops']/1e12:7.3f} "
              f"{a['bytes']/1e9:7.2f} {a['util']:5.2f} "
              f"{a['achievable_tflops']:9.1f}  {a['rhs']}")
    out = dict(batch=b, total_tflop=total_flops / 1e12,
               ceiling_tflops=round(ceiling, 1),
               peak_tflops=PEAK_TFLOPS / 1e12,
               rows=[{k: v for k, v in a.items()} for a in rows])
    path = os.path.join(os.path.dirname(__file__), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nmatmul-class ceiling (everything else free): "
          f"{ceiling:.1f} TFLOP/s of {PEAK_TFLOPS/1e12:.0f} peak")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
