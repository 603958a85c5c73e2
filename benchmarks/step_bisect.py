"""Bisect the flagship train-step cost on the current backend.

Times three jitted programs at the flagship SlowFast config (synthetic data,
no host I/O): forward-only, forward+backward(params), and the full train step
(the full step's state update would be dead-code-eliminated under an outer
jit that only returns the loss, so it is timed via the Trainer's own jit).

Env knobs: BB=batch (default 32), REMAT=1, REMAT_POLICY=conv, SMOKE=1 (tiny
CPU config). Measured ladder on v5e (2026-08-17, after the crop-matmul /
s2d-prepack / packed-fast-pathway work): batch 16 -> 95.7 clips/s,
32 -> 81, 48 -> compile OOM. See bench.py for the official metric.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VCT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VCT_PLATFORM"])

from video_classification_tpu.config import load_model_cfg
from video_classification_tpu.engine import Trainer
from video_classification_tpu.parallel import make_mesh


def main():
    b = int(os.environ.get("BB", "32"))
    cfg = load_model_cfg("slowfast-HTAH")
    cfg.CHALEARN.ROOT = "/tmp/bench_root"
    cfg.CHALEARN.BATCH_SIZE = b
    cfg.DATA.SYNTHETIC_NUM_VIDEOS = 8
    cfg.DATA.SYNTHETIC_SEQ_LEN = cfg.CHALEARN.CLIP_LEN + 4
    cfg.DEBUG = True
    if os.environ.get("REMAT"):
        cfg.TPU.REMAT = True
    cfg.TPU.REMAT_POLICY = os.environ.get("REMAT_POLICY", "")
    if os.environ.get("SMOKE"):
        cfg.CHALEARN.CLIP_LEN = 2
        cfg.MODEL.DEPTH = 18
        cfg.MODEL.R3D_INPUT = "CropLHand"
        cfg.TPU.COMPUTE_DTYPE = "float32"
    mesh = make_mesh(cfg)
    tr = Trainer(cfg, mesh=mesh)

    x = jnp.zeros((b, cfg.CHALEARN.CLIP_LEN, tr.mm.crop_size, tr.mm.crop_size, 21),
                  jnp.uint8)
    label = jnp.zeros((b,), jnp.int32)
    w = jnp.ones((b,), jnp.float32)
    rng = jax.random.PRNGKey(0)
    state = tr.state
    model = tr.model

    def timeit(name, f, *args, n=None):
        n = n or (3 if os.environ.get("SMOKE") else 20)
        o = f(*args)
        jax.block_until_ready(o)
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:8.2f} ms  ({b/dt:.1f} clips/s)", flush=True)

    def fwd(params, bstats, xu, r):
        data = tr.mm.normalize_and_prepare(xu, augment_rng=r)
        out, _ = model.apply({"params": params, "batch_stats": bstats}, data,
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out.astype(jnp.float32))

    timeit("fwd only       ", jax.jit(fwd), state.params, state.batch_stats, x, rng)
    timeit("fwd+bwd(params)", jax.jit(jax.grad(fwd, argnums=0)),
           state.params, state.batch_stats, x, rng)

    # Full step via the Trainer's own jit — donation intact, nothing DCE'd
    # (an outer jit returning only the loss would dead-code the state update),
    # so the state must be threaded through the timing loop.
    n = 3 if os.environ.get("SMOKE") else 20
    state, m = tr._train_step(state, x, label, w, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = tr._train_step(state, x, label, w, jax.random.fold_in(rng, i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"full train step: {dt*1e3:8.2f} ms  ({b/dt:.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
