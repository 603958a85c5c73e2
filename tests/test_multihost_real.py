"""REAL multi-process SPMD training through the shipped CLI.

test_multihost.py validates the per-host feeding logic with a faked process
topology; this test actually runs TWO OS processes, each owning 4 virtual CPU
devices of a global 8-device mesh, through `jax.distributed.initialize` (the
coordination service) with gloo CPU collectives — the exact invocation the
docs promise (parallel/multihost.py). It asserts the two processes compute
the SAME global loss (the gradient all-reduce really synchronized) and that
only process 0 writes checkpoints.

No reference counterpart (the reference is single-GPU, SURVEY.md §2.2).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    port = _free_port()
    opts = [
        "DEBUG", "True",  # 1 batch/epoch, no checkpoint writes: fast + hermetic
        "DATA.SYNTHETIC_NUM_VIDEOS", "8", "DATA.SYNTHETIC_SEQ_LEN", "6",
        "CHALEARN.NUM_CLASS", "2", "CHALEARN.CLIP_LEN", "2",
        "CHALEARN.BATCH_SIZE", "8",  # divisible by the 8 global devices
        "MODEL.DEPTH", "18", "MODEL.MAX_EPOCH", "1",
        "TPU.COMPUTE_DTYPE", "float32",
    ]
    cmd = [sys.executable, "-m", "video_classification_tpu", "train",
           "slowfast-Torso", "--root", str(tmp_path), "--opts", *opts]
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            VCT_PLATFORM="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"multi-host: process {pid}/2, 4 local of 8 devices" in out, out[-2000:]

    def loss_lines(out):
        return [l for l in out.splitlines() if "[train_epoch]" in l]

    l0, l1 = loss_lines(outs[0]), loss_lines(outs[1])
    assert l0 and l0 == l1, (l0, l1)  # all-reduced loss identical on every host
