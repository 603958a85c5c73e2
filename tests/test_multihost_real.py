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


EVAL_OPTS = [
    "DATA.SYNTHETIC_NUM_VIDEOS", "8", "DATA.SYNTHETIC_SEQ_LEN", "6",
    "CHALEARN.NUM_CLASS", "2", "CHALEARN.CLIP_LEN", "2",
    "CHALEARN.BATCH_SIZE", "8",
    "MODEL.DEPTH", "18",
    "TPU.COMPUTE_DTYPE", "float32",
]


def _run_eval(env_extra, tmp_path):
    cmd = [sys.executable, "-m", "video_classification_tpu", "eval",
           "slowfast-Torso", "--root", str(tmp_path), "--opts", *EVAL_OPTS]
    env = dict(os.environ, VCT_PLATFORM="cpu", **env_extra)
    return subprocess.run(cmd, env=env, cwd=REPO, text=True, timeout=1500,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_two_process_sharded_eval_matches_single_process(tmp_path):
    """run_eval through the REAL two-OS-process gloo path == single-process.

    The sharded-decode eval (engine/trainer._run_eval_sharded: each process
    decodes only its ~N/P video share, scores are all-gathered on device and
    scattered back into global clip order) was previously only
    fake-topology-tested (test_multihost.py). Here both topologies run the
    shipped `eval` CLI from identical seeds (random-init params are
    deterministic in TPU.SEED, so every run holds the same weights) and the
    video accuracy over the synthetic eval set must agree exactly.
    """

    def acc_of(out):
        lines = [l for l in out.splitlines() if l.startswith("accuracy:")]
        assert lines, out[-3000:]
        return lines[-1]

    single = _run_eval(
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}, tmp_path)
    assert single.returncode == 0, single.stdout[-3000:]

    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }
        cmd = [sys.executable, "-m", "video_classification_tpu", "eval",
               "slowfast-Torso", "--root", str(tmp_path), "--opts", *EVAL_OPTS]
        procs.append(subprocess.Popen(
            cmd, env=dict(os.environ, VCT_PLATFORM="cpu", **env), cwd=REPO,
            text=True, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
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
        assert "sharded_decode" in out, out[-2000:]  # the sharded path ran

    want = acc_of(single.stdout)
    assert acc_of(outs[0]) == want and acc_of(outs[1]) == want, (
        want, acc_of(outs[0]), acc_of(outs[1]))
