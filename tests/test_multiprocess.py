"""Real multi-process distributed runtime test (2 processes, CPU loopback).

The single-process virtual-mesh tests (test_parallel.py) validate sharding
math but never an actual `jax.distributed.initialize` handshake.  This test
spawns two OS processes that rendezvous through a loopback coordinator, run a
data-parallel train step whose gradient all-reduce spans the processes, and
cross-check against a single-device reference -- the analog of the reference
framework running under real torch.distributed.launch
(distributed_run.sh:12, myutils/distributed.py:16-26).
"""

import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_dist_worker.py")
NPROCS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon relay out of workers
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(NPROCS), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=ROOT,
        )
        for pid in range(NPROCS)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:  # exact-PID cleanup only
            if p.poll() is None:
                p.kill()
                p.wait()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    for pid in range(NPROCS):
        with open(tmp_path / f"worker{pid}.json") as f:
            res = json.load(f)
        assert res["world"] == NPROCS
        assert res["devices"] == 2 * NPROCS  # 2 virtual devices per process
        assert res["cos"] > 0.999


def test_two_process_tp_engine():
    """The explicit-collective TP engine with the model axis spanning two OS
    processes: every block psum crosses the process boundary and the logits
    stay bitwise-equal to single-device (tests/_tp_worker.py)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    worker = os.path.join(ROOT, "tests", "_tp_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(NPROCS)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=ROOT,
        )
        for pid in range(NPROCS)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:  # exact-PID cleanup only
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"tp worker {pid} failed:\n{out[-4000:]}"
        assert f"tp worker {pid}: ok" in out
