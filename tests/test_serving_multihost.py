"""Real 2-process cross-host continuous batching (CPU loopback).

Two OS processes rendezvous, each runs its own ingestion front-end, and
every inference round executes as one collective sharded computation over
the global mesh -- per-host request traffic stays host-local while results
route back to each host's own futures."""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_serving_worker.py")
NPROCS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_crosshost_serving():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(NPROCS)],
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
        assert p.returncode == 0, f"serving worker {pid} failed:\n{out[-4000:]}"
        assert f"serving worker {pid}: ok" in out
