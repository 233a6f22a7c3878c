"""Data-parallel scaling measurement: images/s at 1, 2, 4, ... devices,
plus an N-host (multi-process) variant and the BASELINE.md acceptance gate.

On a real multi-chip slice this reports the north-star scaling efficiency
(BASELINE.md:43: >= 85% at N >= 2); on the virtual CPU mesh / loopback
processes it validates the machinery only (all virtual devices share the
same cores, so the efficiency percentages are meaningless there and the
--check gate is informational unless the platform is TPU).

  # single-process sweep over 1..N local devices
  python scripts/scaling_bench.py [model] [per_device_batch] [train|infer]

  # N-host variant: spawns N processes with a loopback coordinator (on a
  # real pod, run one process per host with the same flags instead)
  python scripts/scaling_bench.py resnet18 16 train --hosts 2

  # acceptance gate (exits 1 if efficiency < 85% at any N >= 2 on TPU)
  python scripts/scaling_bench.py resnet18 16 train --check
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

EFF_BAR = 0.85  # BASELINE.md:43


def timeit(fn, *args, iters=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _build(model_name, phase, mesh, batch, hw):
    """Returns a zero-arg timed step over the given mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f8net_tpu.engine import IntEngine
    from f8net_tpu.models import get_model
    from f8net_tpu.parallel import batch_sharding
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.train import make_train_step, sgd_init
    from f8net_tpu.utils import QuantConfig
    from f8net_tpu.utils.config import TrainConfig

    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    model = get_model(model_name, cfg, num_classes=100)
    params, state = model.init(jax.random.PRNGKey(0))
    bsh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    nproc = jax.process_count()

    def put_batch(a):
        import numpy as np

        if nproc == 1:
            return jax.device_put(a, bsh)
        shard = a.shape[0] // nproc
        i = jax.process_index()
        return jax.make_array_from_process_local_data(
            bsh, np.asarray(a[i * shard : (i + 1) * shard])
        )

    def put_repl(tree):
        import numpy as np

        if nproc == 1:
            return jax.device_put(tree, repl)
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(repl, np.asarray(a)),
            tree,
        )

    images = put_batch(jax.random.uniform(jax.random.PRNGKey(1), (batch, hw, hw, 3)))
    if phase == "train":
        tcfg = TrainConfig(num_epochs=1, batch_size=batch, lr=0.05,
                           lr_scheduler="constant", topk=(1,))
        labels = put_batch(
            jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 100)
        )
        p = put_repl(params)
        s = put_repl(state)
        o = put_repl(sgd_init(params))
        step = make_train_step(model, cfg, tcfg)
        return lambda: step(p, s, o, images, labels, 0.05)[3]["loss"]

    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    from f8net_tpu.engine.int_engine import int_forward

    ipd = put_repl(eng.int_params)
    xi = put_batch(
        jnp.round(
            255 * jax.random.uniform(jax.random.PRNGKey(1), (batch, hw, hw, 3))
        ).astype(jnp.int32)
    )
    fwd = jax.jit(lambda p_, x_: int_forward(model, plan, p_, x_, cfg))
    return lambda: fwd(ipd, xi)


def _gate(rows, platform: str, check: bool) -> int:
    bad = [r for r in rows if r["devices"] >= 2 and r["eff"] < EFF_BAR]
    if not check:
        return 0
    if platform != "tpu":
        print(
            f"--check: platform '{platform}' is not a real slice; "
            f"gate informational (bar {EFF_BAR:.0%}, violations: {len(bad)})"
        )
        return 0
    if bad:
        print(f"--check FAILED: scaling efficiency below {EFF_BAR:.0%} at "
              + ", ".join(f"N={r['devices']} ({r['eff']:.1%})" for r in bad))
        return 1
    print(f"--check passed: all N >= 2 at or above {EFF_BAR:.0%}")
    return 0


def run_sweep(args) -> int:
    import jax

    from f8net_tpu.parallel import make_mesh

    ndev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    base_ips = None
    rows = []
    for nd in sizes:
        mesh = make_mesh(data=nd, model=1, devices=jax.devices()[:nd])
        batch = args.per_device_batch * nd
        fn = _build(args.model, args.phase, mesh, batch, args.hw)
        t = timeit(fn, iters=3)
        ips = batch / t
        if base_ips is None:
            base_ips = ips
        eff = ips / (base_ips * nd)
        rows.append({"devices": nd, "batch": batch, "ips": ips, "eff": eff})
        print(
            f"{args.model} {args.phase} devices={nd:2d} batch={batch:4d}: "
            f"{ips:10.1f} img/s  scaling-eff {eff*100:5.1f}%"
        )
    return _gate(rows, jax.default_backend(), args.check)


def run_hosts(args) -> int:
    """Spawn N loopback processes; each sees its local devices, the mesh is
    global.  On a real pod run one process per host instead (same flags,
    coordinator on host 0)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    outdir = tempfile.mkdtemp(prefix="scaling_")
    env_base = dict(os.environ)
    env_base.pop("PALLAS_AXON_POOL_IPS", None)
    procs = []
    for pid in range(args.hosts):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.devices_per_host}"
        )
        env["F8NET_SCALING_WORKER"] = json.dumps(
            {"port": port, "pid": pid, "nprocs": args.hosts, "outdir": outdir}
        )
        procs.append(
            subprocess.Popen([sys.executable, os.path.abspath(__file__)]
                             + _argv_passthrough(args), env=env)
        )
    rc = max(p.wait() for p in procs)
    report = os.path.join(outdir, "rank0.json")
    if rc == 0 and os.path.exists(report):
        with open(report) as f:
            print("N-host result:", f.read())
    return rc


def _argv_passthrough(args):
    return [
        args.model, str(args.per_device_batch), args.phase,
        "--hw", str(args.hw),
    ] + (["--check"] if args.check else [])


def run_worker(args, spec) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{spec['port']}",
        num_processes=spec["nprocs"],
        process_id=spec["pid"],
    )
    from f8net_tpu.parallel import make_mesh

    ndev = len(jax.devices())
    mesh = make_mesh(data=ndev, model=1)
    batch = args.per_device_batch * ndev
    fn = _build(args.model, args.phase, mesh, batch, args.hw)
    t = timeit(fn, iters=3)
    ips = batch / t
    if spec["pid"] == 0:
        row = {
            "hosts": spec["nprocs"], "devices": ndev, "batch": batch,
            "ips": round(ips, 1),
            "note": "loopback CPU: machinery validation, not efficiency",
        }
        with open(os.path.join(spec["outdir"], "rank0.json"), "w") as f:
            json.dump(row, f)
        print(f"{args.model} {args.phase} hosts={spec['nprocs']} "
              f"devices={ndev} batch={batch}: {ips:10.1f} img/s")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="resnet18")
    ap.add_argument("per_device_batch", nargs="?", type=int, default=16)
    ap.add_argument("phase", nargs="?", choices=["train", "infer"], default="infer")
    ap.add_argument("--hw", type=int, default=int(os.environ.get("F8NET_BENCH_HW", "64")))
    ap.add_argument("--hosts", type=int, default=0,
                    help="spawn N loopback processes (multi-host variant)")
    ap.add_argument("--devices-per-host", type=int, default=2)
    ap.add_argument("--check", action="store_true",
                    help=f"fail if efficiency < {EFF_BAR:.0%} at N >= 2 (TPU only)")
    args = ap.parse_args()

    spec = os.environ.get("F8NET_SCALING_WORKER")
    if spec:
        sys.exit(run_worker(args, json.loads(spec)))
    if args.hosts > 1:
        sys.exit(run_hosts(args))
    sys.exit(run_sweep(args))


if __name__ == "__main__":
    main()
