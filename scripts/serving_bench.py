"""Serving throughput/latency bench: continuous batching on the int engine.

Spawns client threads firing single-image requests; reports images/s,
p50/p99 latency, batch-fill ratio.

  python scripts/serving_bench.py [model] [batch] [clients] [reqs] [mode] [rounds]

mode: strict | relaxed | relaxed8 -- one rung, one session (existence proof);
      interleave -- ALL THREE rungs alternate in short windows inside ONE
      serving session per round (VERDICT r4 weak #5: sequential per-rung
      sessions through a relay whose baseline swings ~11% between runs are
      not a ratio; interleaving cancels the drift per round, and the
      cross-rung ratios are medians of per-round ratios).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.serve import ServingEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)

RUNGS = ("strict", "relaxed", "relaxed8")


def build_engine(model, plan, ip, mode):
    return IntEngine(
        model, plan, ip,
        bf16_boundary=(mode == "relaxed"),
        int8_boundary=(mode == "relaxed8"),
    )


def burst(eng, img, batch, n_clients, reqs_per_client):
    """One serving window on `eng`: returns (img/s, p50_ms, p99_ms, fill)."""
    srv = ServingEngine(eng, batch_size=batch, max_wait_ms=8.0).start()
    lat = []
    lock = threading.Lock()

    def client():
        for _ in range(reqs_per_client):
            t0 = time.perf_counter()
            srv.infer(img)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    srv.stop()
    lat = np.array(sorted(lat))
    total = n_clients * reqs_per_client
    fill = srv.stats["images"] / max(srv.stats["batches"] * batch, 1)
    return (
        total / wall,
        lat[len(lat) // 2] * 1e3,
        lat[int(len(lat) * 0.99)] * 1e3,
        fill,
    )


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_clients = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reqs_per_client = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    mode = sys.argv[5] if len(sys.argv) > 5 else "strict"
    rounds = int(sys.argv[6]) if len(sys.argv) > 6 else 5
    assert mode in RUNGS + ("interleave",), mode

    model = get_model(model_name, CFG, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)

    img = np.asarray(
        jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (224, 224, 3)))
    ).astype(np.uint8)
    xwarm = jnp.asarray(np.repeat(img[None], batch, 0))

    if mode != "interleave":
        eng = build_engine(model, plan, ip, mode)
        eng(xwarm)  # warm the executable at the serving batch size
        ips, p50, p99, fill = burst(eng, img, batch, n_clients, reqs_per_client)
        print(
            f"{model_name} serving b{batch} clients={n_clients}: "
            f"{ips:9.1f} img/s  p50 {p50:6.1f} ms  "
            f"p99 {p99:6.1f} ms  batch-fill {fill*100:4.1f}%"
        )
        return

    engines = {r: build_engine(model, plan, ip, r) for r in RUNGS}
    for r in RUNGS:
        jax.block_until_ready(engines[r](xwarm))
    res = {r: [] for r in RUNGS}
    for rnd in range(rounds):
        for r in RUNGS:
            ips, p50, p99, fill = burst(
                engines[r], img, batch, n_clients, reqs_per_client
            )
            res[r].append((ips, p50, p99, fill))
            print(
                f"# round {rnd} {r:9s}: {ips:8.1f} img/s "
                f"p50 {p50:6.1f} p99 {p99:6.1f} fill {fill*100:4.1f}%",
                flush=True,
            )
    med = lambda v: sorted(v)[len(v) // 2]
    base = [x[0] for x in res["strict"]]
    print(f"\n{model_name} serving b{batch} clients={n_clients} "
          f"INTERLEAVED x{rounds} rounds:")
    for r in RUNGS:
        ipss = [x[0] for x in res[r]]
        ratios = sorted(i / b for i, b in zip(ipss, base))
        print(
            f"  {r:9s}: median {med(ipss):8.1f} img/s  "
            f"p50 {med([x[1] for x in res[r]]):6.1f} ms  "
            f"p99 {med([x[2] for x in res[r]]):6.1f} ms  "
            f"vs strict per-round {['%.3f' % x for x in ratios]}"
        )


if __name__ == "__main__":
    main()
