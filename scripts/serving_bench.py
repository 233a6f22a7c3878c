"""Serving throughput/latency bench: continuous batching on the int engine.

Spawns client threads firing single-image requests; reports images/s,
p50/p99 latency, batch-fill ratio.  python scripts/serving_bench.py [model]
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


def main():
    # argv: [model] [batch] [n_clients] [reqs_per_client] [strict|relaxed|relaxed8]
    model_name = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_clients = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reqs_per_client = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    mode = sys.argv[5] if len(sys.argv) > 5 else "strict"
    assert mode in ("strict", "relaxed", "relaxed8"), mode

    model = get_model(model_name, CFG, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(
        model, plan, ip,
        bf16_boundary=(mode == "relaxed"),
        int8_boundary=(mode == "relaxed8"),
    )

    img = np.asarray(
        jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (224, 224, 3)))
    ).astype(np.uint8)
    # warm the executable at the serving batch size
    eng(jnp.asarray(np.repeat(img[None], batch, 0)))

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
    print(
        f"{model_name} serving b{batch} clients={n_clients}: "
        f"{total / wall:9.1f} img/s  p50 {lat[len(lat)//2]*1e3:6.1f} ms  "
        f"p99 {lat[int(len(lat)*0.99)]*1e3:6.1f} ms  batch-fill {fill*100:4.1f}%"
    )


if __name__ == "__main__":
    main()
