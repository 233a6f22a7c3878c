"""Final round-1 TPU measurements: QAT train step, serving, MBv2 big batch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.baseline import plain_forward, plain_params
from f8net_tpu.train import make_train_step, sgd_init
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig

QAT = QuantConfig(format_from_metric=True, metric="std")
INT = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def timeit(fn, *a, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)

    # 1) QAT train-step throughput (the 150-epoch-scale training path)
    for name, bs in [("resnet18", 256), ("mobilenet_v2", 256)]:
        model = get_model(name, QAT, num_classes=1000)
        tcfg = TrainConfig(num_epochs=1, batch_size=bs, lr=0.1,
                           lr_scheduler="constant", topk=(1,))
        params, state = model.init(jax.random.PRNGKey(0))
        opt = sgd_init(params)
        x = jax.random.uniform(jax.random.PRNGKey(1), (bs, 224, 224, 3))
        y = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 1000)
        step = make_train_step(model, QAT, tcfg)

        state0 = jax.tree_util.tree_map(jnp.copy, state)

        def run():
            p = jax.tree_util.tree_map(jnp.copy, params)
            s = jax.tree_util.tree_map(jnp.copy, state0)
            o = jax.tree_util.tree_map(jnp.copy, opt)
            return step(p, s, o, x, y, 0.1)[3]["loss"]

        t = timeit(run, iters=4)
        print(f"{name} b{bs} QAT train step: {t*1e3:8.2f} ms  {bs/t:9.1f} img/s", flush=True)

    # 2) MBv2 int8 XLA engine at batch 512
    model = get_model("mobilenet_v2", INT, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    fp = plain_params(model, ip)
    for bs in (512,):
        x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (bs, 224, 224, 3))).astype(jnp.int32)
        t = timeit(eng, x, iters=5)
        print(f"mobilenet_v2 b{bs} int8 engine : {t*1e3:8.2f} ms  {bs/t:9.1f} img/s", flush=True)
        xb = (x.astype(jnp.float32) / 256).astype(jnp.bfloat16)
        bf = jax.jit(lambda p, v: plain_forward(model, p, v))
        t = timeit(bf, fp, xb, iters=5)
        print(f"mobilenet_v2 b{bs} bf16 base   : {t*1e3:8.2f} ms  {bs/t:9.1f} img/s", flush=True)

    # 3) serving: continuous batching on the compiled resnet18 engine
    model = get_model("resnet18", INT, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    import threading

    from f8net_tpu.engine.serve import ServingEngine

    img = np.asarray(jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (224, 224, 3)))).astype(np.uint8)
    eng(jnp.asarray(np.repeat(img[None], 64, 0)))  # compile at serving batch
    srv = ServingEngine(eng, batch_size=64, max_wait_ms=8.0).start()
    lat, lock = [], threading.Lock()

    def client(nreq=25):
        for _ in range(nreq):
            t0 = time.perf_counter()
            srv.infer(img)
            with lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    th = [threading.Thread(target=client) for _ in range(16)]
    [t.start() for t in th]
    [t.join() for t in th]
    wall = time.perf_counter() - t0
    srv.stop()
    lat = np.array(sorted(lat))
    fill = srv.stats["images"] / max(srv.stats["batches"] * 64, 1)
    print(
        f"resnet18 serving b64 16 clients: {len(lat)/wall:9.1f} img/s  "
        f"p50 {lat[len(lat)//2]*1e3:6.1f} ms  p99 {lat[int(len(lat)*0.99)]*1e3:6.1f} ms  "
        f"fill {fill*100:4.1f}%", flush=True,
    )


if __name__ == "__main__":
    main()
