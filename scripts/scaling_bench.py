"""Data-parallel scaling measurement: images/s at 1, 2, 4, ... devices.

On a real multi-chip slice this reports the north-star scaling efficiency;
on the virtual CPU mesh it validates the machinery (absolute numbers are
meaningless there, relative sanity only).

  python scripts/scaling_bench.py [model] [per_device_batch] [train|infer]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.parallel import batch_sharding, make_mesh, param_shardings
from f8net_tpu.quant import bake_plan
from f8net_tpu.train import make_train_step, sgd_init
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    pdb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    phase = sys.argv[3] if len(sys.argv) > 3 else "infer"
    hw = int(os.environ.get("F8NET_BENCH_HW", "64"))

    ndev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    base_ips = None
    for nd in sizes:
        mesh = make_mesh(data=nd, model=1, devices=jax.devices()[:nd])
        batch = pdb * nd
        model = get_model(model_name, CFG, num_classes=100)
        params, state = model.init(jax.random.PRNGKey(0))
        images = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(1), (batch, hw, hw, 3)),
            batch_sharding(mesh),
        )
        if phase == "train":
            from jax.sharding import NamedSharding, PartitionSpec as P

            tcfg = TrainConfig(num_epochs=1, batch_size=batch, lr=0.05,
                               lr_scheduler="constant", topk=(1,))
            labels = jax.device_put(
                jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 100),
                batch_sharding(mesh),
            )
            repl = NamedSharding(mesh, P())
            p = jax.device_put(params, repl)
            s = jax.device_put(state, repl)
            o = jax.device_put(sgd_init(params), repl)
            step = make_train_step(model, CFG, tcfg)

            def run(pp, ss, oo, im, lb):
                return step(pp, ss, oo, im, lb, 0.05)[3]["loss"]

            t = timeit(lambda: run(p, s, o, images, labels), iters=3)
        else:
            plan, ip = bake_plan(model, params, state)
            eng = IntEngine(model, plan, ip)
            from jax.sharding import NamedSharding, PartitionSpec as P

            ipd = jax.device_put(eng.int_params, NamedSharding(mesh, P()))
            xi = jax.device_put(
                jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (batch, hw, hw, 3))).astype(jnp.int32),
                batch_sharding(mesh),
            )
            fwd = jax.jit(lambda p_, x_: __import__("f8net_tpu.engine.int_engine", fromlist=["int_forward"]).int_forward(model, plan, p_, x_, CFG))
            t = timeit(lambda: fwd(ipd, xi), iters=3)
        ips = batch / t
        if base_ips is None:
            base_ips = ips
        eff = ips / (base_ips * nd)
        print(
            f"{model_name} {phase} devices={nd:2d} batch={batch:4d}: "
            f"{ips:10.1f} img/s  scaling-eff {eff*100:5.1f}%"
        )


if __name__ == "__main__":
    main()
