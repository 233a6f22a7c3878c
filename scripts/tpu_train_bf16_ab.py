"""On-chip A/B: QAT train-step throughput with train_conv_bf16 off vs on.

Interleaved rounds (the relay drifts within a session; the ratio of
per-round medians is the stable quantity, see bench.py/_time_pair).
Run with nothing else on the host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from f8net_tpu.models import get_model
from f8net_tpu.train import make_train_step, sgd_init
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig


def timeit(fn, iters=4, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    bs = 256
    for name in ("resnet18", "mobilenet_v2"):
        runs = {}
        for flag in (False, True):
            cfg = QuantConfig(
                format_from_metric=True, metric="std", train_conv_bf16=flag
            )
            model = get_model(name, cfg, num_classes=1000)
            tcfg = TrainConfig(
                num_epochs=1, batch_size=bs, lr=0.1,
                lr_scheduler="constant", topk=(1,),
            )
            params, state = model.init(jax.random.PRNGKey(0))
            opt = sgd_init(params)
            x = jax.random.uniform(jax.random.PRNGKey(1), (bs, 224, 224, 3))
            y = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 1000)
            step = make_train_step(model, cfg, tcfg)
            state0 = jax.tree_util.tree_map(jnp.copy, state)

            def run(step=step, params=params, state0=state0, opt=opt, x=x, y=y):
                p = jax.tree_util.tree_map(jnp.copy, params)
                s = jax.tree_util.tree_map(jnp.copy, state0)
                o = jax.tree_util.tree_map(jnp.copy, opt)
                return step(p, s, o, x, y, 0.1)[3]["loss"]

            runs[flag] = run
            jax.block_until_ready(run())  # compile now

        ts = {False: [], True: []}
        for _ in range(4):  # interleaved rounds
            for flag in (False, True):
                ts[flag].append(timeit(runs[flag], iters=3, warmup=1))
        med = lambda v: sorted(v)[len(v) // 2]
        ratios = sorted(a / b for a, b in zip(ts[False], ts[True]))
        t32, tb = med(ts[False]), med(ts[True])
        print(
            f"{name} b{bs} QAT: f32 {t32*1e3:7.2f} ms ({bs/t32:8.1f} img/s)  "
            f"bf16 {tb*1e3:7.2f} ms ({bs/tb:8.1f} img/s)  "
            f"speedup x{ratios[len(ratios)//2]:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
