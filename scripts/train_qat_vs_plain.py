"""QAT training cost vs the plain float baseline (VERDICT r2 item 5).

Measures, in ONE session with interleaved rounds (relay drift cancels):

  * plain  -- the same topology trained as an ordinary float CNN
              (cfg.floating_model + floating_wo_clip: single conv + BN,
              no quantization anywhere -- the thing a user trains without
              this framework);
  * qat    -- the full F8Net QAT step (double conv by contract
              [fix_quant_ops.py:334-356], STE weight quant, EMA metrics);
  * qat_gs -- QAT with format_grid_search (the more expensive fraclen
              search mode), decomposing the metric-mode overhead.

Reports ms/step, img/s, and the QAT/baseline ratio -- the headline
"QAT costs X% over baseline training".

  timeout 3600 python scripts/train_qat_vs_plain.py [batch]

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


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


CFGS = {
    "plain": QuantConfig(floating_model=True, floating_wo_clip=True),
    "qat": QuantConfig(format_from_metric=True, metric="std"),
    "qat_gs": QuantConfig(format_grid_search=True),
}


def main():
    print("devices:", jax.devices(), flush=True)
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name in ("resnet18", "mobilenet_v2"):
        runs = {}
        for label, cfg in CFGS.items():
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

            def run(step=step, params=params, state0=state, opt=opt, x=x, y=y):
                p = jax.tree_util.tree_map(jnp.copy, params)
                s = jax.tree_util.tree_map(jnp.copy, state0)
                o = jax.tree_util.tree_map(jnp.copy, opt)
                return step(p, s, o, x, y, 0.1)[3]["loss"]

            runs[label] = run
            jax.block_until_ready(run())  # compile now
            print(f"  {name}/{label}: compiled", flush=True)

        labels = list(runs)
        ts = {k: [] for k in labels}
        for _ in range(4):  # interleaved rounds
            for k in labels:
                ts[k].append(timeit(runs[k]))
        med = lambda v: sorted(v)[len(v) // 2]
        t_plain = med(ts["plain"])
        for k in labels:
            t = med(ts[k])
            ratios = sorted(
                tp / tk for tp, tk in zip(ts["plain"], ts[k])
            )
            r = ratios[len(ratios) // 2]
            print(
                f"{name} b{bs} {k:7s}: {t*1e3:8.2f} ms/step "
                f"({bs/t:8.1f} img/s)  vs plain x{r:.3f} "
                f"(overhead {100*(1/r-1):+.1f}%)",
                flush=True,
            )


if __name__ == "__main__":
    main()
