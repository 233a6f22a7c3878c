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


def timeit_chain(advance, n_short=2, n_long=10):
    """Per-step time from the DELTA of two chain lengths.  `advance(n)`
    runs n train steps chained through their own updated (params, state,
    opt), never resetting the carry -- so every step ever issued in the
    session has unique inputs.  Two relay pathologies this defeats (both
    hit earlier versions of this script, see docs/BENCHMARKS.md):

      * replay: identical (executable, inputs) calls are served from the
        relay's cache -- repeated same-input steps measured 0.9 ms/step,
        and chains restarting from the same initial params would replay
        wholesale from round 1 on.
      * early-ready: block_until_ready on one output buffer (the loss)
        returns before the rest of the step drains.  The chain's data
        dependence serializes real execution regardless of readiness
        claims, and differencing two lengths cancels the final fetch.
    """
    advance(1)  # warm / absorb any pending state
    t0 = time.perf_counter()
    advance(n_short)
    t1 = time.perf_counter()
    advance(n_long)
    t2 = time.perf_counter()
    if os.environ.get("F8NET_CHAIN_DEBUG"):
        print(
            f"    raw: adv{n_short}={1e3*(t1-t0):.1f}ms "
            f"adv{n_long}={1e3*(t2-t1):.1f}ms",
            flush=True,
        )
    return ((t2 - t1) - (t1 - t0)) / (n_long - n_short)


CFGS = {
    "plain": QuantConfig(floating_model=True, floating_wo_clip=True),
    "qat": QuantConfig(format_from_metric=True, metric="std"),
    "qat_gs": QuantConfig(format_grid_search=True),
}


def main():
    print("devices:", jax.devices(), flush=True)
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    model_list = tuple(
        m for m in ("resnet18", "mobilenet_v2")
        if m in os.environ.get("F8NET_MODELS", "resnet18,mobilenet_v2")
    )
    for name in model_list:
        runs = {}
        carries = {}
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
            carry = {"c": (params, state, opt), "loss": None}

            def advance(n, step=step, carry=carry, xx=x, yy=y):
                c = carry["c"]
                for _ in range(n):
                    p, s, o, m = step(*c, xx, yy, 1e-4)
                    c = (p, s, o)
                carry["c"] = c
                # FETCH the loss: proves the chain really executed (the
                # relay has been caught claiming readiness early); an
                # evolving loss sequence is the execution receipt
                carry["loss"] = float(m["loss"])

            runs[label] = advance
            carries[label] = carry
            advance(1)  # compile now
            print(
                f"  {name}/{label}: compiled (loss {carry['loss']:.4f})",
                flush=True,
            )

        labels = list(runs)
        ts = {k: [] for k in labels}
        for r in range(6):  # interleaved rounds
            for k in labels:
                ts[k].append(timeit_chain(runs[k]))
            print(
                f"  round {r}: "
                + "  ".join(f"{k}={ts[k][-1]*1e3:.1f}ms" for k in labels)
                + "  losses: "
                + " ".join(f"{carries[k]['loss']:.4f}" for k in labels),
                flush=True,
            )
        med = lambda v: sorted(v)[len(v) // 2]
        for k in labels:
            t = med(ts[k])
            ratios = sorted(
                tk / tp for tp, tk in zip(ts["plain"], ts[k])
            )
            r = ratios[len(ratios) // 2]
            print(
                f"{name} b{bs} {k:7s}: {t*1e3:8.2f} ms/step "
                f"({bs/t:8.1f} img/s)  cost vs plain x{r:.3f} "
                f"(overhead {100*(r-1):+.1f}%)",
                flush=True,
            )


if __name__ == "__main__":
    main()
