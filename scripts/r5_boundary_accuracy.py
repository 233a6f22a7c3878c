#!/usr/bin/env python
"""Industrial accuracy receipts for the relaxed boundary rungs (round 5).

Scales the round-4 receipt (scripts/r4_bf16b_accuracy.py) to the acceptance
class the r4 verdict demanded before the relaxed rungs may carry the bench
headline:

  Part A -- task receipt, per family x >=3 seeds: a model is trained with
  the real QAT train step on a 64-class prototype task until the float
  referent's held-out top-1 is >= 0.90 (retrained at lower lr / more steps
  otherwise; families that cannot reach 0.90 are reported as such, not
  silently accepted).  10,240 held-out samples are evaluated through the
  QAT float referent, the bit-exact strict engine, the bf16-boundary rung
  and the int8-boundary rung.

  WRITTEN ACCEPT GATE (per family x seed):
      agree(rung, strict) >= agree(strict, referent)
  for BOTH rungs -- i.e. the boundary relaxation must disagree with the
  bit-exact contract engine no more often than the contract engine already
  disagrees with the float referent (the inter-mode gap the reference
  itself ships between its own four eval paths, README.md:76).  The JSON
  artifact carries a per-row `gate_pass` and a global `all_pass`.

  Part B -- numerics receipt at REAL 224x224 shapes: per family, a
  random-init model's EMA fraclens + BN stats are populated by train-mode
  forwards (same recipe as tests/_refdiff_driver.py), then strict /
  bf16-boundary / int8-boundary logits are compared on 128 images at 224px:
  argmax agreement and the distribution (median / p99 / max) of
  |rung - strict| / max|strict| per image.  This covers the shapes the
  throughput headline is measured at, where Part A's 32px task cannot go
  on CPU.

Run (CPU, ~1-2 h):
  env -u PALLAS_AXON_POOL_IPS python scripts/r5_boundary_accuracy.py
Writes docs/artifacts/r5/r5_boundary_accuracy.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.train.loop import make_train_step
from f8net_tpu.train.optim import sgd_init
from f8net_tpu.utils import QuantConfig, TrainConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)
NCLS, HW, BATCH = 64, 32, 64
NEVAL, EVAL_BS = 10_240, 512
# overridable for time-boxed continuation runs (R5_SEEDS="0,1"
# R5_LADDER="0.02:500,0.008:800"); defaults = the full program
SEEDS = tuple(
    int(s) for s in os.environ.get("R5_SEEDS", "0,1,2").split(",")
)
LADDER = [
    (float(p.split(":")[0]), int(p.split(":")[1]))
    for p in os.environ.get(
        "R5_LADDER", "0.05:300,0.02:500,0.05:800,0.008:800,0.02:1200"
    ).split(",")
]
FAMILIES = ("resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2")


def make_task(key, noise=0.30):
    protos = jax.random.uniform(key, (NCLS, HW, HW, 3))

    def batch(k, n):
        kl, kn = jax.random.split(k)
        labels = jax.random.randint(kl, (n,), 0, NCLS)
        x = jnp.clip(0.70 * protos[labels] + noise * jax.random.uniform(kn, (n, HW, HW, 3)), 0.0, 1.0)
        return jnp.round(255 * x) / 256, labels

    return batch


def _train_once(fam, lr, steps, seed):
    task = make_task(jax.random.PRNGKey(1000 + seed))
    model = get_model(fam, CFG, num_classes=NCLS, image_size=HW)
    params, state = model.init(jax.random.PRNGKey(seed))
    tcfg = TrainConfig(
        num_classes=NCLS, image_size=HW, batch_size=BATCH, lr=lr,
        topk=(1,), weight_decay=1e-4,
    )
    step = make_train_step(model, CFG, tcfg)
    opt = sgd_init(params)
    for i in range(steps):
        x, y = task(jax.random.PRNGKey(seed * 100_000 + i), BATCH)
        cur = lr * min(1.0, (i + 1) / 10.0)
        params, state, opt, m = step(params, state, opt, x, y, cur)
    return model, params, state, task


def _eval_chunks(fn, xs, bs=EVAL_BS):
    outs = [np.asarray(fn(xs[i : i + bs])) for i in range(0, xs.shape[0], bs)]
    return np.concatenate(outs, 0)


def _referent_top1(model, params, state, task, seed):
    xs, ys = task(jax.random.PRNGKey(seed + 777), 2048)
    lg = _eval_chunks(lambda v: model.apply(params, state, v, mode="eval")[0], xs)
    return float((lg.argmax(-1) == np.asarray(ys)).mean())


def run_family_seed(fam, seed):
    # lr/steps ladder: escalate steps and de-escalate lr until the float
    # referent clears 0.90 held-out top-1 (the r4 receipt's 0.617 R50
    # referent was ruled toy-scale by the verdict)
    ladder = LADDER
    best = None
    for lr, steps in ladder:
        model, params, state, task = _train_once(fam, lr, steps, seed)
        if any(
            not np.isfinite(np.asarray(v)).all()
            for v in jax.tree_util.tree_leaves(params)
        ):
            print(f"# {fam} s{seed} lr={lr}/{steps}: diverged", file=sys.stderr)
            continue
        acc = _referent_top1(model, params, state, task, seed)
        print(f"# {fam} s{seed} lr={lr}/{steps}: referent {acc:.3f}", file=sys.stderr)
        if best is None or acc > best[0]:
            best = (acc, model, params, state, task, lr, steps)
        if acc >= 0.90:
            break
    acc, model, params, state, task, lr, steps = best

    plan, ip = bake_plan(model, params, state)
    strict = IntEngine(model, plan, ip)
    relaxed = IntEngine(model, plan, ip, bf16_boundary=True)
    relax8 = IntEngine(model, plan, ip, int8_boundary=True)

    xe, ye = task(jax.random.PRNGKey(999_999 + seed), NEVAL)
    ref = _eval_chunks(lambda v: model.apply(params, state, v, mode="eval")[0], xe)
    xi = strict.condition_input(xe)
    ys_ = _eval_chunks(strict, xi)
    yr = _eval_chunks(relaxed, xi)
    y8 = _eval_chunks(relax8, xi)
    ye = np.asarray(ye)

    top1 = lambda lg: float((lg.argmax(-1) == ye).mean())
    agree = lambda a, b: float((a.argmax(-1) == b.argmax(-1)).mean())
    a_sr = agree(ys_, ref)
    a_rs = agree(yr, ys_)
    a_8s = agree(y8, ys_)
    row = {
        "family": fam, "seed": seed, "train_lr": lr, "train_steps": steps,
        "n_eval": NEVAL, "n_classes": NCLS,
        "eval_top1_referent": round(top1(ref), 4),
        "eval_top1_strict": round(top1(ys_), 4),
        "eval_top1_relaxed": round(top1(yr), 4),
        "eval_top1_int8b": round(top1(y8), 4),
        "agree_strict_vs_referent": round(a_sr, 4),
        "agree_relaxed_vs_strict": round(a_rs, 4),
        "agree_int8b_vs_strict": round(a_8s, 4),
        "referent_reached_090": acc >= 0.90,
        "gate_relaxed": a_rs >= a_sr,
        "gate_int8b": a_8s >= a_sr,
        "gate_pass": bool(a_rs >= a_sr and a_8s >= a_sr and acc >= 0.90),
    }
    print(json.dumps(row), flush=True)
    return row


def divergence_224(fam):
    """Part B: rung-vs-strict logit divergence at the headline's real shape."""
    model = get_model(fam, CFG, num_classes=1000, image_size=224)
    params, state = model.init(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    for i in range(3):  # populate EMA fraclens + BN stats
        k = jax.random.fold_in(key, i)
        x = jnp.round(255 * jax.random.uniform(k, (8, 224, 224, 3))) / 256
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    strict = IntEngine(model, plan, ip)
    relaxed = IntEngine(model, plan, ip, bf16_boundary=True)
    relax8 = IntEngine(model, plan, ip, int8_boundary=True)
    xs = jnp.round(
        255 * jax.random.uniform(jax.random.PRNGKey(5), (128, 224, 224, 3))
    ).astype(jnp.uint8)
    ys_ = _eval_chunks(strict, xs, bs=32)
    out = {"family": fam, "n": 128, "image_size": 224}
    for name, eng in (("relaxed", relaxed), ("int8b", relax8)):
        yr = _eval_chunks(eng, xs, bs=32)
        rel = np.abs(yr - ys_).max(-1) / (np.abs(ys_).max(-1) + 1e-12)
        out[name] = {
            "argmax_agree": float((yr.argmax(-1) == ys_.argmax(-1)).mean()),
            "rel_err_median": round(float(np.median(rel)), 6),
            "rel_err_p99": round(float(np.percentile(rel, 99)), 6),
            "rel_err_max": round(float(rel.max()), 6),
        }
    print(json.dumps(out), flush=True)
    return out


def main():
    fams = sys.argv[1:] or list(FAMILIES)
    rows = [run_family_seed(f, s) for f in fams for s in SEEDS]
    div = [divergence_224(f) for f in fams]
    all_pass = all(r["gate_pass"] for r in rows)
    result = {
        "gate": "agree(rung,strict) >= agree(strict,referent) per family x seed, "
                "referent held-out top-1 >= 0.90",
        "all_pass": all_pass,
        "task_rows": rows,
        "divergence_224": div,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "artifacts", "r5", "r5_boundary_accuracy.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"all_pass={all_pass}; wrote {out}")


if __name__ == "__main__":
    main()
