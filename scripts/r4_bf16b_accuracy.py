#!/usr/bin/env python
"""Accuracy receipt for the relaxed-boundary throughput mode (bf16_boundary).

The mode's claim (docs/DESIGN.md): integize-grade accuracy -- the semantics
of the reference's own float-dtype deployment modes (README.md:76: the four
test paths "can differ a little due to numerical error") -- at int8 speed.
This script quantifies "integize-grade" on QAT-TRAINED models rather than
random-weight toys: for each family, a tiny model is trained with the real
QAT train step on a separable synthetic task (class prototypes + noise),
then a held-out set is evaluated through

  - the QAT float referent (model.apply eval),
  - the bit-exact integer engine (the int32-boundary contract),
  - the relaxed bf16-boundary engine,

and we report top-1 accuracy of each path plus argmax agreement and logit
distances between them.  The deliverable: relaxed-vs-strict agreement is
in the same class as strict-vs-referent agreement (the gap the reference
itself accepts between its own eval modes).

Runs on CPU in a few minutes:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/r4_bf16b_accuracy.py
Writes docs/artifacts/r4/r4_bf16b_accuracy.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only measurement (tiny models; the in-process switch mirrors
# tests/conftest.py -- env vars are read too early to help)
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
NCLS, HW, BATCH, STEPS, NEVAL = 8, 32, 64, 250, 1024


def make_task(key):
    """Class prototypes + noise: linearly separable, learnable in ~100
    steps by every family at 32px."""
    kp, = jax.random.split(key, 1)
    protos = jax.random.uniform(kp, (NCLS, HW, HW, 3))

    def batch(key, n):
        kl, kn = jax.random.split(key)
        labels = jax.random.randint(kl, (n,), 0, NCLS)
        noise = 0.35 * jax.random.uniform(kn, (n, HW, HW, 3))
        x = jnp.clip(0.65 * protos[labels] + noise, 0.0, 1.0)
        # engine wire grid: images arrive as round(255*x)/256 (uint8 wire)
        return jnp.round(255 * x) / 256, labels

    return batch


def _train_once(fam, lr, seed):
    key = jax.random.PRNGKey(seed)
    task = make_task(jax.random.PRNGKey(1000 + seed))
    model = get_model(fam, CFG, num_classes=NCLS, image_size=HW)
    params, state = model.init(key)
    tcfg = TrainConfig(
        num_classes=NCLS, image_size=HW, batch_size=BATCH, lr=lr,
        topk=(1,), weight_decay=1e-4,
    )
    step = make_train_step(model, CFG, tcfg)
    opt = sgd_init(params)
    for i in range(STEPS):
        x, y = task(jax.random.PRNGKey(2 * i), BATCH)
        # 10-step warmup keeps the depthwise families from diverging
        cur = lr * min(1.0, (i + 1) / 10.0)
        params, state, opt, m = step(params, state, opt, x, y, cur)
    train_acc = float(m["top1"]) / BATCH
    return model, params, state, task, train_acc


def run_family(fam, seed=0):
    # per-family lr ladder: retry lower on divergence (NaN weights) or
    # underfit (final-batch top-1 < 0.6 -- degenerate logits would make
    # the agreement numbers trivially 1.0 and the receipt meaningless)
    for lr in (0.05, 0.02, 0.008, 0.003):
        model, params, state, task, train_acc = _train_once(fam, lr, seed)
        leaves = jax.tree_util.tree_leaves(params)
        if any(not np.isfinite(np.asarray(v)).all() for v in leaves):
            print(f"# {fam} lr={lr}: diverged, retrying", file=sys.stderr)
            continue
        if train_acc < 0.6:
            print(
                f"# {fam} lr={lr}: underfit ({train_acc:.2f}), retrying",
                file=sys.stderr,
            )
            continue
        break

    plan, ip = bake_plan(model, params, state)
    strict = IntEngine(model, plan, ip)
    relaxed = IntEngine(model, plan, ip, bf16_boundary=True)
    relax8 = IntEngine(model, plan, ip, int8_boundary=True)

    xe, ye = task(jax.random.PRNGKey(999_999), NEVAL)
    ref = np.asarray(model.apply(params, state, xe, mode="eval")[0])
    xi = strict.condition_input(xe)
    ys = np.asarray(strict(xi))
    yr = np.asarray(relaxed(xi))
    y8 = np.asarray(relax8(xi))
    ye = np.asarray(ye)

    top1 = lambda lg: float((lg.argmax(-1) == ye).mean())
    agree = lambda a, b: float((a.argmax(-1) == b.argmax(-1)).mean())
    # strict/relaxed logits are on the 2^out_fl integer grid; the referent is
    # at real scale -- compare shapes via per-row cosine (scale-free)
    cos = lambda a, b: (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    scale = 2.0 ** plan["classifier"].out_fl
    rel_err = np.abs(yr - ys) / (np.abs(ys).max(-1, keepdims=True) + 1e-12)
    row = {
        "family": fam,
        "train_lr": lr,
        "train_top1_final_batch": round(train_acc, 4),
        "eval_top1_referent": round(top1(ref), 4),
        "eval_top1_strict": round(top1(ys), 4),
        "eval_top1_relaxed": round(top1(yr), 4),
        "agree_strict_vs_referent": round(agree(ys, ref), 4),
        "agree_relaxed_vs_referent": round(agree(yr, ref), 4),
        "agree_relaxed_vs_strict": round(agree(yr, ys), 4),
        "eval_top1_int8b": round(top1(y8), 4),
        "agree_int8b_vs_referent": round(agree(y8, ref), 4),
        "agree_int8b_vs_strict": round(agree(y8, ys), 4),
        "cos_int8b_vs_strict_min": round(float(cos(y8, ys).min()), 6),
        "cos_relaxed_vs_strict_min": round(float(cos(yr, ys).min()), 6),
        "cos_strict_vs_referent_min": round(
            float(cos(ys / scale, ref).min()), 6
        ),
        "max_rel_logit_err_relaxed_vs_strict": round(
            float(rel_err.max()), 6
        ),
        "n_eval": NEVAL,
    }
    return row


def main():
    fams = sys.argv[1:] or [
        "resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2"
    ]
    rows = []
    for fam in fams:
        row = run_family(fam)
        print(json.dumps(row))
        rows.append(row)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "artifacts", "r4", "r4_bf16b_accuracy.json",
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
