#!/usr/bin/env python
"""Receipt: boundary-aware QAT restores int8-boundary deployment parity.

Companion to scripts/r5_boundary_accuracy.py, which measured the int8b
rung's accuracy cliff on models trained WITHOUT boundary quantization
(R18: -4.3pt top-1, agree(int8b, strict) 0.94 << gate).  This receipt
trains the same 64-class task WITH cfg.qat_boundary='int8' (residual
carries quantized onto the consumer conv's 8-bit grid with STE -- the
int8-boundary engine's dataflow simulated at train time) and asserts the
deployment gate against the matched referent:

    agree(int8b, referent) >= 0.99  AND  top1(int8b) >= top1(referent) - 0.005
    per family x seed.

Run (CPU): env -u PALLAS_AXON_POOL_IPS python scripts/r5_qat_boundary_receipt.py
Writes docs/artifacts/r5/r5_qat_boundary_receipt.json.
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
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import r5_boundary_accuracy as base  # noqa: E402  (task + trainer reused)

# the reused trainer builds its model from base.CFG (module global)
base.CFG = base.CFG.replace(qat_boundary="int8")
SEEDS = base.SEEDS  # honors R5_SEEDS
FAMILIES = ("resnet18", "mobilenet_v2")


def run(fam, seed):
    ladder = base.LADDER  # honors R5_LADDER
    best = None
    for lr, steps in ladder:
        model, params, state, task = base._train_once(fam, lr, steps, seed)
        if any(
            not np.isfinite(np.asarray(v)).all()
            for v in jax.tree_util.tree_leaves(params)
        ):
            print(f"# {fam} s{seed} lr={lr}/{steps}: diverged", file=sys.stderr)
            continue
        acc_ = base._referent_top1(model, params, state, task, seed)
        print(f"# {fam} s{seed} lr={lr}/{steps}: referent {acc_:.3f}", file=sys.stderr)
        if best is None or acc_ > best[0]:
            best = (acc_, model, params, state, task, lr, steps)
        if acc_ >= 0.90:
            break
    acc_, model, params, state, task, lr, steps = best

    plan, ip = bake_plan(model, params, state)
    strict = IntEngine(model, plan, ip)
    relax8 = IntEngine(model, plan, ip, int8_boundary=True)
    xe, ye = task(jax.random.PRNGKey(999_999 + seed), base.NEVAL)
    ref = base._eval_chunks(
        lambda v: model.apply(params, state, v, mode="eval")[0], xe
    )
    xi = strict.condition_input(xe)
    ys_ = base._eval_chunks(strict, xi)
    y8 = base._eval_chunks(relax8, xi)
    ye = np.asarray(ye)
    top1 = lambda lg: float((lg.argmax(-1) == ye).mean())
    agree = lambda a, b: float((a.argmax(-1) == b.argmax(-1)).mean())
    row = {
        "family": fam, "seed": seed, "train_lr": lr, "train_steps": steps,
        "qat_boundary": "int8", "n_eval": base.NEVAL, "n_classes": base.NCLS,
        "eval_top1_referent": round(top1(ref), 4),
        "eval_top1_int8b": round(top1(y8), 4),
        "eval_top1_strict_offrung": round(top1(ys_), 4),
        "agree_int8b_vs_referent": round(agree(y8, ref), 4),
        "referent_reached_090": acc_ >= 0.90,
        "gate_pass": bool(
            agree(y8, ref) >= 0.99
            and top1(y8) >= top1(ref) - 0.005
            and acc_ >= 0.90
        ),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [run(f, s) for f in FAMILIES for s in SEEDS]
    result = {
        "gate": "agree(int8b, referent) >= 0.99 and top1(int8b) >= "
                "top1(referent) - 0.005 per family x seed, referent >= 0.90",
        "all_pass": all(r["gate_pass"] for r in rows),
        "rows": rows,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "artifacts", "r5", "r5_qat_boundary_receipt.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"all_pass={result['all_pass']}; wrote {out}")


if __name__ == "__main__":
    main()
