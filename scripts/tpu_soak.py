"""End-to-end training soak on the real chip.

Trains ResNet18 QAT on synthetic 224x224 data long enough to overfit,
then bakes the plan and checks the four-mode agreement on the *trained*
model (trained weight/activation magnitudes exercise saturation paths that
random-init tests cannot).  ~10 min on one v5e after compile.

python -u scripts/tpu_soak.py [epochs] [examples]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.train import Trainer, sgd_init
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    bs, classes = 256, 10

    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    tcfg = TrainConfig(
        num_epochs=epochs, batch_size=bs, lr=0.05, lr_scheduler="cos_annealing",
        warmup_epochs=0, weight_decay=4e-5, topk=(1,), num_classes=classes,
    )
    model = get_model("resnet18", cfg, num_classes=classes)
    tr = Trainer(model, cfg, tcfg)
    params, state, opt = tr.init(jax.random.PRNGKey(0))

    # fixed synthetic dataset on device (bounded classes -> learnable)
    rng = np.random.RandomState(0)
    keys = jax.random.split(jax.random.PRNGKey(1), n // bs)
    batches = []
    for i, k in enumerate(keys):
        lab = jnp.asarray(rng.randint(0, classes, bs), jnp.int32)
        base = jax.random.uniform(k, (bs, 224, 224, 3)) * 0.5
        # class-dependent signal: per-class color bias
        sig = (lab[:, None].astype(jnp.float32) / classes)[..., None, None]
        img = jnp.clip(base + 0.5 * jnp.moveaxis(jnp.stack([sig, 1 - sig, sig * 0]), 0, -1)[..., 0, :], 0, 1)
        batches.append((img, lab))

    losses = []
    for ep in range(epochs):
        t0 = time.time()
        params, state, opt, res = tr.run_epoch(params, state, opt, batches, ep, len(batches), "train")
        losses.append(res["loss"])
    print("loss trajectory:", [round(l, 3) for l in losses], flush=True)
    assert losses[-1] < losses[0] * 0.7, "training did not learn"

    # four-mode agreement on the trained model
    x, y = batches[0]
    a, _ = model.apply(params, state, x, mode="eval")
    b, _ = model.apply(params, state, x, mode="eval", cfg=cfg.replace(int_infer=True))
    plan, ip = bake_plan(model, params, state)
    ei = IntEngine(model, plan, ip, int_only=True)
    es = IntEngine(model, plan, ip, int_only=False)
    xi = ei.condition_input(x)
    yi = np.asarray(ei(xi))
    ys = np.asarray(es(es.condition_input(x)))
    exact_cd = bool(np.array_equal(yi, ys))
    agree_ab = float(np.mean(np.argmax(np.asarray(a), -1) == np.argmax(np.asarray(b), -1)))
    agree_ad = float(np.mean(np.argmax(np.asarray(a), -1) == np.argmax(yi, -1)))
    acc_int = float(np.mean(np.argmax(yi, -1) == np.asarray(y)))
    print(f"trained 4-mode: c==d exact {exact_cd} | argmax a~b {agree_ab:.3f} "
          f"a~d {agree_ad:.3f} | int top-1 on train batch {acc_int:.3f}", flush=True)
    assert exact_cd
    assert agree_ad > 0.95

    # relaxed-boundary engine ON CHIP with trained weights: the bf16
    # carries run through the real TPU bf16 units (the CPU receipts in
    # scripts/r4_bf16b_accuracy.py use XLA:CPU's bf16 emulation)
    er = IntEngine(model, plan, ip, int_only=True, bf16_boundary=True)
    yr = np.asarray(er(xi))
    agree_rd = float(np.mean(np.argmax(yr, -1) == np.argmax(yi, -1)))
    acc_rel = float(np.mean(np.argmax(yr, -1) == np.asarray(y)))
    cosr = float(
        np.min(
            (yr * yi).sum(-1)
            / (np.linalg.norm(yr, axis=-1) * np.linalg.norm(yi, axis=-1) + 1e-12)
        )
    )
    print(f"relaxed on-chip: argmax r~d {agree_rd:.3f} | top-1 {acc_rel:.3f} "
          f"| min row cos vs strict {cosr:.5f}", flush=True)
    assert agree_rd > 0.95


if __name__ == "__main__":
    main()
