"""End-to-end walkthrough: train -> convert -> cross-check -> export -> serve.

Runs in ~2 minutes on CPU (tiny synthetic data); the same code is what you
run on a TPU slice with real data.  python examples/end_to_end.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.serve import ServingEngine
from f8net_tpu.export import export_torchscript, save_deploy_bundle
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.train import Trainer
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig
from f8net_tpu.utils.reporting import fraclen_report


def main():
    # 1. configure (the reference's fix_quant_train vocabulary)
    cfg = QuantConfig(
        format_from_metric=True, metric="std",
        quant_bias=True, quant_avgpool=True, pool_fusing=True,
    )
    tcfg = TrainConfig(
        num_epochs=6, batch_size=8, lr=0.02, lr_scheduler="cos_annealing",
        warmup_epochs=0, topk=(1,), num_classes=5,
    )

    # 2. build + quantization-aware training (image_size fixes the pool
    # extent -- the int avgpool shift is derived from it)
    model = get_model("resnet18", cfg, num_classes=5, image_size=32)
    trainer = Trainer(model, cfg, tcfg)
    params, state, opt = trainer.init(jax.random.PRNGKey(0))
    batches = []
    for i in range(3):
        lab = jax.random.randint(jax.random.PRNGKey(100 + i), (8,), 0, 5)
        base = jax.random.uniform(jax.random.PRNGKey(i), (8, 32, 32, 3)) * 0.4
        sig = (lab.astype(jnp.float32) / 5.0)[:, None, None, None]
        batches.append((jnp.clip(base + 0.6 * sig, 0, 1), lab))
    for epoch in range(tcfg.num_epochs):
        params, state, opt, res = trainer.run_epoch(
            params, state, opt, batches, epoch, len(batches), "train"
        )

    # 3. freeze fraclens into a static plan + int8/int32 params
    plan, int_params = bake_plan(model, params, state)
    print("\nper-layer plan (first 3):")
    for p in plan.layers[:3]:
        print(f"  {p.name}: input_fl={p.input_fl} weight_fl={p.weight_fl} "
              f"signed={p.input_symmetric}")

    # 4. the four cross-checking eval modes
    x, _ = batches[0]
    a, _ = model.apply(params, state, x, mode="eval")
    b, _ = model.apply(params, state, x, mode="eval", cfg=cfg.replace(int_infer=True))
    eng = IntEngine(model, plan, int_params, int_only=True)
    sim = IntEngine(model, plan, int_params, int_only=False)
    xi = eng.condition_input(x)
    d = np.asarray(eng(xi))
    c = np.asarray(sim(sim.condition_input(x)))
    print("\nfour-mode agreement:")
    print("  integize == int_op_only bit-exact:", np.array_equal(c, d))
    print("  QAT-sim argmax == int argmax:",
          float(np.mean(np.argmax(np.asarray(a), -1) == np.argmax(d, -1))))

    # 5. export artifacts
    with tempfile.TemporaryDirectory() as tmp:
        bundle = save_deploy_bundle(os.path.join(tmp, "model_int8"), model, plan, int_params)
        ts = export_torchscript(model, plan, int_params, os.path.join(tmp, "model_int8_ts.pt"), image_size=32)
        print("\nexported:", os.path.basename(bundle), "+", os.path.basename(ts))

        # 6. serve with continuous batching.  Production throughput serving
        # uses the relaxed-boundary engine (bf16 residual/stem carries --
        # integize-grade accuracy, beats the bf16 baseline on ResNets;
        # docs/DESIGN.md 3b); the strict engine above stays the
        # export/parity contract.
        rel = IntEngine(model, plan, int_params, bf16_boundary=True)
        agree = float(np.mean(
            np.argmax(np.asarray(rel(xi)), -1) == np.argmax(d, -1)
        ))
        print("relaxed-vs-strict argmax agreement:", agree)
        srv = ServingEngine(rel, batch_size=8, max_wait_ms=10).start()
        futs = [srv.submit(np.asarray(xi[i])) for i in range(4)]
        outs = [f.result(60) for f in futs]
        srv.stop()
        print("served", len(outs), "requests; logits", outs[0].shape,
              "| stats", srv.stats)

    # 7. per-layer report (the fraclen_visual-compatible dump)
    print("\nfraclen report (tail):")
    lines = []
    fraclen_report(model, params, state, cfg, print_fn=lines.append)
    print("\n".join(lines[-6:]))


if __name__ == "__main__":
    main()
