"""Boundary-aware QAT (cfg.qat_boundary='int8').

The knob quantizes residual-block inputs onto their first conv's 8-bit
grid with STE during training/eval, simulating the int8-boundary engine's
1-byte carries.  Contract tested here (cheap smoke; the full receipt is
scripts/r5_qat_boundary_receipt.py):
  * training runs and converges (finite params, loss decreases),
  * on a boundary-trained model the int8-boundary engine tracks the QAT
    referent at least as closely as the strict engine does (the rung the
    model was trained for is the best-matched deployment),
  * with the knob off, behavior is unchanged (default '' covered by every
    other test in the suite).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.train.loop import make_train_step
from f8net_tpu.train.optim import sgd_init
from f8net_tpu.utils import QuantConfig, TrainConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True, qat_boundary="int8",
)
NCLS, HW, BATCH = 8, 32, 32


def _task(key, n, protos):
    kl, kn = jax.random.split(key)
    labels = jax.random.randint(kl, (n,), 0, NCLS)
    x = jnp.clip(
        0.7 * protos[labels] + 0.3 * jax.random.uniform(kn, (n, HW, HW, 3)), 0, 1
    )
    return jnp.round(255 * x) / 256, labels


@pytest.mark.parametrize("fam", ["resnet18", "mobilenet_v2"])
def test_boundary_qat_trains_and_matches_int8b_engine(fam):
    protos = jax.random.uniform(jax.random.PRNGKey(42), (NCLS, HW, HW, 3))
    model = get_model(fam, CFG, num_classes=NCLS, image_size=HW)
    params, state = model.init(jax.random.PRNGKey(0))
    tcfg = TrainConfig(
        num_classes=NCLS, image_size=HW, batch_size=BATCH, lr=0.03,
        topk=(1,), weight_decay=1e-4,
    )
    step = make_train_step(model, CFG, tcfg)
    opt = sgd_init(params)
    losses = []
    for i in range(60):
        x, y = _task(jax.random.PRNGKey(i), BATCH, protos)
        params, state, opt, m = step(
            params, state, opt, x, y, 0.03 * min(1.0, (i + 1) / 10)
        )
        losses.append(float(m["loss"]))
    assert all(
        np.isfinite(np.asarray(v)).all()
        for v in jax.tree_util.tree_leaves(params)
    )
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    plan, ip = bake_plan(model, params, state)
    strict = IntEngine(model, plan, ip)
    rel8 = IntEngine(model, plan, ip, int8_boundary=True)
    xe, _ = _task(jax.random.PRNGKey(777), 256, protos)
    ref = np.asarray(model.apply(params, state, xe, mode="eval")[0])
    xi = strict.condition_input(xe)
    agree = lambda a, b: float(
        (np.asarray(a).argmax(-1) == np.asarray(b).argmax(-1)).mean()
    )
    a8 = agree(rel8(xi), ref)
    a_s = agree(strict(xi), ref)
    # the trained-for rung must track the referent at least as well as the
    # off-rung strict engine; the absolute floor is soft (60-step smoke --
    # MBv2 is still underfit here, agreement ~0.83; the full-strength
    # numbers are the receipt's: agree(int8b, referent) 0.991 at
    # convergence, docs/artifacts/r5/r5_qat_boundary_receipt.json)
    assert a8 >= a_s, (a8, a_s)
    assert a8 >= 0.7, a8
