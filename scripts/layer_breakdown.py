"""Per-stage time attribution for the integer engine on TPU.

Times prefix-truncated forwards (head only, head+K blocks, ...) and reports
the delta per stage.  The dispatch floor cancels in the differences, so this
works through the axon tunnel where per-op profiling doesn't.

python scripts/layer_breakdown.py [model] [batch] [xla|pallas]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from f8net_tpu.engine.int_engine import IAct, _Walker, _maxpool, _block_resnet_int, _block_mbv1_int, _block_mbv2_int
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.engine.int_engine import add_zero_point_bias
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def make_prefix_fn(model, plan, cfg, k_blocks, use_pallas):
    fam = model.name

    def fn(params, x):
        w = _Walker(model, plan, params, cfg, True, True, use_pallas)
        a = IAct(x.astype(jnp.int32), plan["head"].input_fl)
        if fam.startswith("resnet"):
            a = w.relu_i32(w.conv_int("head", a))
            a = IAct(_maxpool(a.x, 3, 2, 1), a.fl)
            for meta in model.blocks[:k_blocks]:
                a = _block_resnet_int(w, meta, a)
        elif fam == "mobilenet_v1":
            consumers = [m.body[0] for m in model.blocks[1:]] + [None]
            a = w.conv_int("head", a, pack_output_for=model.blocks[0].body[0] if k_blocks else None)
            for meta, nxt in zip(model.blocks[:k_blocks], consumers[:k_blocks]):
                a = _block_mbv1_int(w, meta, a, nxt)
        else:
            consumers = []
            for kk in range(1, len(model.blocks)):
                nxt = model.blocks[kk]
                consumers.append(None if nxt.residual else nxt.body[0])
            consumers.append(None)
            first = model.blocks[0]
            a = w.conv_int("head", a, pack_output_for=None if (first.residual or not k_blocks) else first.body[0])
            for meta, nxt in zip(model.blocks[:k_blocks], consumers[:k_blocks]):
                a = _block_mbv2_int(w, meta, a, nxt)
        # force a small materialization
        v = a.x
        return jnp.sum(v.astype(jnp.int32))

    return jax.jit(fn)


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    use_pallas = len(sys.argv) > 3 and sys.argv[3] == "pallas"

    model = get_model(model_name, CFG, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    ip = add_zero_point_bias(model, plan, ip)
    x = jnp.round(255.0 * jax.random.uniform(jax.random.PRNGKey(1), (batch, 224, 224, 3))).astype(jnp.int32)

    nb = len(model.blocks)
    step = max(1, nb // 5)
    marks = [0] + list(range(step, nb + 1, step))
    if marks[-1] != nb:
        marks.append(nb)
    prev = 0.0
    print(f"{model_name} b{batch} {'pallas' if use_pallas else 'xla'} prefix timings:")
    for k in marks:
        fn = make_prefix_fn(model, plan, CFG, k, use_pallas)
        t = timeit(fn, ip, x)
        label = "head" if k == 0 else f"+block {k}"
        print(f"  {label:10s} total {t*1e3:8.2f} ms   delta {max(t-prev,0)*1e3:7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
