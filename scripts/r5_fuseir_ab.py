"""Round-5 A/B: fused inverted-residual blocks vs the per-layer engine.

Interleaved rounds (bench.py method) on MobileNetV2/V1: bf16 baseline +
per-layer and fused variants of each boundary rung.

  timeout 7200 python scripts/r5_fuseir_ab.py [model] [batch] [rungs]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import importlib
bench = importlib.import_module("bench")

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.baseline import plain_forward, plain_params
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mobilenet_v2"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    which = sys.argv[3].split(",") if len(sys.argv) > 3 else ["strict", "relaxed", "relaxed8"]
    cfg = QuantConfig(format_from_metric=True, metric="std", quant_bias=True,
                      quant_avgpool=True, pool_fusing=True)
    model = get_model(name, cfg, num_classes=1000, image_size=224)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (bs, 224, 224, 3))).astype(jnp.uint8)
    fparams = plain_params(model, ip)
    bf16 = jax.jit(lambda p, v: plain_forward(model, p, v))
    xb = (x.astype(jnp.float32) / 256.0).astype(jnp.bfloat16)

    mode_kw = {"strict": {}, "relaxed": {"bf16_boundary": True}, "relaxed8": {"int8_boundary": True}}
    fns = [("bf16", bf16, (fparams, xb))]
    for m in which:
        for fuse in (False, True):
            eng = IntEngine(model, plan, ip, fuse_ir=fuse, **mode_kw[m])
            tag = m + ("_fused" if fuse else "")
            fns.append((tag, eng, (x,)))
    res = bench._time_rungs(fns, rounds=4, iters=4)
    print(f"\n{name} b{bs} fused-IR A/B (median t, ratio bf16/t):")
    for n, (t, r) in res.items():
        print(f"  {n:16s}: {t*1e3:8.2f} ms  {bs/t:9.1f} img/s  x{r:.3f} vs bf16")

if __name__ == "__main__":
    main()
