"""Compile (no run) the int engine and the bf16 baseline, dump optimized
HLO + cost analysis, and summarize fusion structure.

Where timing through the relay is noisy, the compiled module is exact: how
many fusions exist, whether the requant chains fused into convolutions,
and the total bytes each kernel touches.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collections
import re

import jax
import jax.numpy as jnp

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.baseline import plain_forward, plain_params
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def summarize(tag, compiled):
    try:
        txt = compiled.as_text()
    except Exception as e:
        print(f"{tag}: as_text failed: {e}")
        return
    ops = collections.Counter()
    conv_lines = 0
    fusion_kinds = collections.Counter()
    for line in txt.splitlines():
        m = re.search(r"= (\w+)\(", line)
        if m:
            ops[m.group(1)] += 1
        if "convolution(" in line:
            conv_lines += 1
        fm = re.search(r"fusion\(.*kind=(\w+)", line)
        if fm:
            fusion_kinds[fm.group(1)] += 1
    print(f"\n=== {tag} ===")
    print("top-level ops:", dict(ops.most_common(12)))
    print("convolutions:", conv_lines, "| fusion kinds:", dict(fusion_kinds))
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = {k: v for k, v in ca.items() if k in ("flops", "bytes accessed", "transcendentals")}
        print("cost analysis:", keys)
    except Exception as e:
        print("cost_analysis failed:", e)
    out = f"/tmp/hlo_{tag}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("full HLO ->", out, f"({len(txt)//1000} KB)")


def main():
    model = get_model("mobilenet_v2", CFG, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    x = jnp.zeros((256, 224, 224, 3), jnp.uint8)
    compiled = eng._jit.lower(eng.int_params, x).compile()
    summarize("mbv2_int8", compiled)

    fp = plain_params(model, ip)
    xb = jnp.zeros((256, 224, 224, 3), jnp.bfloat16)
    bf = jax.jit(lambda p, v: plain_forward(model, p, v))
    compiled_b = bf.lower(fp, xb).compile()
    summarize("mbv2_bf16", compiled_b)


if __name__ == "__main__":
    main()
