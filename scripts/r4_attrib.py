"""Whole-model attribution ladder for ANY family (VERDICT r3 item 4).

Generalizes scripts/mbv2_attrib.py (whose method the round-3 verdict
accepted) to ResNet50 / MobileNetV1 / any zoo model, and adds the round-4
engine variants:

  A  bf16 baseline             (plain_forward -- the bench.py baseline)
  B  A + 1-byte boundaries     (s8 store/load at block boundaries)
  C  A + s32-accum convs       (s8 operands, s32 accumulate, float epilogue)
  D  int8 engine (shipping)    (f32 requant epilogue, s32 convs)
  E  int8 engine mxu_bf16=1x1  (bound-eligible 1x1s as bf16 MXU convs)

B-A prices the activation-byte structure, C-A the s32 conv emitters, D-C
the remaining exact-integer glue, E-D the bf16-operand conv recovery.

  timeout 5400 python scripts/r4_attrib.py <model> [batch]

Run with nothing else on the host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.baseline import _conv, _maxpool, plain_params
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig


def hybrid_forward(model, fparams, x, act_s8: bool, conv_s32: bool):
    """plain_forward's walk with the int8 engine's structural elements
    spliced in one at a time (see module docstring)."""
    g = model.graph
    dtype = jnp.bfloat16

    def conv(name, v):
        p = fparams[name]
        spec = g[name]
        if conv_s32:
            v8 = jnp.clip(
                jnp.round(v.astype(jnp.float32) * 16.0), -128, 127
            ).astype(jnp.int8)
            w8 = jnp.clip(
                jnp.round(p["w"].astype(jnp.float32) * 16.0), -128, 127
            ).astype(jnp.int8)
            y = lax.conv_general_dilated(
                v8, w8, spec.stride,
                [(spec.padding[0],) * 2, (spec.padding[1],) * 2],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=spec.groups,
                preferred_element_type=jnp.int32,
            )
            return (
                y.astype(jnp.float32) / 256.0 + p["b"].astype(jnp.float32)
            ).astype(dtype)
        return _conv(v, p["w"], spec, dtype) + p["b"]

    def boundary(v):
        if act_s8:
            v8 = jnp.clip(
                jnp.round(v.astype(jnp.float32) * 8.0), -128, 127
            ).astype(jnp.int8)
            return v8.astype(dtype) / 8.0
        return v

    v = x.astype(dtype)
    v = jax.nn.relu(conv("head", v))
    if model.name.startswith("resnet"):
        v = _maxpool(v, 3, 2, 1)
    v = boundary(v)
    for meta in model.blocks:
        v_in = v
        for i, cname in enumerate(meta.body):
            if i > 0:
                v = jax.nn.relu(v)
            v = conv(cname, v)
        if hasattr(meta, "shortcut"):
            s = v_in if meta.shortcut is None else conv(meta.shortcut, v_in)
            v = jax.nn.relu(v + s)
        elif getattr(meta, "residual", False):
            v = v + v_in
        else:
            v = jax.nn.relu(v)
        v = boundary(v)
    if model.name == "mobilenet_v2":
        v = jax.nn.relu(conv("tail", v))
    v = jnp.mean(v, (1, 2))
    p = fparams["classifier"]
    return (v @ p["w"] + p.get("b", 0)).astype(jnp.float32)


def timeit(fn, xs, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(xs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        o = fn(xs[i % len(xs)])
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("devices:", jax.devices(), flush=True)
    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    model = get_model(name, cfg, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, int_params = bake_plan(model, params, state)
    eng = IntEngine(model, plan, int_params, int_only=True)
    eng_mxu = IntEngine(
        model, plan, int_params, int_only=True, mxu_bf16="1x1"
    )
    fparams = plain_params(model, int_params)

    rng = np.random.RandomState(0)
    x8s = [
        jnp.asarray(rng.randint(0, 256, (bs, 224, 224, 3)), jnp.uint8)
        for _ in range(2)
    ]
    xbs = [(x.astype(jnp.float32) / 256.0).astype(jnp.bfloat16) for x in x8s]

    from f8net_tpu.engine.baseline import plain_forward

    variants = {
        "A_bf16": (jax.jit(lambda v: plain_forward(model, fparams, v)), xbs),
        "B_act_s8": (
            jax.jit(lambda v: hybrid_forward(model, fparams, v, True, False)),
            xbs,
        ),
        "C_conv_s32": (
            jax.jit(lambda v: hybrid_forward(model, fparams, v, False, True)),
            xbs,
        ),
        "D_int8_engine": (eng, x8s),
        "E_mxu_bf16": (eng_mxu, x8s),
    }
    for k, (fn, xs) in variants.items():
        jax.block_until_ready(fn(xs[0]))
        print(f"  {k}: compiled", flush=True)

    ts = {k: [] for k in variants}
    for _ in range(4):
        for k, (fn, xs) in variants.items():
            ts[k].append(timeit(fn, xs))
    med = lambda v: sorted(v)[len(v) // 2]
    ta = med(ts["A_bf16"])
    print(f"\n{name} b{bs} attribution ladder (ms/batch, img/s, vs A):")
    for k in variants:
        t = med(ts[k])
        print(
            f"  {k:14s}: {t*1e3:8.2f} ms  {bs/t:8.1f} img/s  "
            f"x{ta/t:.3f} vs bf16  (+{(t-ta)*1e3:6.2f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
