"""Intra-head-stage attribution for the ResNet engine on TPU.

layer_breakdown showed head-stage = 18.7 ms of ResNet18 b1024's ~40 ms.
This times cumulative prefixes inside that stage -- input pack, conv,
+bias/relu, +maxpool -- plus variants (border-bias vs explicit pad, uint8
vs int32 wire input, bf16 baseline head for comparison).

python scripts/head_stage_probe.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from f8net_tpu.engine.int_engine import _conv_int, _maxpool
from f8net_tpu.models import get_model
from f8net_tpu.ops.fxp import shift_requant
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    model = get_model("resnet18", CFG, num_classes=1000)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)
    spec = model.graph["head"]
    hp = plan["head"]
    w8 = ip["head"]["w"]
    b = ip["head"]["b"]
    comp = 128 * jnp.sum(w8.astype(jnp.int32), axis=(0, 1, 2))
    bzp = b + comp

    x32 = jnp.round(
        255.0 * jax.random.uniform(jax.random.PRNGKey(1), (batch, 224, 224, 3))
    ).astype(jnp.int32)
    xu8 = x32.astype(jnp.uint8)

    def pack(x):
        v = shift_requant(x, 8, hp.input_fl, 8, hp.input_symmetric)
        return (v - 128).astype(jnp.int8)

    stages = {}

    def run(name, f, *a):
        fj = jax.jit(f)
        t = timeit(fj, *a)
        stages[name] = t
        print(f"  {name:34s} {t*1e3:8.2f} ms", flush=True)
        return t

    print(f"resnet18 head-stage prefixes, b{batch}:", flush=True)
    run("pack(int32 wire)", lambda x: jnp.sum(pack(x).astype(jnp.int32)), x32)
    run("pack+pad+conv (explicit -128 pad)",
        lambda x: jnp.sum(
            _conv_int(pack(x), w8, spec, pad_value=-128, exact_f32=True) + bzp
        ), x32)

    def conv_bb(x):
        ones = jnp.ones((1, 224, 224, 3), jnp.int8)
        bmap = b + 128 * _conv_int(ones, w8, spec, exact_f32=True)
        return _conv_int(pack(x), w8, spec, exact_f32=True) + bmap

    run("pack+conv (border-bias)", lambda x: jnp.sum(conv_bb(x)), x32)
    run("pack+conv+relu+maxpool (border-bias)",
        lambda x: jnp.sum(_maxpool(jnp.maximum(conv_bb(x), 0), 3, 2, 1)), x32)

    # uint8 wire straight into the conv (skip the int32 round trip)
    def conv_u8(x):
        ones = jnp.ones((1, 224, 224, 3), jnp.int8)
        bmap = b + 128 * _conv_int(ones, w8, spec, exact_f32=True)
        v = shift_requant(x.astype(jnp.int32), 8, hp.input_fl, 8, hp.input_symmetric)
        s8 = (v - 128).astype(jnp.int8)
        return _conv_int(s8, w8, spec, exact_f32=True) + bmap

    run("u8wire pack+conv+relu+maxpool",
        lambda x: jnp.sum(_maxpool(jnp.maximum(conv_u8(x), 0), 3, 2, 1)), xu8)

    # space-to-depth head: 7x7s2p3 C=3 -> 4x4s1 pad(2,1) C=12 (bit-exact,
    # integer values in f32 accumulation are order-independent)
    def s2d(x4):
        n_, h_, w_, c_ = x4.shape
        v = x4.reshape(n_, h_ // 2, 2, w_ // 2, 2, c_)
        v = v.transpose(0, 1, 3, 2, 4, 5)
        return v.reshape(n_, h_ // 2, w_ // 2, 4 * c_)

    import numpy as _np

    w_np = _np.asarray(w8)
    k, p, c_in, o_ = 7, 3, 3, w_np.shape[3]
    ws = _np.zeros((4, 4, 4 * c_in, o_), w_np.dtype)
    for dy in range(k):
        ey, ay = (dy - p) % 2, (dy - p - (dy - p) % 2) // 2
        for dx in range(k):
            ex, ax = (dx - p) % 2, (dx - p - (dx - p) % 2) // 2
            ws[ay + 2, ax + 2, (ey * 2 + ex) * c_in : (ey * 2 + ex) * c_in + c_in, :] = (
                w_np[dy, dx]
            )
    ws = jnp.asarray(ws)

    def conv_s2d(x):
        v = shift_requant(x.astype(jnp.int32), 8, hp.input_fl, 8, hp.input_symmetric)
        s8 = (v - 128).astype(jnp.int8)
        xs = s2d(s8)
        ones = s2d(jnp.ones((1, 224, 224, 3), jnp.int8))
        conv = lambda a: lax.conv_general_dilated(
            a.astype(jnp.bfloat16), ws.astype(jnp.bfloat16), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        return conv(xs) + (b + 128 * conv(ones))

    run("s2d u8wire pack+conv+relu+maxpool",
        lambda x: jnp.sum(_maxpool(jnp.maximum(conv_s2d(x), 0), 3, 2, 1)), xu8)

    # bf16 baseline head for comparison
    wb = w8.astype(jnp.bfloat16)
    xb = (x32.astype(jnp.float32) / 256.0).astype(jnp.bfloat16)

    def bf16_head(x):
        y = lax.conv_general_dilated(
            x, wb, spec.stride, [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return _maxpool(jnp.maximum(y, 0), 3, 2, 1)

    run("bf16 conv+relu+maxpool (baseline)", lambda x: jnp.sum(bf16_head(x).astype(jnp.float32)), xb)

    # maxpool alone on an int32 tensor of head-output size
    y32 = jnp.ones((batch, 112, 112, 64), jnp.int32)
    run("maxpool alone (int32 112^2x64)", lambda y: jnp.sum(_maxpool(y, 3, 2, 1)), y32)


if __name__ == "__main__":
    main()
