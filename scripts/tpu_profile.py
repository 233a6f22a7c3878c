"""One-shot TPU profiling sweep: where does the int8 engine's time go?

Bundles several steady-state measurements into one process to amortize the
slow remote compiles: batch scaling, engine variants, per-op microbenches.
Run on the real chip:  python scripts/tpu_profile.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.baseline import plain_forward, plain_params
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.profiling import model_flops, steady_state_time

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def report(tag, model, batch, size, secs):
    ips = batch / secs
    tops = model_flops(model, size, batch) / secs / 1e12
    print(f"{tag:44s} {secs*1e3:8.2f} ms  {ips:9.1f} img/s  {tops:6.1f} TOP/s")


def main():
    print("devices:", jax.devices())
    for name in ["resnet18", "mobilenet_v2"]:
        model = get_model(name, CFG, num_classes=1000)
        params, state = model.init(jax.random.PRNGKey(0))
        plan, int_params = bake_plan(model, params, state)
        fp = plain_params(model, int_params)
        for batch in [64, 256]:
            x = jnp.round(
                255.0 * jax.random.uniform(jax.random.PRNGKey(1), (batch, 224, 224, 3))
            ).astype(jnp.int32)
            xb = (x.astype(jnp.float32) / 256.0).astype(jnp.bfloat16)

            eng8 = IntEngine(model, plan, int_params, int_only=True, int8_operands=True)
            t = steady_state_time(eng8, x, iters=6)
            report(f"{name} b{batch} int8-engine", model, batch, 224, t)

            bf = jax.jit(lambda p, v: plain_forward(model, p, v))
            t = steady_state_time(bf, fp, xb, iters=6)
            report(f"{name} b{batch} bf16-baseline", model, batch, 224, t)

            if batch == 256:
                e32 = IntEngine(model, plan, int_params, int_only=True, int8_operands=False)
                t = steady_state_time(e32, x, iters=6)
                report(f"{name} b{batch} int32-operand engine", model, batch, 224, t)

    # microbench: lone int8 vs bf16 conv at a mid-network shape, plus requant cost
    from jax import lax

    N, H, W, C, O = 256, 28, 28, 128, 128
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-127, 128, (N, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 128, (3, 3, C, O)), jnp.int8)

    def conv(x, w, pt):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=pt,
        )

    f8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))
    fb = jax.jit(lambda x, w: conv(x, w, jnp.float32))
    flops = 2 * N * H * W * C * O * 9
    t8 = steady_state_time(f8, x8, w8, iters=20)
    tb = steady_state_time(fb, x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16), iters=20)
    print(f"conv3x3 128ch int8 : {t8*1e3:7.3f} ms  {flops/t8/1e12:6.1f} TOP/s")
    print(f"conv3x3 128ch bf16 : {tb*1e3:7.3f} ms  {flops/tb/1e12:6.1f} TOP/s")

    # conv + fused requant epilogue vs conv alone (does XLA fuse well?)
    from f8net_tpu.ops.fxp import shift_requant

    fr = jax.jit(lambda x, w: shift_requant(conv(x, w, jnp.int32), 8, 5, 12, True))
    tr = steady_state_time(fr, x8, w8, iters=20)
    print(f"conv3x3 + requant  : {tr*1e3:7.3f} ms  (delta {1e3*(tr-t8):+.3f} ms)")

    # standalone requant pass over the conv-sized tensor (unfused cost)
    y32 = f8(x8, w8)
    rq = jax.jit(lambda v: shift_requant(v, 8, 5, 12, True))
    trq = steady_state_time(rq, y32, iters=20)
    print(f"standalone requant : {trq*1e3:7.3f} ms")

    # pallas GEMM on-chip check: correctness + speed vs XLA int8 matmul
    from f8net_tpu.ops.pallas_gemm import int8_gemm

    M, K, Nn = 8192, 1024, 1024
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (K, Nn)), jnp.int8)
    bias = jnp.zeros((Nn,), jnp.int32)
    try:
        g = jax.jit(lambda a, b: int8_gemm(a, b, bias, epilogue="int32", interpret=False))
        y_pal = g(a8, b8)
        y_ref = jnp.matmul(a8.astype(jnp.int32), b8.astype(jnp.int32))
        ok = bool(jnp.array_equal(y_pal, y_ref))
        tg = steady_state_time(g, a8, b8, iters=20)
        fl = 2 * M * K * Nn
        print(f"pallas int8 gemm   : {tg*1e3:7.3f} ms  {fl/tg/1e12:6.1f} TOP/s  exact={ok}")
        xm = jax.jit(lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.int32))
        tm = steady_state_time(xm, a8, b8, iters=20)
        print(f"xla    int8 matmul : {tm*1e3:7.3f} ms  {fl/tm/1e12:6.1f} TOP/s")
    except Exception as e:
        print("pallas on-chip FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
