"""Dispatch-floor-free conv probe.

The axon tunnel adds ~1.5-2 ms per jitted call, so single-op microbenches
are meaningless.  This probe chains K identical layers inside ONE jit and
reports per-layer time, isolating real kernel throughput:

  * int8 conv -> +bias -> shift-requant -> pack int8   (engine layer)
  * bf16 conv -> +bias -> relu                          (baseline layer)

across representative ResNet/MobileNet shapes, plus the int8-vs-bf16 big
GEMM inside a scan.  python scripts/tpu_conv_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from f8net_tpu.ops.fxp import shift_requant

K = 16  # chained layers


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def conv(x, w, pt):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pt,
    )


def chain_int8(x8, w8, b):
    def layer(v, _):
        y = conv(v, w8, jnp.int32) + b
        v = shift_requant(y, 8, 5, 12, True).astype(jnp.int8)
        return v, ()

    out, _ = lax.scan(layer, x8, None, length=K)
    return out


def chain_bf16(xb, wb, bb):
    def layer(v, _):
        y = conv(v, wb, jnp.float32) + bb
        return jax.nn.relu(y).astype(jnp.bfloat16), ()

    out, _ = lax.scan(layer, xb, None, length=K)
    return out


def main():
    print("devices:", jax.devices(), f"chain K={K}")
    rng = np.random.RandomState(0)
    shapes = [
        # (N, H, W, C, O, kh)
        (256, 56, 56, 64, 64, 3),
        (256, 28, 28, 128, 128, 3),
        (256, 14, 14, 256, 256, 3),
        (256, 14, 14, 576, 576, 1),  # mbv2-esque 1x1
        (1024, 14, 14, 256, 256, 3),
    ]
    for (N, H, W, C, O, k) in shapes:
        assert C == O
        x8 = jnp.asarray(rng.randint(-127, 128, (N, H, W, C)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-20, 21, (k, k, C, O)), jnp.int8)
        b = jnp.asarray(rng.randint(-100, 100, (O,)), jnp.int32)
        f_i = jax.jit(chain_int8)
        t_i = timeit(f_i, x8, w8, b) / K
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        bb = b.astype(jnp.float32)
        f_b = jax.jit(chain_bf16)
        t_b = timeit(f_b, xb, wb, bb) / K
        fl = 2.0 * N * H * W * C * O * k * k
        print(
            f"N{N} {H}x{W}x{C} k{k}: int8 {t_i*1e3:7.3f} ms/layer {fl/t_i/1e12:6.1f} TOP/s"
            f" | bf16 {t_b*1e3:7.3f} ms/layer {fl/t_b/1e12:6.1f} TOP/s"
            f" | ratio {t_b/t_i:５.2f}" .replace("５", "")
        )

    # big GEMM scan
    M, Kd, Nd = 8192, 2048, 2048
    a8 = jnp.asarray(rng.randint(-127, 128, (M, Kd)), jnp.int8)
    g8 = jnp.asarray(rng.randint(-10, 11, (Kd, Nd)), jnp.int8)

    def gemm_chain_int8(a, w):
        def step(v, _):
            y = jnp.matmul(v, w, preferred_element_type=jnp.int32)
            return shift_requant(y, 8, 4, 10, True).astype(jnp.int8), ()

        o, _ = lax.scan(step, a, None, length=K)
        return o

    def gemm_chain_bf16(a, w):
        def step(v, _):
            y = jnp.matmul(v, w, preferred_element_type=jnp.float32)
            return jax.nn.relu(y).astype(jnp.bfloat16), ()

        o, _ = lax.scan(step, a, None, length=K)
        return o

    t_i = timeit(jax.jit(gemm_chain_int8), a8, g8) / K
    t_b = timeit(jax.jit(gemm_chain_bf16), a8.astype(jnp.bfloat16), g8.astype(jnp.bfloat16)) / K
    fl = 2.0 * M * Kd * Nd
    print(f"GEMM {M}x{Kd}x{Nd}: int8 {t_i*1e3:7.3f} ms {fl/t_i/1e12:6.1f} TOP/s"
          f" | bf16 {t_b*1e3:7.3f} ms {fl/t_b/1e12:6.1f} TOP/s | ratio {t_b/t_i:.2f}")


if __name__ == "__main__":
    main()
