"""On-chip probe of the Pallas conv kernel impl variants.

For each impl (i8flat / i32flat / bf16 / rows): does Mosaic compile it, is
it bit-exact vs the XLA int conv, and how fast at a big mid-network shape.
One process, results printed incrementally (stdout unbuffered via flush).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from f8net_tpu.ops.pallas_conv import pallas_conv_int8


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    N, H, W, C, O, K = 1024, 28, 28, 128, 128, 3
    x = jnp.asarray(rng.randint(-127, 128, (N, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.randint(-20, 21, (K, K, C, O)), jnp.int8)
    b = jnp.asarray(rng.randint(-100, 100, (O,)), jnp.int32)
    flops = 2.0 * N * H * W * C * O * K * K

    ref = lax.conv_general_dilated(
        x.astype(jnp.int32), w.astype(jnp.int32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32,
    ) + b
    t_x = timeit(
        jax.jit(
            lambda xx, ww: lax.conv_general_dilated(
                xx, ww.astype(jnp.int32), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ) + b
        ),
        x.astype(jnp.int32),
        w,
    )
    print(f"xla int conv      : {t_x*1e3:8.3f} ms  {flops/t_x/1e12:6.1f} TOP/s", flush=True)

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    t_b = timeit(
        jax.jit(
            lambda xx, ww: lax.conv_general_dilated(
                xx, ww, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        ),
        xb,
        wb,
    )
    print(f"xla bf16 conv     : {t_b*1e3:8.3f} ms  {flops/t_b/1e12:6.1f} TOP/s", flush=True)

    for impl in ("bigk", "rows"):
        for boh in (16, 8, 4):
            try:
                f = jax.jit(
                    lambda xx, ww, bb, _impl=impl, _boh=boh: pallas_conv_int8(
                        xx, ww, bb, stride=1, padding=1, impl=_impl, boh=_boh,
                        interpret=False,
                    )
                )
                y = f(x, w, b)
                ok = bool(jnp.array_equal(y, ref))
                t = timeit(f, x, w, b)
                print(
                    f"pallas {impl:8s} boh{boh}: {t*1e3:8.3f} ms  "
                    f"{flops/t/1e12:6.1f} TOP/s  exact={ok}",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                print(f"pallas {impl:8s} boh{boh}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
