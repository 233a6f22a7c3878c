"""GEMM tile sweep at MobileNet-like small-K shapes, chained timing.

VERDICT (2026-08-17): inconclusive through the axon relay -- marginal link
times of 0.1-0.3 ms sit inside the ~2 ms dispatch-floor noise (negative
deltas observed).  Keep for use on directly-attached hardware; on the relay
trust only full-model timings (bench.py).

Chains requant8 GEMMs (output feeds the next call) and times the marginal
cost of extra links, cancelling the dispatch floor and any replay caching.
Compares Pallas tiles against the XLA int8 matmul chain at the same shape.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.ops.pallas_gemm import int8_gemm
from f8net_tpu.ops.fxp import shift_requant


def marginal(fn_short, fn_long, n_extra, *args):
    jax.block_until_ready(fn_short(*args))
    jax.block_until_ready(fn_long(*args))
    t0 = time.perf_counter(); jax.block_until_ready(fn_short(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(fn_long(*args)); t2 = time.perf_counter() - t0
    return (t2 - t1) / n_extra


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    for (M, K) in [(50176, 576), (12544, 1152)]:
        fl = 2.0 * M * K * K
        x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
        w = jnp.asarray(rng.randint(-15, 16, (K, K)), jnp.int8)
        b = jnp.zeros((K,), jnp.int32)

        def xla_chain(nlinks):
            def f(xx, ww):
                v = xx
                for _ in range(nlinks):
                    y = jnp.matmul(v, ww, preferred_element_type=jnp.int32)
                    v = shift_requant(y, 8, 4, 10, True).astype(jnp.int8)
                return v
            return jax.jit(f)

        t = marginal(xla_chain(4), xla_chain(16), 12, x, w)
        print(f"M{M} K{K} XLA int8+requant chain: {t*1e3:7.3f} ms/link {fl/t/1e12:6.1f} TOP/s", flush=True)

        for bm, bn in [(512, 512), (1024, 256), (2048, 128), (1024, 576 if K == 576 else 384)]:
            def pallas_chain(nlinks, _bm=bm, _bn=bn):
                def f(xx, ww):
                    v = xx
                    for _ in range(nlinks):
                        v = int8_gemm(
                            v, ww, b, epilogue="requant8", net=6, out_signed=True,
                            bm=_bm, bn=_bn, bk=2048, interpret=False,
                        )
                    return v
                return jax.jit(f)

            try:
                t = marginal(pallas_chain(4), pallas_chain(16), 12, x, w)
                print(f"M{M} K{K} pallas bm{bm} bn{bn}: {t*1e3:7.3f} ms/link {fl/t/1e12:6.1f} TOP/s", flush=True)
            except Exception as e:
                print(f"M{M} K{K} pallas bm{bm} bn{bn}: FAILED {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
