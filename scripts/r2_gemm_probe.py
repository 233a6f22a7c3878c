"""Round-2 GEMM diagnosis: where does the Pallas deficit come from?

Round 1 established XLA s8 GEMM ~335 TOP/s vs Pallas ~155 at K=4096, but the
dot-dtype elimination was a contaminated whole-model A/B.  This probe times
each variant in isolation with long data-dependent chains (marginal cost of
extra links cancels the axon dispatch floor; inputs re-randomized per rep so
the relay cannot replay), across three shape classes:

  S1  8192x4096x4096   compute ceiling (big square)
  S2  100352x576x576   ResNet-ish mid shape (M-heavy, K medium)
  S3  100352x128x128   small-K extreme (MobileNet 1x1-like)

Variants: XLA s8 / XLA bf16 / Pallas s8 (two tilings) / Pallas chunked-bf16
dots (exact for 8-bit operands) / Pallas pure-bf16 (no int anywhere --
isolates Mosaic codegen from integer semantics).

Usage: python scripts/r2_gemm_probe.py [--short N] [--long N] [--reps N]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from f8net_tpu.ops.fxp import shift_requant
from f8net_tpu.ops.pallas_gemm import int8_gemm


# ---- pure-bf16 Pallas matmul (no integers anywhere) -------------------------

def _bf16_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_tiles: int, scale: float):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _done():
        o_ref[:] = jnp.clip(acc_ref[:] * scale, -100.0, 100.0).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "scale"))
def bf16_gemm(x, w, *, bm=512, bn=512, bk=512, scale=1.0):
    M, K = x.shape
    _, N = w.shape
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    k_tiles = K // bk
    return pl.pallas_call(
        functools.partial(_bf16_kernel, k_tiles=k_tiles, scale=scale),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=(M // bm, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=M * K * 2 + K * N * 2 + M * N * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, w)


# ---- chain builders ---------------------------------------------------------

def chain_xla_s8(nlinks, b):
    def f(x, w):
        v = x
        for _ in range(nlinks):
            y = jnp.matmul(v, w, preferred_element_type=jnp.int32)
            v = shift_requant(y, 8, 4, 10, True).astype(jnp.int8)
        return v
    return jax.jit(f)


def chain_xla_bf16(nlinks, scale):
    def f(x, w):
        v = x
        for _ in range(nlinks):
            y = jnp.matmul(v, w, preferred_element_type=jnp.float32)
            v = jnp.clip(y * scale, -100.0, 100.0).astype(jnp.bfloat16)
        return v
    return jax.jit(f)


def chain_pal_s8(nlinks, b, bm, bn, bk, dot_impl):
    def f(x, w):
        v = x
        for _ in range(nlinks):
            v = int8_gemm(
                v, w, b, epilogue="requant8", net=6, out_signed=True,
                bm=bm, bn=bn, bk=bk, dot_impl=dot_impl,
            )
        return v
    return jax.jit(f)


def chain_pal_bf16(nlinks, scale, bm, bn, bk):
    def f(x, w):
        v = x
        for _ in range(nlinks):
            v = bf16_gemm(v, w, bm=bm, bn=bn, bk=bk, scale=scale)
        return v
    return jax.jit(f)


# ---- measurement ------------------------------------------------------------

def measure(name, mk_chain, mk_inputs, n_short, n_long, reps, flops_per_link):
    try:
        f_s = mk_chain(n_short)
        f_l = mk_chain(n_long)
        deltas = []
        for r in range(reps):
            args = mk_inputs(r)
            jax.block_until_ready(f_s(*args))
            jax.block_until_ready(f_l(*args))
            t0 = time.perf_counter()
            jax.block_until_ready(f_s(*args))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f_l(*args))
            tl = time.perf_counter() - t0
            deltas.append((tl - ts) / (n_long - n_short))
        t = float(np.median(deltas))
        tops = flops_per_link / t / 1e12
        print(f"  {name:24s}: {t*1e3:8.4f} ms/link  {tops:7.1f} TOP/s   "
              f"(reps {['%.4f' % (d*1e3) for d in deltas]})", flush=True)
        return {"name": name, "ms_per_link": t * 1e3, "tops": tops}
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  {name:24s}: FAILED {type(e).__name__}: {msg}", flush=True)
        return {"name": name, "error": msg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=4)
    ap.add_argument("--long", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="results/r2_gemm_probe.jsonl")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    outf = open(args.out, "a")

    shapes = [
        ("S1", 8192, 4096, [(512, 512, 512), (1024, 512, 1024)]),
        ("S2", 100352, 576, [(512, 576, 576), (2048, 576, 576)]),
        ("S3", 100352, 128, [(512, 128, 128), (2048, 128, 128)]),
    ]
    rng = np.random.RandomState(0)
    for tag, M, K, tiles in shapes:
        N = K
        fl = 2.0 * M * K * N
        print(f"== {tag}: M={M} K={K} N={N} ({fl/1e9:.1f} GFLOP/link) ==", flush=True)
        w8 = jnp.asarray(rng.randint(-15, 16, (K, N)), jnp.int8)
        wb = w8.astype(jnp.bfloat16)
        b = jnp.zeros((N,), jnp.int32)
        scale = 1.0 / np.sqrt(K) / 8.0

        xs8 = [jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8) for _ in range(args.reps)]
        xsb = [x.astype(jnp.bfloat16) * 0.05 for x in xs8]

        def mk_in8(r):
            return xs8[r], w8

        def mk_inb(r):
            return xsb[r], wb

        results = []
        results.append(measure(
            "xla_s8", lambda n: chain_xla_s8(n, b), mk_in8,
            args.short, args.long, args.reps, fl))
        results.append(measure(
            "xla_bf16", lambda n: chain_xla_bf16(n, scale), mk_inb,
            args.short, args.long, args.reps, fl))
        for (bm, bn, bk) in tiles:
            results.append(measure(
                f"pal_s8_{bm}x{bn}x{bk}",
                lambda n, _t=(bm, bn, bk): chain_pal_s8(n, b, *_t, "s8"), mk_in8,
                args.short, args.long, args.reps, fl))
        bm, bn, bk = tiles[0]
        results.append(measure(
            f"pal_bf16dot_{bm}x{bn}x{min(bk,1024)}",
            lambda n: chain_pal_s8(n, b, bm, bn, min(bk, 1024), "bf16"), mk_in8,
            args.short, args.long, args.reps, fl))
        for (bm, bn, bk) in tiles:
            results.append(measure(
                f"pal_pure_bf16_{bm}x{bn}x{bk}",
                lambda n, _t=(bm, bn, bk): chain_pal_bf16(n, scale, *_t), mk_inb,
                args.short, args.long, args.reps, fl))
        for rj in results:
            rj.update({"shape": tag, "M": M, "K": K, "N": N})
            outf.write(json.dumps(rj) + "\n")
        outf.flush()
    print("done.", flush=True)


if __name__ == "__main__":
    main()
