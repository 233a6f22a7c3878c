"""On-chip A/B of the flat big-M implicit-GEMM conv vs XLA convs.

Chained data-dependent links (marginal-cost timing cancels the axon dispatch
floor; see r2_gemm_probe.py) at ResNet18's four 3x3 stride-1 body-conv shape
classes.  Variants per shape:

  xla_s8    -- the current engine path: s8 NHWC conv (compiles as an s32
               convolution) + XLA-fused shift-requant
  xla_bf16  -- the bf16 baseline's conv
  flat      -- conv_flat_int8, requant8 epilogue, ring re-mask (zero glue)

TOP/s are computed on *valid* output FLOPs only, so the flat kernel's
pad-ring waste counts against it.

Usage: python scripts/r2_conv_flat_probe.py [--short 3] [--long 9] [--reps 3]
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
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from f8net_tpu.ops.fxp import shift_requant
from f8net_tpu.ops.pallas_conv_flat import conv_flat_int8, pack_flat


def chain_xla_s8(nlinks, w8, b, net):
    def f(x):
        v = x
        for _ in range(nlinks):
            y = lax.conv_general_dilated(
                v, w8, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ) + b
            v = shift_requant(y, 8, 0, net, True).astype(jnp.int8)
        return v
    return jax.jit(f)


def chain_xla_bf16(nlinks, wb, scale):
    def f(x):
        v = x
        for _ in range(nlinks):
            y = lax.conv_general_dilated(
                v, wb, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            v = jnp.clip(y * scale, -100.0, 100.0).astype(jnp.bfloat16)
        return v
    return jax.jit(f)


def chain_flat(nlinks, w8, b, net, geom, bm):
    def f(xf):
        v = xf
        for _ in range(nlinks):
            v = conv_flat_int8(
                v, w8, b, geom=geom, epilogue="requant8", net=net,
                out_signed=True, relu=False, mask_value=0, bm=bm,
            )
        return v
    return jax.jit(f)


def measure(name, mk_chain, inputs, n_short, n_long, reps, flops):
    try:
        f_s = mk_chain(n_short)
        f_l = mk_chain(n_long)
        deltas = []
        for r in range(reps):
            a = inputs[r]
            jax.block_until_ready(f_s(a))
            jax.block_until_ready(f_l(a))
            t0 = time.perf_counter()
            jax.block_until_ready(f_s(a))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f_l(a))
            tl = time.perf_counter() - t0
            deltas.append((tl - ts) / (n_long - n_short))
        t = float(np.median(deltas))
        tops = flops / t / 1e12
        print(f"  {name:18s}: {t*1e3:8.4f} ms/link  {tops:7.1f} TOP/s  "
              f"(reps {['%.4f' % (d*1e3) for d in deltas]})", flush=True)
        return {"name": name, "ms_per_link": t * 1e3, "tops": tops}
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  {name:18s}: FAILED {type(e).__name__}: {msg}", flush=True)
        return {"name": name, "error": msg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=2)
    ap.add_argument("--long", type=int, default=22)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="results/r2_conv_flat_probe.jsonl")
    ap.add_argument("--shapes", default="R1,R2,R3,R4")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    outf = open(args.out, "a")

    all_shapes = {
        "R1": (56, 64),
        "R2": (28, 128),
        "R3": (14, 256),
        "R4": (7, 512),
    }
    rng = np.random.RandomState(0)
    n = args.batch
    for tag in args.shapes.split(","):
        hw, c = all_shapes[tag]
        flops = 2.0 * n * hw * hw * 9 * c * c
        net = 4
        print(f"== {tag}: b{n} {hw}x{hw} C={c} ({flops/1e9:.1f} GFLOP/link) ==", flush=True)
        w8 = jnp.asarray(rng.randint(-15, 16, (3, 3, c, c)), jnp.int8)
        wb = w8.astype(jnp.bfloat16)
        b = jnp.zeros((c,), jnp.int32)
        scale = 1.0 / (9 * c) / 4.0

        xs = [
            jnp.asarray(rng.randint(-127, 128, (n, hw, hw, c)), jnp.int8)
            for _ in range(args.reps)
        ]
        xbs = [x.astype(jnp.bfloat16) * 0.05 for x in xs]
        flats = [pack_flat(x, 1, 0) for x in xs]
        geom = flats[0][1]
        xfs = [f[0] for f in flats]

        res = [
            measure("xla_s8", lambda k: chain_xla_s8(k, w8, b, net), xs,
                    args.short, args.long, args.reps, flops),
            measure("xla_bf16", lambda k: chain_xla_bf16(k, wb, scale), xbs,
                    args.short, args.long, args.reps, flops),
            measure("flat_bm1024", lambda k: chain_flat(k, w8, b, net, geom, 1024),
                    xfs, args.short, args.long, args.reps, flops),
            measure("flat_bm2048", lambda k: chain_flat(k, w8, b, net, geom, 2048),
                    xfs, args.short, args.long, args.reps, flops),
        ]
        for r in res:
            outf.write(json.dumps({**r, "shape": tag, "n": n, "hw": hw, "c": c}) + "\n")
        outf.flush()


if __name__ == "__main__":
    main()
