"""Round-4 SoL refresh (VERDICT r3 item 3a) + the bf16-operand conv probe.

The round-3 SoL table's 1x1 rows were measured with the INTEGER requant
epilogue the engine no longer uses.  This refresh times, per conv class:

  s8_intrq : s8->s32 conv + integer shift requant   (r3 table, control)
  s8_f32rq : s8->s32 conv + f32 requant             (the shipping engine)
  bf16op   : bf16-OPERAND conv (int8 values, exact) + f32 requant, int8 wire
             (the mxu_bf16 candidate path: same epilogue, bf16 MXU emitters)
  bf16op_w : same but the wire stays bf16 (int8-valued) -- no convert-on-load
  bf16     : plain bf16 conv + scale/clip            (the baseline's form)

Method identical to r3_sol_probe.py: data-dependent chained links (anti
replay), marginal cost of two chain lengths, median over reps.  Run with
nothing else on the host.

  timeout 7200 python scripts/r4_sol_probe.py [--batch 256]
"""

import argparse
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

from f8net_tpu.ops.fxp import shift_requant, shift_requant_f32


def _conv(v, w, k, pet):
    pad = (k - 1) // 2
    return lax.conv_general_dilated(
        v, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )


def conv_s8_intrq(v, w, b, net, k):
    y = _conv(v, w, k, jnp.int32) + b
    return shift_requant(y, 8, 0, net, True).astype(jnp.int8)


def conv_s8_f32rq(v, w, b, net, k):
    y = _conv(v, w, k, jnp.int32) + b
    return shift_requant_f32(y, 8, 0, net, True).astype(jnp.int8)


def conv_bf16op(v, w, b, net, k):
    # int8 wire: convert s8 -> bf16 at the conv input (the engine's actual
    # form when the producer packs int8), f32 accumulate, f32 requant epilogue
    y = _conv(v.astype(jnp.bfloat16), w.astype(jnp.bfloat16), k, jnp.float32)
    y = (y + b).astype(jnp.int32)
    return shift_requant_f32(y, 8, 0, net, True).astype(jnp.int8)


def conv_bf16op_w(v, w, b, net, k):
    # bf16 wire: operands arrive as int8-VALUED bf16 (|v|<=127, exact);
    # requant emits bf16 directly -- no integer dtype anywhere
    y = _conv(v, w, k, jnp.float32) + b
    r = jnp.clip(jnp.round(y * float(2.0 ** (-net))), -127, 127)
    return r.astype(jnp.bfloat16)


def conv_bf16(v, w, scale, k):
    y = _conv(v, w, k, jnp.float32)
    return jnp.clip(y * scale, -100.0, 100.0).astype(jnp.bfloat16)


def measure(name, mk_chain, inputs, n_short, n_long, reps, flops):
    try:
        f_s = mk_chain(n_short)
        f_l = mk_chain(n_long)
        cur = inputs
        step = lambda f, a: jax.block_until_ready(f(a))
        cur = step(f_s, cur)
        cur = step(f_l, cur)
        deltas = []
        for r in range(reps):
            cur = step(f_s, cur)
            t0 = time.perf_counter()
            cur = step(f_s, cur)
            ts = time.perf_counter() - t0
            cur = step(f_l, cur)
            t0 = time.perf_counter()
            cur = step(f_l, cur)
            tl = time.perf_counter() - t0
            deltas.append((tl - ts) / (n_long - n_short))
        t = float(np.median(deltas))
        spread = (max(deltas) - min(deltas)) / t if t > 0 else float("inf")
        tops = flops / t / 1e12
        print(
            f"  {name:10s}: {t*1e3:8.4f} ms/link  {tops:7.1f} TOP/s  "
            f"spread {spread*100:4.0f}%", flush=True,
        )
        return {"name": name, "ms_per_link": t * 1e3, "tops": tops,
                "spread": spread}
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  {name:10s}: FAILED {type(e).__name__}: {msg}", flush=True)
        return {"name": name, "error": msg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=2)
    ap.add_argument("--long", type=int, default=152)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="results/r4_sol_probe.jsonl")
    ap.add_argument("--classes", default="R3,P56,P28,P14,P7,E14,E7")
    ap.add_argument(
        "--variants", default="s8_intrq,s8_f32rq,bf16op,bf16op_w,bf16"
    )
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    outf = open(args.out, "a")
    rng = np.random.RandomState(0)

    classes = {
        "R3": ("square", 14, 3, 256, 2),
        "P56": ("square", 56, 1, 128, 1),
        "P28": ("square", 28, 1, 256, 1),
        "P14": ("square", 14, 1, 512, 2),
        "P7": ("square", 7, 1, 1024, 8),
        "E14": ("pair", 14, 1, (96, 576), 2),
        "E7": ("pair", 7, 1, (160, 960), 8),
        # r5 deviation controls (docs/BENCHMARKS.md SoL gate notes): the
        # same classes with MXU-lane-aligned channels / doubled K depth --
        # if these clear 90% of SoL the deficit is the channel geometry /
        # epilogue amortization, not the kernel
        "E14p128": ("pair", 14, 1, (128, 512), 2),
        "E7p128": ("pair", 7, 1, (128, 1024), 8),
        "P56c256": ("square", 56, 1, 256, 1),
    }
    net = 4
    want = args.variants.split(",")

    for tag in args.classes.split(","):
        kind, hw, k, c, bmul = classes[tag]
        n = args.batch * bmul

        if kind == "square":
            flops = 2.0 * n * hw * hw * k * k * c * c
            w8 = jnp.asarray(rng.randint(-15, 16, (k, k, c, c)), jnp.int8)
            b = jnp.zeros((c,), jnp.int32)
            x8 = jnp.asarray(rng.randint(-127, 128, (n, hw, hw, c)), jnp.int8)

            def mk(fn, wv, bv, k=k):
                def build(links):
                    def f(x):
                        v = x
                        for _ in range(links):
                            v = fn(v, wv, bv, net, k)
                        return v
                    return jax.jit(f)
                return build

            wb = w8.astype(jnp.bfloat16)
            bf = b.astype(jnp.float32)
            variants = {
                "s8_intrq": (mk(conv_s8_intrq, w8, b), x8),
                "s8_f32rq": (mk(conv_s8_f32rq, w8, b), x8),
                "bf16op": (mk(conv_bf16op, w8, b), x8),
                "bf16op_w": (mk(conv_bf16op_w, wb, bf), x8.astype(jnp.bfloat16)),
                "bf16": (
                    mk(lambda v, wv, bv, nt, kk: conv_bf16(v, wv, 1.0 / (k * k * c) / 4.0, kk), wb, bf),
                    x8.astype(jnp.bfloat16) * 0.05,
                ),
            }
        else:
            ca, cb = c
            flops = 2.0 * n * hw * hw * (ca * cb) * 2
            w_up = jnp.asarray(rng.randint(-15, 16, (1, 1, ca, cb)), jnp.int8)
            w_dn = jnp.asarray(rng.randint(-15, 16, (1, 1, cb, ca)), jnp.int8)
            b_up = jnp.zeros((cb,), jnp.int32)
            b_dn = jnp.zeros((ca,), jnp.int32)
            x8 = jnp.asarray(rng.randint(-127, 128, (n, hw, hw, ca)), jnp.int8)

            def mkp(fn, wu, wd, bu, bd):
                def build(links):
                    def f(x):
                        v = x
                        for _ in range(links):
                            v = fn(v, wu, bu, net, 1)
                            v = fn(v, wd, bd, net, 1)
                        return v
                    return jax.jit(f)
                return build

            wub, wdb = w_up.astype(jnp.bfloat16), w_dn.astype(jnp.bfloat16)
            bub, bdb = b_up.astype(jnp.float32), b_dn.astype(jnp.float32)
            variants = {
                "s8_intrq": (mkp(conv_s8_intrq, w_up, w_dn, b_up, b_dn), x8),
                "s8_f32rq": (mkp(conv_s8_f32rq, w_up, w_dn, b_up, b_dn), x8),
                "bf16op": (mkp(conv_bf16op, w_up, w_dn, b_up, b_dn), x8),
                "bf16op_w": (
                    mkp(conv_bf16op_w, wub, wdb, bub, bdb),
                    x8.astype(jnp.bfloat16),
                ),
                "bf16": (
                    mkp(
                        lambda v, wv, bv, nt, kk: conv_bf16(
                            v, wv, 1.0 / max(ca, cb) / 4.0, kk
                        ),
                        wub, wdb, bub, bdb,
                    ),
                    x8.astype(jnp.bfloat16) * 0.05,
                ),
            }

        print(
            f"== {tag}: b{n} {hw}x{hw} k{k} C={c} "
            f"({flops/1e9:.1f} GFLOP/link) ==", flush=True,
        )
        for vname in want:
            build, x0 = variants[vname]
            r = measure(vname, build, x0, args.short, args.long, args.reps, flops)
            outf.write(
                json.dumps({**r, "variant": vname, "class": tag, "n": n,
                            "hw": hw, "k": k}) + "\n"
            )
            outf.flush()


if __name__ == "__main__":
    main()
