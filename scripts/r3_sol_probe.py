"""Round-3 SoL table completion (VERDICT r2 item 4).

Two gaps in the per-kernel-class speed-of-light table:

  1. the 14x14 C=256 3x3 class never resolved ("(noise)") -- re-probe with
     LONGER chains (default 2 vs 42 links) and more reps;
  2. the 1x1 GEMM classes that dominate MobileNet time were never tabled --
     probe the square pointwise classes (56^2 C=128 ... 7^2 C=1024) and the
     narrow expand/project pairs (14^2 96<->576, 7^2 160<->960) as
     alternating two-conv links.

Method identical to r2_conv_flat_probe.py: data-dependent chained links,
marginal-cost timing (long-short)/(links), median over reps; TOP/s on valid
FLOPs.  Run with nothing else on the host.

  timeout 5400 python scripts/r3_sol_probe.py [--batch 256]
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

from f8net_tpu.ops.fxp import shift_requant


def conv_s8(v, w, b, net, k):
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        v, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ) + b
    return shift_requant(y, 8, 0, net, True).astype(jnp.int8)


def conv_bf16(v, w, scale, k):
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        v, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.clip(y * scale, -100.0, 100.0).astype(jnp.bfloat16)


def measure(name, mk_chain, inputs, n_short, n_long, reps, flops):
    """Anti-replay: every call's input is the PREVIOUS call's output (the
    chains preserve shape/dtype), so no two calls through the relay ever
    repeat identical (program, args) -- repeated identical calls get
    deduplicated/replayed and time as garbage (docs/BENCHMARKS.md
    measurement discipline)."""
    try:
        f_s = mk_chain(n_short)
        f_l = mk_chain(n_long)
        cur = inputs[0]
        step = lambda f, a: jax.block_until_ready(f(a))
        cur = step(f_s, cur)  # compile
        cur = step(f_l, cur)  # compile
        deltas = []
        for r in range(reps):
            cur = step(f_s, cur)  # warm
            t0 = time.perf_counter()
            cur = step(f_s, cur)
            ts = time.perf_counter() - t0
            cur = step(f_l, cur)  # warm
            t0 = time.perf_counter()
            cur = step(f_l, cur)
            tl = time.perf_counter() - t0
            deltas.append((tl - ts) / (n_long - n_short))
        t = float(np.median(deltas))
        spread = (max(deltas) - min(deltas)) / t
        tops = flops / t / 1e12
        print(
            f"  {name:12s}: {t*1e3:8.4f} ms/link  {tops:7.1f} TOP/s  "
            f"spread {spread*100:4.0f}%", flush=True,
        )
        return {"name": name, "ms_per_link": t * 1e3, "tops": tops,
                "spread": spread}
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  {name:12s}: FAILED {type(e).__name__}: {msg}", flush=True)
        return {"name": name, "error": msg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=2)
    ap.add_argument("--long", type=int, default=42)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="results/r3_sol_probe.jsonl")
    ap.add_argument(
        "--classes",
        default="R3,P56,P28,P14,P7,E14,E7",
    )
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    outf = open(args.out, "a")
    rng = np.random.RandomState(0)

    # (tag) -> (kind, hw, k, C, batch_mult, long_links): small shapes get
    # bigger batches + longer chains so the long-chain wall time clears the
    # relay's ~2 ms jitter by >25x (the first run's 0.05-0.6 ms/link rows
    # produced up-to-8700% spreads)
    classes = {
        "R3": ("square", 14, 3, 256, 2, 152),
        "P56": ("square", 56, 1, 128, 1, 152),
        "P28": ("square", 28, 1, 256, 1, 152),
        "P14": ("square", 14, 1, 512, 2, 152),
        "P7": ("square", 7, 1, 1024, 8, 152),
        "E14": ("pair", 14, 1, (96, 576), 2, 152),
        "E7": ("pair", 7, 1, (160, 960), 8, 152),
    }

    for tag in args.classes.split(","):
        kind, hw, k, c, bmul, long_links = classes[tag]
        n = args.batch * bmul
        n_long = max(args.long, long_links)
        net = 4
        if kind == "square":
            flops = 2.0 * n * hw * hw * k * k * c * c
            w8 = jnp.asarray(rng.randint(-15, 16, (k, k, c, c)), jnp.int8)
            b = jnp.zeros((c,), jnp.int32)
            xs = [
                jnp.asarray(rng.randint(-127, 128, (n, hw, hw, c)), jnp.int8)
                for _ in range(3)
            ]

            def mk_s8(links, w8=w8, b=b, k=k):
                def f(x):
                    v = x
                    for _ in range(links):
                        v = conv_s8(v, w8, b, net, k)
                    return v
                return jax.jit(f)

            wb = w8.astype(jnp.bfloat16)
            scale = 1.0 / (k * k * c) / 4.0

            def mk_bf(links, wb=wb, scale=scale, k=k):
                def f(x):
                    v = x
                    for _ in range(links):
                        v = conv_bf16(v, wb, scale, k)
                    return v
                return jax.jit(f)

            xbs = [x.astype(jnp.bfloat16) * 0.05 for x in xs]
        else:
            ca, cb = c
            flops = 2.0 * n * hw * hw * (ca * cb) * 2  # two convs per link
            w_up = jnp.asarray(rng.randint(-15, 16, (1, 1, ca, cb)), jnp.int8)
            w_dn = jnp.asarray(rng.randint(-15, 16, (1, 1, cb, ca)), jnp.int8)
            b_up = jnp.zeros((cb,), jnp.int32)
            b_dn = jnp.zeros((ca,), jnp.int32)
            xs = [
                jnp.asarray(rng.randint(-127, 128, (n, hw, hw, ca)), jnp.int8)
                for _ in range(3)
            ]

            def mk_s8(links, w_up=w_up, w_dn=w_dn, b_up=b_up, b_dn=b_dn):
                def f(x):
                    v = x
                    for _ in range(links):
                        v = conv_s8(v, w_up, b_up, net, 1)
                        v = conv_s8(v, w_dn, b_dn, net, 1)
                    return v
                return jax.jit(f)

            wub, wdb = w_up.astype(jnp.bfloat16), w_dn.astype(jnp.bfloat16)
            s_up, s_dn = 1.0 / ca / 4.0, 1.0 / cb / 4.0

            def mk_bf(links, wub=wub, wdb=wdb, s_up=s_up, s_dn=s_dn):
                def f(x):
                    v = x
                    for _ in range(links):
                        v = conv_bf16(v, wub, s_up, 1)
                        v = conv_bf16(v, wdb, s_dn, 1)
                    return v
                return jax.jit(f)

            xbs = [x.astype(jnp.bfloat16) * 0.05 for x in xs]

        print(
            f"== {tag}: b{n} {hw}x{hw} k{k} C={c} "
            f"({flops/1e9:.1f} GFLOP/link) ==", flush=True,
        )
        res = [
            measure("xla_s8", mk_s8, xs, args.short, n_long, args.reps, flops),
            measure("xla_bf16", mk_bf, xbs, args.short, n_long, args.reps, flops),
        ]
        for r in res:
            outf.write(json.dumps({**r, "class": tag, "n": n, "hw": hw, "k": k}) + "\n")
        outf.flush()


if __name__ == "__main__":
    main()
