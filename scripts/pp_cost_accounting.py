"""Pipeline-parallel engine cost accounting on the virtual device mesh.

The PP engine (engine/pp_engine.py) is bit-exact at any stage count; this
script gives it a performance identity without needing S real chips
(VERDICT r2 item 8):

  * per-tick ppermute wire bytes -- read from the COMPILED HLO (the
    collective-permute operand shape), cross-checked against the engine's
    own boundary-trace maximum;
  * compile-time and executable-size growth vs stage count S (every device
    compiles all S stage bodies -- this quantifies that documented cost);
  * the GPipe bubble fraction (S-1)/(M+S-1) tabulated vs microbatch count
    M (schedule math, exact -- the same table GPipe itself reports).

Runs on the virtual CPU mesh:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/pp_cost_accounting.py [model] [image_size] [--md]
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hlo_collective_permute_bytes(compiled_text: str):
    """Operand byte sizes of every collective-permute in a compiled HLO
    dump.  Returns a list of per-op byte counts (s8 elements = 1 byte)."""
    sizes = []
    for m in re.finditer(
        r"=\s*(s8|s32|u8|f32|bf16)\[([\d,]*)\][^=]*?collective-permute\(",
        compiled_text,
    ):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        itemsize = {"s8": 1, "u8": 1, "bf16": 2, "s32": 4, "f32": 4}[dt]
        sizes.append(n * itemsize)
    return sizes


def account(model_name: str, image_size: int, stage_counts, microbatch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f8net_tpu.engine.pp_engine import PPEngine, make_pipe_mesh
    from f8net_tpu.models import get_model
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_avgpool=True,
        quant_bias=True, pool_fusing=True,
    )
    model = get_model(model_name, cfg, num_classes=16, image_size=image_size)
    params, state = model.init(jax.random.PRNGKey(0))
    x0 = jnp.round(
        255 * jax.random.uniform(jax.random.PRNGKey(1), (2, image_size, image_size, 3))
    ) / 256
    _, state = model.apply(params, state, x0, mode="train")
    plan, int_params = bake_plan(model, params, state)

    rows = []
    for S in stage_counts:
        if S > len(jax.devices()):
            print(f"skip S={S}: only {len(jax.devices())} devices")
            continue
        mesh = make_pipe_mesh(S)
        eng = PPEngine(model, plan, int_params, mesh, microbatches=microbatch)
        mb = 2
        x = jnp.zeros((microbatch * mb, image_size, image_size, 3), jnp.int8)
        stream = x.reshape((microbatch, mb) + x.shape[1:])

        t0 = time.perf_counter()
        prog = eng._program(mb, x.shape[1:], x.dtype)
        lowered = prog.lower(
            jax.ShapeDtypeStruct(stream.shape, stream.dtype),
            jax.ShapeDtypeStruct(eng._pstack.shape, eng._pstack.dtype),
        )
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0

        txt = compiled.as_text()
        cp = hlo_collective_permute_bytes(txt)
        # engine's own boundary maximum (what _program pads the wire to)
        metas, _ = eng._trace_boundaries(mb, x.shape[1:], x.dtype)
        maxbytes = max(
            int(np.prod(m[0])) * np.dtype(m[1]).itemsize for m in metas[1:]
        )
        try:
            mem = compiled.memory_analysis()
            code_sz = getattr(mem, "generated_code_size_in_bytes", None)
        except Exception:
            code_sz = None
        rows.append(
            dict(
                S=S, compile_s=compile_s, hlo_chars=len(txt),
                code_bytes=code_sz, permute_ops=len(cp),
                permute_bytes=(max(cp) if cp else 0), engine_maxbytes=maxbytes,
            )
        )
        print(
            f"S={S}: compile {compile_s:.1f}s, HLO {len(txt)/1e6:.2f} MB, "
            f"code {code_sz if code_sz is not None else '?'} B, "
            f"{len(cp)} collective-permutes, wire {max(cp) if cp else 0} B/tick "
            f"(engine says {maxbytes} B)"
        )
    return rows


def bubble_table(stage_counts, ms=(2, 4, 8, 16, 32, 64)):
    rows = []
    for S in stage_counts:
        for M in ms:
            rows.append((S, M, (S - 1) / (M + S - 1)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="resnet18")
    ap.add_argument("image_size", nargs="?", type=int, default=32)
    ap.add_argument("--stages", default="2,4,8")
    ap.add_argument("--microbatch", type=int, default=8)
    ap.add_argument("--md", action="store_true", help="emit markdown tables")
    args = ap.parse_args()
    stage_counts = [int(s) for s in args.stages.split(",")]

    rows = account(args.model, args.image_size, stage_counts, args.microbatch)

    if args.md:
        print("\n| S | compile (s) | HLO (MB) | permutes | wire B/tick |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['S']} | {r['compile_s']:.1f} | {r['hlo_chars']/1e6:.2f} "
                f"| {r['permute_ops']} | {r['permute_bytes']} |"
            )
        print("\n| S | M=2 | M=4 | M=8 | M=16 | M=32 | M=64 |")
        print("|---|---|---|---|---|---|---|")
        for S in stage_counts:
            cells = [
                f"{(S-1)/(M+S-1)*100:.0f}%" for M in (2, 4, 8, 16, 32, 64)
            ]
            print(f"| {S} | " + " | ".join(cells) + " |")
    else:
        print("\nbubble fraction (S-1)/(M+S-1):")
        for S, M, f in bubble_table(stage_counts):
            print(f"  S={S:2d} M={M:3d}: {f*100:5.1f}%")


if __name__ == "__main__":
    main()
