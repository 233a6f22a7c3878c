"""The long-promised Mosaic/LLO dump diff (VERDICT r1 item 1 / r2 item 2).

Compile-only and relay-independent: lowers + compiles (a) the Pallas int8
GEMM v2 at the MobileNet 1x1 shape where it loses ~2.7x to XLA, and (b) an
XLA s32 convolution of the identical shape, then saves every artifact this
toolchain exposes:

  * the GEMM's Mosaic MLIR (embedded in the StableHLO custom call) --
    the kernel's vector ops, matmul shapes/layouts, DMA structure;
  * both compiled optimized HLOs (fusion structure, layouts);
  * --xla_dump_to artifacts when the backend writes them (set
    F8NET_DUMP_DIR; works for compile-only runs through the relay);
  * cost analyses.

and prints a structural comparison: Mosaic matmul op count/shapes vs the
conv's window config, operand layout notes, transposes/copies in the
kernel's inner loop.  The written artifacts in results/mosaic_diff/ are
the evidence base for the docs/BENCHMARKS.md findings section.

  F8NET_DUMP_DIR=results/mosaic_diff/xla_dump timeout 3600 \
      python scripts/mosaic_dump_diff.py [M] [K] [N]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DUMP = os.environ.get("F8NET_DUMP_DIR")
if DUMP:
    os.makedirs(DUMP, exist_ok=True)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={DUMP}"
    )

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results", "mosaic_diff",
)


def save(name, text):
    os.makedirs(OUT, exist_ok=True)
    p = os.path.join(OUT, name)
    with open(p, "w") as f:
        f.write(text)
    print(f"  wrote {p} ({len(text)/1e3:.0f} kB)")


def mosaic_module(stablehlo_text: str) -> str:
    """Extract + deserialize the Mosaic kernel module embedded in
    tpu_custom_call's backend_config: a base64 MLIR-bytecode blob
    (magic "ML\\xefR", base64 prefix "TUzvUg").  jaxlib's MLIR python
    bindings parse the bytecode once the tpu dialect is registered."""
    import base64

    m = re.search(r"(TUzvUg[A-Za-z0-9+/=]{1000,})", stablehlo_text)
    if not m:
        return ""
    raw = base64.b64decode(m.group(1))
    from jaxlib.mlir import ir
    import jaxlib.mosaic.python.tpu  # noqa: F401  (registers the tpu dialect)

    ctx = ir.Context()
    ctx.allow_unregistered_dialects = True
    return str(ir.Module.parse(raw, ctx))


def analyze_mosaic(txt: str):
    pats = {
        "tpu.matmul": r"\btpu\.matmul\b",
        "vector.transpose/tpu.transpose": r"(vector\.transpose|tpu\.transpose)",
        "tpu.memref_slice": r"tpu\.memref_slice",
        "dma (enqueue/wait)": r"tpu\.enqueue_dma|tpu\.wait_dma",
        "vector.extract_strided_slice": r"vector\.extract_strided_slice",
        "vector.shape_cast": r"vector\.shape_cast",
        "arith.extsi (widen int)": r"arith\.extsi",
        "vector.contract": r"vector\.contract",
        "tpu.iota/roll/rotate": r"tpu\.(iota|dynamic_rotate|rotate)",
    }
    out = {}
    for k, p in pats.items():
        out[k] = len(re.findall(p, txt))
    # matmul operand types: the dtype pairs fed to the MXU
    mm = re.findall(r"tpu\.matmul[^\n]*", txt)
    out["matmul_lines"] = mm[:6]
    return out


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 50176  # 256 * 14 * 14
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    print(f"shape: M={M} K={K} N={N}  backend={jax.default_backend()}")

    from f8net_tpu.ops.pallas_gemm_v2 import int8_gemm_v2

    x = jax.ShapeDtypeStruct((M, K), jnp.int8)
    w = jax.ShapeDtypeStruct((K, N), jnp.int8)
    b = jax.ShapeDtypeStruct((N,), jnp.int32)

    gfn = jax.jit(
        lambda xx, ww, bb: int8_gemm_v2(
            xx, ww, bb, epilogue="requant8", net=7, interpret=False
        )
    )
    print("lowering GEMM v2 ...")
    glow = gfn.lower(x, w, b)
    stablehlo = glow.as_text()
    save("gemm_v2_stablehlo.txt", stablehlo)
    mos = mosaic_module(stablehlo)
    save("gemm_v2_mosaic.mlir", mos or "(no mosaic module found)")
    print("compiling GEMM v2 ...")
    gcomp = glow.compile()
    save("gemm_v2_compiled_hlo.txt", gcomp.as_text())

    # the XLA conv competitor: identical contraction as a 1x1 conv on the
    # int path (s8 operands -> s32 conv, requant epilogue fused by XLA)
    HW = 14
    Bt = M // (HW * HW)

    def conv(xx, ww, bb):
        y = jax.lax.conv_general_dilated(
            xx.astype(jnp.int8),
            ww.astype(jnp.int8),
            window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ) + bb
        # the engine's fused requant epilogue shape (shift_requant net=7)
        from f8net_tpu.ops.fxp import shift_requant

        v = shift_requant(y, 8, 0, 7, True)
        return v.astype(jnp.int8)

    cx = jax.ShapeDtypeStruct((Bt, HW, HW, K), jnp.int8)
    cw = jax.ShapeDtypeStruct((1, 1, K, N), jnp.int8)
    cfn = jax.jit(conv)
    print("lowering/compiling XLA s32 conv ...")
    ccomp = cfn.lower(cx, cw, b).compile()
    save("xla_conv_compiled_hlo.txt", ccomp.as_text())

    print("\n== Mosaic kernel structure ==")
    for k, v in analyze_mosaic(mos).items():
        print(f"  {k}: {v}")

    ctxt = ccomp.as_text()
    print("\n== XLA conv compiled structure ==")
    for pat in ("convolution", "fusion", "transpose", "copy(", "bitcast"):
        print(f"  {pat}: {ctxt.count(pat)}")
    for line in ctxt.splitlines():
        if "convolution" in line and "=" in line:
            print("  " + line.strip()[:160])
            break
    # the smoking gun: the TPU backend's conv-emitter choice + window
    # schedule live in the kOutput fusion's backend_config
    for key in ("emitter", "window_config", "estimated_cycles",
                "used_scoped_memory_configs"):
        for mm in re.finditer(key + r'"?:\s*("?[^,}]*)', ctxt):
            print(f"  {key}: {mm.group(1)[:120]}")
            break
    if DUMP:
        files = sorted(os.listdir(DUMP))
        print(f"\nxla_dump_to wrote {len(files)} files")
        for f in files[:10]:
            print("  " + f)


if __name__ == "__main__":
    main()
