"""Pallas TPU kernel: int8 depthwise 2-D convolution with a fused
bias + ReLU + shift-requant epilogue (VPU path).

Depthwise convs never touch the MXU (one multiply per tap per channel, no
contraction): they are VPU- and bandwidth-bound.  The int engine's default
route computes them bit-exactly in bf16 through XLA's conv emitters
(engine/int_engine.py:_conv_int exact_f32), which is fast but moves 2-byte
operands and a 4-byte accumulator through HBM.  This kernel keeps the whole
layer at 1 byte/element on the wire: int8 activations in, per-tap int32
multiply-accumulate in VMEM registers, bias + (optional) ReLU + exact
round-half-to-even shift requant fused in the epilogue, int8 out.

Reference semantics: depthwise fold + requant of
/root/reference/models/fix_quant_ops.py:380-385 (depthwise BN fold) and
:90-114 (int_op_only_fix_quant); triangulated against the same oracles as
the dense kernels (tests/test_pallas_dw.py).

Halo handling mirrors ops/pallas_conv.py: the input is passed twice with
block index maps i and min(i+1, last), so the kernel sees two vertically
adjacent row-blocks and window tails read from the second block.

Measured on the v5e (2026-08-17, docs/BENCHMARKS.md round-2 section): both
compute modes are bit-exact at every stride-1 MobileNet shape, and both
LOSE at model level (MBv2 b256: i32 4.8k, f32 4.1k vs the XLA engine's
12.3k img/s in the same session) -- Mosaic's narrow-dtype data movement and
per-step overhead cost more than the 1-byte wire saves, the same structural
result as every other Pallas route in this repo.  Kept as the non-default
`use_pallas='dw'` engine mode; the default depthwise path stays on XLA's
bf16-exact emitters (engine/int_engine.py:_conv_int exact_f32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gemm import _requant_i32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dw_kernel(
    xa_ref,
    xb_ref,
    w_ref,
    b_ref,
    o_ref,
    *,
    kh: int,
    kw: int,
    stride: int,
    boh: int,
    ow: int,
    epilogue: str,
    net: int,
    out_signed: bool,
    relu: bool,
    compute: str,
):
    win = jnp.concatenate([xa_ref[:], xb_ref[:]], axis=1)  # (BN, 2*BHs, Wp, C)
    bn, _, _, c = win.shape
    # 'f32' rides the VPU's native fma path and is exact: per-tap products
    # <= 127*128 and kh*kw <= 25 taps keep |acc| < 2^24
    adt = jnp.float32 if compute == "f32" else jnp.int32
    wall = w_ref[:].astype(adt)  # (kh*kw, C)
    acc = jnp.zeros((bn, boh, ow, c), adt)
    for ky in range(kh):
        for kx in range(kw):
            patch = jax.lax.slice(
                win,
                (0, ky, kx, 0),
                (bn, ky + (boh - 1) * stride + 1, kx + (ow - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )  # (BN, BOH, OW, C)
            wk = jax.lax.slice(wall, (ky * kw + kx, 0), (ky * kw + kx + 1, c))
            acc += patch.astype(adt) * wk.reshape(1, 1, 1, c)
    out = acc.astype(jnp.int32) + b_ref[:].reshape(1, 1, 1, c)
    if relu:
        out = jnp.maximum(out, 0)
    if epilogue == "requant8":
        r = _requant_i32(out, net, out_signed)
        if not out_signed:
            r = r - 128
        o_ref[:] = r.astype(jnp.int8)
    else:
        o_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride",
        "padding",
        "pad_value",
        "epilogue",
        "net",
        "out_signed",
        "relu",
        "boh",
        "bn",
        "compute",
        "interpret",
    ),
)
def pallas_depthwise_int8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 1,
    pad_value: int = 0,
    epilogue: str = "int32",
    net: int = 0,
    out_signed: bool = True,
    relu: bool = False,
    boh: int = 8,
    bn: int = 0,
    compute: str = "i32",
    interpret: Optional[bool] = None,
):
    """y = epilogue(depthwise_conv2d(x, w) + bias).

    x: int8 NHWC (zero-point-packed; pad_value is the packed zero, -128 for
    unsigned activations).  w: int8 HWIO with I == 1 (groups == C), i.e.
    shape (kh, kw, 1, C).  bias: int32 (C,) at accumulator scale, already
    holding any zero-point compensation 128*sum_taps(w).
    epilogue 'int32' -> int32 out; 'requant8' -> int8 at the consumer's
    format (net = out_fl - next_in_fl, out_signed = consumer double_side).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wdt, c = x.shape
    kh, kw, wi, o = w.shape
    assert wi == 1 and o == c, "depthwise expects HWIO weights (kh, kw, 1, C)"
    # stride 2 lowers through vector.extract_strided_slice, which Mosaic
    # verifies to stride 1 -- compiled TPU execution supports stride 1 only
    # (interpret mode accepts both; the engine routes stride-2 depthwise to
    # the XLA exact-f32 path)
    assert stride in (1, 2)
    assert stride == 1 or interpret, "stride-2 unsupported on compiled TPU (Mosaic)"
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (wdt + 2 * padding - kw) // stride + 1

    # halo coverage: the second block must hold the window tail
    boh = max(min(boh, oh), -(-(kh - stride) // stride), 1)
    if bn <= 0:
        # keep each grid step's output around >= 64k lanes of work without
        # exceeding a ~2 MB int32 accumulator (c counts its lane padding:
        # VMEM tiles pad the minor dim to 128)
        cp = _round_up(c, 128)
        bn = max(1, min(n, (1 << 19) // max(1, boh * ow * cp)))
    bn = min(bn, n)
    while n % bn:
        bn -= 1

    ohp = _round_up(oh, boh)
    bhs = boh * stride
    # one spare input block beyond the outputs so the clamped i+1 halo block
    # holds genuine rows (padding), never re-read data
    hp = (ohp // boh + 1) * bhs
    wp = (ow - 1) * stride + kw

    if wp - padding < wdt:
        x = x[:, :, : wp - padding, :]
        wdt = wp - padding
    if hp - padding < h:
        x = x[:, : hp - padding, :, :]
        h = hp - padding

    x = jnp.pad(
        x,
        [(0, 0), (padding, hp - h - padding), (padding, wp - wdt - padding), (0, 0)],
        constant_values=jnp.int8(pad_value),
    )
    w2 = w.reshape(kh * kw, c)
    b2 = bias.reshape(1, c).astype(jnp.int32)

    grid = (n // bn, ohp // boh)
    num_hblocks = hp // bhs
    out_dtype = jnp.int32 if epilogue == "int32" else jnp.int8

    assert compute in ("f32", "i32")
    if compute == "f32":
        # exactness bound: |per-tap product| * taps < 2^24
        assert kh * kw * 128 * 127 < (1 << 24), (kh, kw)
    kernel = functools.partial(
        _dw_kernel,
        kh=kh, kw=kw, stride=stride, boh=boh, ow=ow,
        epilogue=epilogue, net=net, out_signed=out_signed, relu=relu,
        compute=compute,
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ohp, ow, c), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bn, bhs, wp, c), lambda ni, i: (ni, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bn, bhs, wp, c),
                lambda ni, i, _nb=num_hblocks: (ni, jnp.minimum(i + 1, _nb - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((kh * kw, c), lambda ni, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ni, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, boh, ow, c), lambda ni, i: (ni, i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ohp * ow * c * kh * kw,
            bytes_accessed=int(x.size + w2.size + n * ohp * ow * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w2, b2)
    return y[:, :oh, :, :]
