"""Pallas TPU kernel: int8 2-D convolution as implicit GEMM with a fused
bias + shift-requant epilogue.

The conv is decomposed into kh*kw shifted (M, C) x (C, O) MXU GEMMs
accumulating into a VMEM int32 tile (M = a block of output rows x full
output width), so no im2col buffer ever exists in HBM.  The epilogue adds
the int32 bias, optionally ReLUs, and performs the exact round-half-to-even
shift requantization with a compile-time-constant shift, emitting int8 --
activations between layers live in HBM at 1 byte/element.

Halo handling without manual DMA: the input is passed twice with block
index maps i and i+1 (clamped), giving the kernel two vertically adjacent
row-blocks; the tail rows of the window read from the second block.  This
keeps the standard Pallas prefetch pipeline at the cost of re-fetching
input rows once (int8 input traffic is small next to weights/outputs).

Scope (v1): groups == 1, stride in {1, 2}, square kernels; depthwise convs
take the exact-f32 XLA path and the 3-channel head conv stays on XLA.
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


def _patch_dot(patch, wk, impl: str, c: int):
    """(BOH, OW, C) x (C, BO) -> (BOH, OW, BO), exact int32.

    impl variants exist because Mosaic's layout inference restricts reshapes
    of narrow dtypes (vector<8x14xNxi8> -> vector<112xNxi8> is rejected):
      'i8flat'  -- int8 reshape + int8 dot (fastest where supported)
      'i32flat' -- cast to int32 before the flatten
      'bf16'    -- bf16 dot accumulated in f32 then cast back; exact because
                   each per-tap dot contracts only C <= 1024 channels
                   (|acc| <= 1024*128*127 < 2^24)
      'rows'    -- per-output-row 2-D dots (no 3-D reshape at all)
    """
    boh, ow, _ = patch.shape
    if impl == "i8flat":
        return jax.lax.dot_general(
            patch.reshape(boh * ow, c),
            wk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(boh, ow, -1)
    if impl == "i32flat":
        return jax.lax.dot_general(
            patch.astype(jnp.int32).reshape(boh * ow, c),
            wk.astype(jnp.int32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(boh, ow, -1)
    if impl == "bf16":
        # per-chunk f32 accumulators stay below 2^24 (1024*128*127 < 2^24),
        # so casting back to int32 per chunk keeps the result exact
        total = None
        flat = patch.reshape(boh * ow, c) if patch.ndim == 3 else patch
        for c0 in range(0, c, 1024):
            c1 = min(c0 + 1024, c)
            y = jax.lax.dot_general(
                flat[:, c0:c1].astype(jnp.bfloat16),
                wk[c0:c1].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            total = y if total is None else total + y
        return total.reshape(boh, ow, -1)
    if impl == "rows":
        outs = []
        for r in range(boh):
            outs.append(
                jax.lax.dot_general(
                    patch[r],
                    wk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            )
        return jnp.stack(outs, axis=0)
    raise NotImplementedError(impl)


def _conv_kernel(
    xa_ref,
    xb_ref,
    w_ref,
    b_ref,
    o_ref,
    acc_ref,
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
    impl: str,
):
    win = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)  # (2*BHs, Wp, C)
    c = win.shape[-1]
    acc = jnp.zeros((boh, ow, acc_ref.shape[-1]), jnp.int32)
    for ky in range(kh):
        for kx in range(kw):
            patch = jax.lax.slice(
                win,
                (ky, kx, 0),
                (ky + (boh - 1) * stride + 1, kx + (ow - 1) * stride + 1, c),
                (stride, stride, 1),
            )  # (BOH, OW, C)
            acc += _patch_dot(patch, w_ref[ky, kx], impl, c)
    acc_ref[:] = acc
    out = acc + b_ref[:].reshape(1, 1, -1)
    if relu:
        out = jnp.maximum(out, 0)
    if epilogue == "requant8":
        r = _requant_i32(out, net, out_signed)
        if not out_signed:
            r = r - 128
        o_ref[0] = r.astype(jnp.int8)
    else:
        o_ref[0] = out




def _conv_kernel_bigk(
    xa_ref,
    xb_ref,
    w2_ref,
    b_ref,
    o_ref,
    patch_ref,
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
):
    """im2col-in-VMEM variant: assemble the (BOH*OW, kh*kw*C) patch matrix
    with 2-D row writes (Mosaic-friendly: no narrow-dtype 3-D reshapes),
    then one deep-K MXU GEMM against the (kh*kw*C, BO) weight matrix."""
    win = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)  # (2*BHs, Wp, C)
    c = win.shape[-1]
    for ky in range(kh):
        for kx in range(kw):
            tap = ky * kw + kx
            for r in range(boh):
                row = jax.lax.slice(
                    win,
                    (ky + r * stride, kx, 0),
                    (ky + r * stride + 1, kx + (ow - 1) * stride + 1, c),
                    (1, stride, 1),
                )  # (1, OW, C)
                patch_ref[r * ow : (r + 1) * ow, tap * c : (tap + 1) * c] = row[0]
    acc = jax.lax.dot_general(
        patch_ref[:],
        w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc + b_ref[:]
    if relu:
        out = jnp.maximum(out, 0)
    if epilogue == "requant8":
        rq = _requant_i32(out, net, out_signed)
        if not out_signed:
            rq = rq - 128
        rq = rq.astype(jnp.int8)
        for r in range(boh):
            o_ref[0, r] = rq[r * ow : (r + 1) * ow]
    else:
        for r in range(boh):
            o_ref[0, r] = out[r * ow : (r + 1) * ow]


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
        "bo",
        "impl",
        "interpret",
    ),
)
def pallas_conv_int8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 0,
    pad_value: int = 0,
    epilogue: str = "int32",
    net: int = 0,
    out_signed: bool = True,
    relu: bool = False,
    boh: int = 8,
    bo: int = 128,
    impl: str = "i8flat",
    interpret: Optional[bool] = None,
):
    """y = epilogue(conv2d(x, w) + bias).

    x: int8 NHWC (zero-point-packed; pad_value is the packed zero, e.g. -128
    for unsigned activations).  w: int8 HWIO, groups == 1.  bias: int32 at
    accumulator scale (already holding any zero-point compensation).
    epilogue 'int32' -> int32 out; 'requant8' -> int8 at the consumer's
    format (net = out_fl - next_in_fl, out_signed = consumer double_side).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wdt, c = x.shape
    kh, kw, wc, o = w.shape
    assert wc == c and stride in (1, 2)
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (wdt + 2 * padding - kw) // stride + 1

    # the halo (second block) must cover the window tail: boh*stride >= kh-stride
    boh = max(min(boh, oh), -(-(kh - stride) // stride), 1)
    bo = min(bo, _round_up(o, 128))

    # pad H/W spatially, O/C to tile multiples, OH to a BOH multiple
    ohp = _round_up(oh, boh)
    bhs = boh * stride  # input rows consumed per output row-block
    # one spare input block beyond the outputs so the clamped i+1 halo block
    # always holds genuine rows (padding) rather than re-read data
    hp = (ohp // boh + 1) * bhs
    wp = (ow - 1) * stride + kw
    op_ = _round_up(o, bo)

    # stride can make the needed extent smaller than the given input: crop
    # before padding (negative pads are not a thing)
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
    if op_ != o:
        w = jnp.pad(w, [(0, 0), (0, 0), (0, 0), (0, op_ - o)])
        bias = jnp.pad(bias, (0, op_ - o))
    b2 = bias.reshape(1, op_)

    grid = (n, ohp // boh, op_ // bo)
    num_hblocks = hp // bhs

    out_dtype = jnp.int32 if epilogue == "int32" else jnp.int8
    common = dict(
        out_shape=jax.ShapeDtypeStruct((n, ohp, ow, op_), out_dtype),
        grid=grid,
        out_specs=pl.BlockSpec(
            (1, boh, ow, bo), lambda ni, i, j: (ni, i, 0, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ohp * ow * op_ * kh * kw * c,
            bytes_accessed=int(x.size + w.size + n * ohp * ow * op_),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    x_specs = [
        pl.BlockSpec(
            (1, bhs, wp, c), lambda ni, i, j: (ni, i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, bhs, wp, c),
            lambda ni, i, j, _nb=num_hblocks: (ni, jnp.minimum(i + 1, _nb - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if impl == "bigk":
        kernel = functools.partial(
            _conv_kernel_bigk,
            kh=kh, kw=kw, stride=stride, boh=boh, ow=ow,
            epilogue=epilogue, net=net, out_signed=out_signed, relu=relu,
        )
        w2 = w.reshape(kh * kw * c, op_)
        y = pl.pallas_call(
            kernel,
            in_specs=x_specs
            + [
                pl.BlockSpec(
                    (kh * kw * c, bo), lambda ni, i, j: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, bo), lambda ni, i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((boh * ow, kh * kw * c), jnp.int8)],
            **common,
        )(x, x, w2, b2)
    else:
        kernel = functools.partial(
            _conv_kernel,
            kh=kh, kw=kw, stride=stride, boh=boh, ow=ow,
            epilogue=epilogue, net=net, out_signed=out_signed, relu=relu, impl=impl,
        )
        y = pl.pallas_call(
            kernel,
            in_specs=x_specs
            + [
                pl.BlockSpec(
                    (kh, kw, c, bo), lambda ni, i, j: (0, 0, 0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, bo), lambda ni, i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((boh, ow, bo), jnp.int32)],
            **common,
        )(x, x, w, b2)
    return y[:, :oh, :, :o]
