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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gemm import _requant_i32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


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
):
    win = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)  # (2*BHs, Wp, C)
    c = win.shape[-1]
    acc = jnp.zeros_like(acc_ref)
    for ky in range(kh):
        for kx in range(kw):
            patch = jax.lax.slice(
                win,
                (ky, kx, 0),
                (ky + (boh - 1) * stride + 1, kx + (ow - 1) * stride + 1, c),
                (stride, stride, 1),
            )  # (BOH, OW, C)
            acc += jax.lax.dot_general(
                patch.reshape(boh * ow, c),
                w_ref[ky, kx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    acc_ref[:] = acc
    out = acc + b_ref[:]
    if relu:
        out = jnp.maximum(out, 0)
    if epilogue == "requant8":
        r = _requant_i32(out, net, out_signed)
        if not out_signed:
            r = r - 128
        o_ref[0] = r.astype(jnp.int8).reshape(boh, ow, -1)
    else:
        o_ref[0] = out.reshape(boh, ow, -1)


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

    kernel = functools.partial(
        _conv_kernel,
        kh=kh,
        kw=kw,
        stride=stride,
        boh=boh,
        ow=ow,
        epilogue=epilogue,
        net=net,
        out_signed=out_signed,
        relu=relu,
    )
    out_dtype = jnp.int32 if epilogue == "int32" else jnp.int8
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ohp, ow, op_), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bhs, wp, c), lambda ni, i, j: (ni, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bhs, wp, c),
                lambda ni, i, j, _nb=num_hblocks: (ni, jnp.minimum(i + 1, _nb - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kh, kw, c, bo), lambda ni, i, j: (0, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, bo), lambda ni, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, boh, ow, bo), lambda ni, i, j: (ni, i, 0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((boh * ow, bo), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ohp * ow * op_ * kh * kw * c,
            bytes_accessed=int(x.size + w.size + n * ohp * ow * op_),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w, b2)
    return y[:, :oh, :, :o]
