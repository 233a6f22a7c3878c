"""Pallas TPU kernel: FUSED MobileNetV2 inverted-residual block.

expand(1x1) -> ReLU-absorbing requant -> depthwise(3x3) -> requant ->
project(1x1) [-> aligned residual add] in ONE kernel, keeping the 6x
expanded activation entirely in VMEM.

Why (round-5 MBv2 attribution, docs/BENCHMARKS.md): the per-layer engine
crosses HBM four times per block with the expanded tensor (expand-out
write, dw read, dw write, project read) -- ~3.3 MB/image summed over the
zoo model's blocks, ~4 ms of pure HBM time in an 11.9 ms b256 batch.  All
prior Pallas negatives in this repo were PER-LAYER kernels whose win had to
come from Mosaic matmul quality beating XLA's (it doesn't); this kernel's
win is traffic elimination, which per-layer XLA cannot express because XLA
never fuses conv->conv.

Numerics: identical to the per-layer engine path, junction by junction --
  * expand: s8 x s8 -> s32 dot + zp-compensated bias (caller precomputes),
  * requant: static-shift round-half-to-even + clamp (= shift_requant /
    the f32 epilogue it is provably equal to under the bound proof;
    fix_quant_ops.py:90-114 semantics),
  * ReLU absorbed by the unsigned clamp (engine pack_for),
  * depthwise: exact integer accumulation in f32 on the UNPACKED grid
    values (0..255) with zero-point-0 padding and the plain bias -- the
    same exact integers as the engine's packed s8 + b_zp form,
  * project: s8 x s8 -> s32 dot + zp-compensated bias,
  * residual: left-shift grid alignment + saturating int32 add
    (engine add_int, fix_resnet.py:40-76).

Reference block: fix_mobilenet_v2.py:20-48 (InvertedResidual).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gemm import _requant_i32

INT32_MAX = 2**31 - 1


def _ir_kernel(
    x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, carry_ref, o_ref,
    *,
    kh: int, kw: int, pad: int, stride: int,
    net1: int, dw_in_signed: bool,
    net2: int, proj_in_signed: bool,
    out: str, net_out: int, out_signed: bool,
    shift_res: int, shift_carry: int, out_fl: int,
):
    bn, h, w, cin = x_ref.shape
    ce = wd_ref.shape[1]
    cout = w2_ref.shape[1]
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (w + 2 * pad - kw) // stride + 1

    # ---- expand 1x1: s8 dot -> s32 + bias, requant onto the dw grid ----
    xm = x_ref[:].reshape(bn * h * w, cin)
    e = jax.lax.dot_general(
        xm, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + b1_ref[:]
    r1 = _requant_i32(e, net1, dw_in_signed)  # unpacked grid value
    # dw math runs on the unpacked value in f32 (exact: |acc| <= 9*255*127
    # < 2^19); zero-point of the unpacked grid is 0, so plain zero padding
    # and the plain dw bias are the engine's packed-form math exactly
    d_in = r1.astype(jnp.float32).reshape(bn, h, w, ce)

    # ---- depthwise kh x kw ----
    hp, wp = h + 2 * pad, w + 2 * pad
    zrow = jnp.zeros((bn, pad, w, ce), jnp.float32)
    zcol = jnp.zeros((bn, hp, pad, ce), jnp.float32)
    win = jnp.concatenate([zrow, d_in, zrow], axis=1)
    win = jnp.concatenate([zcol, win, zcol], axis=2)
    wall = wd_ref[:].astype(jnp.float32)  # (kh*kw, Ce)
    acc = jnp.zeros((bn, oh, ow, ce), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            patch = jax.lax.slice(
                win,
                (0, ky, kx, 0),
                (bn, ky + (oh - 1) * stride + 1, kx + (ow - 1) * stride + 1, ce),
                (1, stride, stride, 1),
            )
            wk = jax.lax.slice(wall, (ky * kw + kx, 0), (ky * kw + kx + 1, ce))
            acc += patch * wk.reshape(1, 1, 1, ce)
    d = acc.astype(jnp.int32) + bd_ref[:].reshape(1, 1, 1, ce)
    r2 = _requant_i32(d, net2, proj_in_signed)

    # ---- project 1x1: pack, s8 dot -> s32 + zp-compensated bias ----
    if proj_in_signed:
        p_in = r2.astype(jnp.int8)
    else:
        p_in = (r2 - 128).astype(jnp.int8)
    y = jax.lax.dot_general(
        p_in.reshape(bn * oh * ow, ce), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + b2_ref[:]
    y = y.reshape(bn, oh, ow, cout)

    # ---- residual + emission ----
    if carry_ref is not None:
        y = jnp.clip(
            (y << shift_res) + (carry_ref[:] << shift_carry),
            -INT32_MAX, INT32_MAX,
        )
    if out == "int32":
        o_ref[:] = y
    elif out == "requant8":
        r = _requant_i32(y, net_out, out_signed)
        if not out_signed:
            r = r - 128
        o_ref[:] = r.astype(jnp.int8)
    elif out == "bf16":
        o_ref[:] = (y.astype(jnp.float32) * float(2.0**-out_fl)).astype(
            jnp.bfloat16
        )
    else:
        raise NotImplementedError(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "pad", "net1", "dw_in_signed", "net2", "proj_in_signed",
        "out", "net_out", "out_signed", "shift_res", "shift_carry",
        "out_fl", "bn_tile", "interpret",
    ),
)
def fused_ir_block(
    x8: jnp.ndarray,          # (N,H,W,Cin) int8, packed on expand's grid
    w1: jnp.ndarray,          # (Cin,Ce) int8
    b1: jnp.ndarray,          # (Ce,) int32, zp-compensated for x8's packing
    wd: jnp.ndarray,          # (kh,kw,Ce) int8 depthwise
    bd: jnp.ndarray,          # (Ce,) int32, plain (unpacked-grid) bias
    w2: jnp.ndarray,          # (Ce,Cout) int8
    b2: jnp.ndarray,          # (Cout,) int32, zp-compensated for proj input
    carry: Optional[jnp.ndarray] = None,  # (N,OH,OW,Cout) int32 residual
    *,
    stride: int = 1,
    pad: int = 1,
    net1: int = 0,
    dw_in_signed: bool = False,
    net2: int = 0,
    proj_in_signed: bool = False,
    out: str = "int32",
    net_out: int = 0,
    out_signed: bool = False,
    shift_res: int = 0,
    shift_carry: int = 0,
    out_fl: int = 0,
    bn_tile: int = 4,
    interpret: Optional[bool] = None,
):
    n, h, w, cin = x8.shape
    kh, kw, ce = wd.shape
    cout = w2.shape[1]
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (w + 2 * pad - kw) // stride + 1
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    bn = min(bn_tile, n)
    assert n % bn == 0, (n, bn)
    grid = (n // bn,)

    wd2 = wd.reshape(kh * kw, ce)
    odt = {"int32": jnp.int32, "requant8": jnp.int8, "bf16": jnp.bfloat16}[out]

    in_specs = [
        pl.BlockSpec((bn, h, w, cin), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((cin, ce), lambda i: (0, 0)),
        pl.BlockSpec((ce,), lambda i: (0,)),
        pl.BlockSpec((kh * kw, ce), lambda i: (0, 0)),
        pl.BlockSpec((ce,), lambda i: (0,)),
        pl.BlockSpec((ce, cout), lambda i: (0, 0)),
        pl.BlockSpec((cout,), lambda i: (0,)),
    ]
    args = [x8, w1, b1.astype(jnp.int32), wd2, bd.astype(jnp.int32),
            w2, b2.astype(jnp.int32)]
    if carry is not None:
        in_specs.append(pl.BlockSpec((bn, oh, ow, cout), lambda i: (i, 0, 0, 0)))
        args.append(carry)

    kern = functools.partial(
        _ir_kernel if carry is not None else _ir_kernel_nocarry,
        kh=kh, kw=kw, pad=pad, stride=stride,
        net1=net1, dw_in_signed=dw_in_signed,
        net2=net2, proj_in_signed=proj_in_signed,
        out=out, net_out=net_out, out_signed=out_signed,
        shift_res=shift_res, shift_carry=shift_carry, out_fl=out_fl,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, oh, ow, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), odt),
        interpret=interpret,
    )(*args)


def _ir_kernel_nocarry(
    x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, o_ref, **kw
):
    _ir_kernel(
        x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, None, o_ref,
        **kw,
    )
