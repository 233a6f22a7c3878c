"""Pallas TPU kernel: FUSED MobileNetV2 inverted-residual block.

expand(1x1) -> ReLU-absorbing requant -> depthwise(3x3, stride 1) ->
requant -> project(1x1) [-> aligned residual add] in ONE kernel, keeping
the 6x expanded activation entirely in VMEM.

Why (round-5 MBv2 attribution, docs/BENCHMARKS.md): the per-layer engine
crosses HBM four times per block with the expanded tensor (expand-out
write, dw read, dw write, project read) -- ~3.3 MB/image summed over the
zoo model's blocks, ~4 ms of pure HBM time in an 11.9 ms b256 batch.  All
prior Pallas negatives in this repo were PER-LAYER kernels whose win had to
come from Mosaic matmul quality beating XLA's (it doesn't); this kernel's
win is traffic elimination, which per-layer XLA cannot express because XLA
never fuses conv->conv.

Layout: everything stays 2-D (rows = N*H*W in image-major raster order,
lanes = channels) -- Mosaic rejects 4-D shape casts on unaligned sublanes
(tpu.reshape (4,14,14,96)->(784,96): "unsupported shape cast"), so the
depthwise stage runs as 9 shifted-ROW slices of the zero-padded flat
tensor, with iota-derived row/column validity masks standing in for
spatial zero padding.  A tap at offset (dy,dx) is a row shift of dy*W+dx;
rows whose y+dy / x+dx fall outside the image are masked to zero, which
also kills cross-image contamination at raster boundaries.

Numerics: identical to the per-layer engine path, junction by junction --
  * expand: s8 x s8 -> s32 dot + zp-compensated bias (caller precomputes),
  * requant: static-shift round-half-to-even + clamp (= shift_requant /
    the f32 epilogue it is provably equal to under the bound proof;
    fix_quant_ops.py:90-114 semantics),
  * ReLU absorbed by the unsigned clamp (engine pack_for),
  * depthwise: exact integer accumulation in f32 on the UNPACKED grid
    values (0..255, exact in bf16 operands; products <= 255*127 and <= 25
    taps keep |acc| < 2^22 -- f32-exact) with zero-point-0 padding and the
    plain bias -- the same exact integers as the engine's packed s8 + b_zp
    form,
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

# VMEM working-set guard (bytes): the estimate below tracks the compiler's
# scoped-stack report (16.90 MB measured vs 17.2 MB estimated at the
# 56^2x144 block), so the budget can sit near the 16 MB hardware limit
VMEM_BUDGET = 14 * 2**20


# slab-iteration temporaries + model slack, calibrated against the
# compiler's scoped-stack reports (observed actual-minus-linear-terms up to
# ~6.5 MB: 16.29 MB at 6272 rows x 144 ch bf16-out where the linear terms
# said 9.6 MB)
SLAB_OVERHEAD = 6_700_000


def _rup(c: int) -> int:
    """Mosaic pads the lane (minor) dimension to 128: a 24-channel int32
    window occupies 128 lanes of VMEM.  This padding -- doubled again by
    the pipeline's double buffering -- dominated the measured stack
    (16.90 MB at 56^2 x 144, cout 24: the int32 carry+out windows alone
    were ~12.8 MB)."""
    return -(-c // 128) * 128


def per_row_bytes(
    cin: int, ce: int, cout: int, carry_bytes: int, out_bytes: int
) -> int:
    """Per-row VMEM bytes: double-buffered lane-padded in/out windows +
    the two expanded-activation scratch buffers (bf16 window + s8 packed).
    carry_bytes: 0 no residual, 1 packed s8 (int8-boundary), 4 int32
    (strict); out_bytes: 1 s8 / 2 bf16 / 4 int32."""
    return (
        2 * _rup(cin)
        + 3 * _rup(ce)
        + 2 * carry_bytes * _rup(cout)
        + 2 * out_bytes * _rup(cout)
    )


def est_vmem_bytes(rows: int, cin: int, ce: int, cout: int,
                   carry_bytes: int = 4, out_bytes: int = 4) -> int:
    return rows * per_row_bytes(cin, ce, cout, carry_bytes, out_bytes) + SLAB_OVERHEAD


def _ce_chunks(ce: int, step: int = 128):
    """Lane-aligned channel chunks: 128-lane steps plus a tail."""
    return [(c0, min(c0 + step, ce)) for c0 in range(0, ce, step)]


def _row_slabs(rows: int, target: int = 512):
    """Static row slabs, each a multiple of 32 sublanes, ~target rows: the
    Mosaic scoped-stack cost is (per-iteration temporaries) x (slab rows) x
    (chunk lanes), so slabbing bounds it independently of the block size."""
    if rows <= target:
        return [(0, rows)]
    units = rows // 32
    n_slabs = max(1, (rows + target - 1) // target)
    base, extra = divmod(units, n_slabs)
    out, start = [], 0
    for i in range(n_slabs):
        size = (base + (1 if i < extra else 0)) * 32
        out.append((start, size))
        start += size
    return out


def _ir_kernel(
    x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, carry_ref, o_ref,
    dpad_ref, pin_ref,
    *,
    h: int, w: int, kh: int, kw: int, pad: int,
    net1: int, dw_in_signed: bool,
    net2: int, proj_in_signed: bool,
    out: str, net_out: int, out_signed: bool,
    shift_res: int, shift_carry: int, out_fl: int,
    carry_add_offset: int = 0,
):
    rows, cin = x_ref.shape
    ce = wd_ref.shape[1]
    P = pad * w + pad  # max |row shift|

    # The whole expanded activation lives ONLY in the two VMEM scratch
    # buffers (dpad_ref bf16, pin_ref int8); every dense temporary is
    # chunked to <=128 lanes so the compiler's scoped stack stays small
    # (the single-expression form allocated 19.7 MB at 1568x576 and OOMed
    # the 16 MB VMEM stack).
    dpad_ref[0:P, :] = jnp.zeros((P, ce), jnp.bfloat16)
    dpad_ref[P + rows :, :] = jnp.zeros((P, ce), jnp.bfloat16)

    for s0, sn in _row_slabs(rows):
        for c0, c1 in _ce_chunks(ce):
            # ---- expand slab x chunk: s8 dot -> s32 + bias, requant ----
            e = jax.lax.dot_general(
                x_ref[s0 : s0 + sn, :], w1_ref[:, c0:c1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + b1_ref[:, c0:c1]
            # bf16 holds the 8-bit grid values exactly
            dpad_ref[P + s0 : P + s0 + sn, c0:c1] = _requant_i32(
                e, net1, dw_in_signed
            ).astype(jnp.bfloat16)

    for s0, sn in _row_slabs(rows):
        r_idx = s0 + jax.lax.broadcasted_iota(jnp.int32, (sn, 1), 0)
        y_idx = (r_idx // w) % h
        x_idx = r_idx % w
        for c0, c1 in _ce_chunks(ce):
            # ---- depthwise: 9 shifted-row slices with validity masks ----
            acc = jnp.zeros((sn, c1 - c0), jnp.float32)
            for ky in range(kh):
                for kx in range(kw):
                    dy, dx = ky - pad, kx - pad
                    ofs = P + s0 + dy * w + dx
                    shifted = dpad_ref[ofs : ofs + sn, c0:c1].astype(
                        jnp.float32
                    )
                    valid = (
                        (y_idx + dy >= 0) & (y_idx + dy < h)
                        & (x_idx + dx >= 0) & (x_idx + dx < w)
                    )
                    wk = wd_ref[
                        ky * kw + kx : ky * kw + kx + 1, c0:c1
                    ].astype(jnp.float32)
                    acc += jnp.where(valid, shifted * wk, 0.0)
            d = acc.astype(jnp.int32) + bd_ref[:, c0:c1]
            r2 = _requant_i32(d, net2, proj_in_signed)
            if proj_in_signed:
                pin_ref[s0 : s0 + sn, c0:c1] = r2.astype(jnp.int8)
            else:
                pin_ref[s0 : s0 + sn, c0:c1] = (r2 - 128).astype(jnp.int8)

    # ---- project 1x1 + residual + emission, per row slab (the full-rows
    # form dominated the scoped stack: 16.9 MB at 6272x144, OOM) ----
    for s0, sn in _row_slabs(rows):
        y = jax.lax.dot_general(
            pin_ref[s0 : s0 + sn, :], w2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) + b2_ref[:]
        if carry_ref is not None:
            # packed 1-byte carries (int8-boundary rung) widen exactly to
            # their int32 grid value in-register: s8 [+128 for unsigned
            # grids] (engine _widen semantics)
            cw = carry_ref[s0 : s0 + sn, :].astype(jnp.int32)
            if carry_add_offset:
                cw = cw + carry_add_offset
            y = jnp.clip(
                (y << shift_res) + (cw << shift_carry),
                -INT32_MAX, INT32_MAX,
            )
        if out == "int32":
            o_ref[s0 : s0 + sn, :] = y
        elif out == "requant8":
            r = _requant_i32(y, net_out, out_signed)
            if not out_signed:
                r = r - 128
            o_ref[s0 : s0 + sn, :] = r.astype(jnp.int8)
        elif out == "bf16":
            o_ref[s0 : s0 + sn, :] = (
                y.astype(jnp.float32) * float(2.0**-out_fl)
            ).astype(jnp.bfloat16)
        else:
            raise NotImplementedError(out)


def _ir_kernel_nocarry(
    x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, o_ref,
    dpad_ref, pin_ref, **kw
):
    _ir_kernel(
        x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, None, o_ref,
        dpad_ref, pin_ref, **kw,
    )


def pick_bn_tile(n: int, hw: int, per_row_bytes: int) -> int:
    """Largest images-per-block bn with bn*hw a multiple of 32 sublanes
    (int8 tile) and the VMEM estimate under budget; 0 = ineligible."""
    for bn in (32, 16, 8, 4, 2, 1):
        if n % bn or (bn * hw) % 32:
            continue
        if bn * hw * per_row_bytes + SLAB_OVERHEAD <= VMEM_BUDGET:
            return bn
    return 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "pad", "net1", "dw_in_signed", "net2", "proj_in_signed",
        "out", "net_out", "out_signed", "shift_res", "shift_carry",
        "out_fl", "bn_tile", "carry_add_offset", "interpret",
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
    carry: Optional[jnp.ndarray] = None,  # (N,H,W,Cout) int32 residual
    *,
    h: int, w: int,
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
    carry_add_offset: int = 0,
    bn_tile: int = 4,
    interpret: Optional[bool] = None,
):
    n = x8.shape[0]
    cin = x8.shape[-1]
    kh, kw, ce = wd.shape
    cout = w2.shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    hw = h * w
    bn = bn_tile
    assert n % bn == 0 and (bn * hw) % 32 == 0, (n, bn, hw)
    rows_blk = bn * hw
    grid = (n // bn,)

    x2 = x8.reshape(n * hw, cin)  # XLA-side reshape: free
    wd2 = wd.reshape(kh * kw, ce)
    odt = {"int32": jnp.int32, "requant8": jnp.int8, "bf16": jnp.bfloat16}[out]

    in_specs = [
        pl.BlockSpec((rows_blk, cin), lambda i: (i, 0)),
        pl.BlockSpec((cin, ce), lambda i: (0, 0)),
        pl.BlockSpec((1, ce), lambda i: (0, 0)),
        pl.BlockSpec((kh * kw, ce), lambda i: (0, 0)),
        pl.BlockSpec((1, ce), lambda i: (0, 0)),
        pl.BlockSpec((ce, cout), lambda i: (0, 0)),
        pl.BlockSpec((1, cout), lambda i: (0, 0)),
    ]
    args = [x2, w1, b1.astype(jnp.int32).reshape(1, ce), wd2,
            bd.astype(jnp.int32).reshape(1, ce), w2,
            b2.astype(jnp.int32).reshape(1, cout)]
    if carry is not None:
        in_specs.append(pl.BlockSpec((rows_blk, cout), lambda i: (i, 0)))
        args.append(carry.reshape(n * hw, cout))

    kern = functools.partial(
        _ir_kernel if carry is not None else _ir_kernel_nocarry,
        h=h, w=w, kh=kh, kw=kw, pad=pad,
        net1=net1, dw_in_signed=dw_in_signed,
        net2=net2, proj_in_signed=proj_in_signed,
        out=out, net_out=net_out, out_signed=out_signed,
        shift_res=shift_res, shift_carry=shift_carry, out_fl=out_fl,
        carry_add_offset=carry_add_offset,
    )
    pad_rows = pad * w + pad
    y2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows_blk, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * hw, cout), odt),
        scratch_shapes=[
            pltpu.VMEM((rows_blk + 2 * pad_rows, ce), jnp.bfloat16),
            pltpu.VMEM((rows_blk, ce), jnp.int8),
        ],
        interpret=interpret,
    )(*args)
    return y2.reshape(n, h, w, cout)
