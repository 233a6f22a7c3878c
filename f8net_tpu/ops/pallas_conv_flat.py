"""Pallas TPU kernel: int8 KxK stride-1 conv as a flattened big-M implicit
GEMM with a fused bias + ReLU + shift-requant + pad-ring-mask epilogue.

Motivation (results/r2_gemm_probe.jsonl): on this chip the Pallas int8 GEMM
with M-major 2048-row tiles beats XLA's s32 convolutions at CNN shapes
(203 vs 177 TOP/s at K=576, 219 vs 84 at K=128) -- but only when M is large
and K/N are lane-aligned.  A 3x3 conv over C>=64 channels contracts
K = 9C >= 576, always aligned-friendly, and flattening (N, H, W) into one
M axis gives M in the millions.  This kernel exploits that:

  * The activation lives as a flat (M, C) int8 row-matrix whose rows are the
    *spatially padded* image raster: M = n * (h + 2p) * (w + 2p).  The pad
    ring holds the layer's packed zero (-128 for unsigned activations).
  * Tap (dy, dx) of the kernel window is then just the row-shifted slice
    x[m + (dy - p) * w2 + (dx - p)] -- so the conv is kh*kw shifted
    (BM, C) x (C, BN) MXU dots accumulating in registers (C >= 128), or one
    deep (BM, kh*kw*C) dot against the unrolled weights (C < 128), with no
    im2col buffer in HBM.
  * The halo is covered by prepending H = p*w2 + p zero rows in HBM (so
    tap (dy, dx) sits at nonnegative window offset dy*w2 + dx) and passing
    x twice with block maps (i, i+1): the kernel sees rows [m0, m0 + 2*bm)
    of the lead-padded raster while the taps need [m0, m0 + bm + 2H);
    valid whenever 2H <= bm.
  * Window rows that cross an image boundary belong to pad-ring output
    positions; the epilogue re-masks the ring to the *consumer's* packed
    zero, so a chain of stride-1 convs flows HBM->HBM in flat padded int8
    with zero glue ops between layers.

Reference semantics matched exactly: int8 x int8 -> int32 accumulate, int32
bias add, ReLU, round-half-to-even power-of-two requant with saturation
(fix_quant_ops.py:90-114); bit-exactness is asserted against the XLA integer
engine in tests/test_pallas_conv_flat.py.
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


def _flat_kernel(
    xa_ref,
    xb_ref,
    w_ref,
    b_ref,
    o_ref,
    *,
    taps: tuple,
    bm: int,
    c: int,
    epilogue: str,
    net: int,
    out_signed: bool,
    relu: bool,
    mask_geom: tuple,  # (w2, h2, p, m_lead) for pad-ring masking; () disables
    mask_value: int,
    use_patch: bool,
):
    win = jnp.concatenate([xa_ref[:], xb_ref[:]], axis=0)  # (2*bm, C)
    if use_patch:
        # one deep-K dot: patch (BM, kk*C) against unrolled weights
        patch = jnp.concatenate(
            [jax.lax.slice(win, (off, 0), (off + bm, c)) for off in taps], axis=1
        )
        acc = jax.lax.dot_general(
            patch,
            w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc = None
        for t, off in enumerate(taps):
            y = jax.lax.dot_general(
                jax.lax.slice(win, (off, 0), (off + bm, c)),
                w_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = y if acc is None else acc + y
    out = acc + b_ref[:]
    if relu:
        out = jnp.maximum(out, 0)
    if epilogue == "requant8":
        r = _requant_i32(out, net, out_signed)
        if not out_signed:
            r = r - 128
        out = r
    if mask_geom:
        w2, h2, p, m_lead = mask_geom
        m0 = pl.program_id(0) * bm - m_lead
        m = m0 + jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        col = jax.lax.rem(m, w2)
        row = jax.lax.rem(jax.lax.div(m, w2), h2)
        valid = (
            (col >= p) & (col < w2 - p) & (row >= p) & (row < h2 - p) & (m >= 0)
        )
        out = jnp.where(valid, out, mask_value)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "geom",
        "kernel",
        "epilogue",
        "net",
        "out_signed",
        "relu",
        "mask_pad",
        "mask_value",
        "bm",
        "bn",
        "use_patch_path",
        "interpret",
    ),
)
def conv_flat_int8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    geom: tuple,  # (n, h2, w2): x rows are the padded raster n*h2*w2
    kernel: tuple = (3, 3),
    epilogue: str = "int32",
    net: int = 0,
    out_signed: bool = True,
    relu: bool = False,
    mask_pad: bool = True,
    mask_value: int = 0,
    bm: int = 2048,
    bn: int = 256,
    use_patch_path: bool = False,
    interpret: Optional[bool] = None,
):
    """y[M, O] = epilogue(conv(x) + bias) in the same flat padded layout.

    x: (M, C) int8, M = n*h2*w2 rows of the spatially padded raster whose pad
    ring holds this layer's packed zero.  w: (kh, kw, C, O) int8.  bias:
    (O,) int32 at accumulator scale (with any zero-point compensation already
    folded).  Output rows at pad-ring positions are set to `mask_value`
    (the consumer's packed zero for requant8 chains; 0 for int32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h2, w2 = geom
    kh, kw = kernel
    p = (kh - 1) // 2
    assert (kh, kw) == (2 * p + 1, 2 * p + 1), "odd square kernels only"
    M, C = x.shape
    assert M == n * h2 * w2, (M, geom)
    wkh, wkw, wc, O = w.shape
    assert (wkh, wkw, wc) == (kh, kw, C) and bias.shape == (O,)
    assert h2 >= kh and w2 >= kw

    H = p * w2 + p  # max backward/forward row reach of the window
    bm = min(bm, _round_up(M, 256))
    bm = _round_up(max(bm, 2 * H), 256)  # halo coverage: 2H <= bm
    bn = min(bn, _round_up(O, 128))

    # Lead pad of H zero rows: out row m's tap (dy, dx) reads original row
    # m + dy*w2 + dx - H = lead-padded row m + dy*w2 + dx, so all window
    # offsets are nonnegative.  Tail pads to one spare block past Mp so the
    # i+1 map stays in bounds.  Lead/tail rows only feed windows of pad-ring
    # outputs (masked) or sliced-off rows, so zeros are fine regardless of
    # the layer's zero-point packing.
    Mp = _round_up(M, bm)
    x = jnp.pad(x, ((H, Mp + bm - H - M), (0, 0)), constant_values=jnp.int8(0))
    Ops = _round_up(O, bn)
    if Ops != O:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Ops - O)))
        bias = jnp.pad(bias, (0, Ops - O))

    taps = tuple(dy * w2 + dx for dy in range(kh) for dx in range(kw))
    # patch assembly (one deep-K dot) requires lane-aligned concat pieces;
    # Mosaic rejects 64-lane int8 concats, so the per-tap dot path is the
    # default everywhere (K = C per dot; measured fine down to K=128, and
    # K=64 costs at most a half-rate MXU on layer1-class convs)
    use_patch = use_patch_path and C % 128 == 0

    m_blocks = Mp // bm
    num_xblocks = x.shape[0] // bm

    out_dtype = jnp.int32 if epilogue == "int32" else jnp.int8
    kfn = functools.partial(
        _flat_kernel,
        taps=taps,
        bm=bm,
        c=C,
        epilogue=epilogue,
        net=net,
        out_signed=out_signed,
        relu=relu,
        mask_geom=(w2, h2, p, 0) if mask_pad else (),
        mask_value=mask_value,
        use_patch=use_patch,
    )
    if use_patch:
        w_in = w.reshape(kh * kw * C, Ops)
        w_spec = pl.BlockSpec(
            (kh * kw * C, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
    else:
        w_in = w.reshape(kh * kw, C, Ops)
        w_spec = pl.BlockSpec(
            (kh * kw, C, bn), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
        )

    y = pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((m_blocks * bm, Ops), out_dtype),
        grid=(m_blocks, Ops // bn),
        in_specs=[
            pl.BlockSpec((bm, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bm, C),
                lambda i, j, _nb=num_xblocks: (jnp.minimum(i + 1, _nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            w_spec,
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Ops * kh * kw * C,
            bytes_accessed=2 * x.size + w.size + Mp * Ops * (4 if epilogue == "int32" else 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w_in, bias.reshape(1, Ops))
    return y[:M, :O]


def pack_flat(x_nhwc: jnp.ndarray, p: int, pad_value: int):
    """NHWC int8 -> flat padded (M, C) raster + geometry."""
    n, h, w, c = x_nhwc.shape
    xp = jnp.pad(
        x_nhwc,
        ((0, 0), (p, p), (p, p), (0, 0)),
        constant_values=jnp.asarray(pad_value, x_nhwc.dtype),
    )
    h2, w2 = h + 2 * p, w + 2 * p
    return xp.reshape(n * h2 * w2, c), (n, h2, w2)


def unpack_flat(y_flat: jnp.ndarray, geom: tuple, p: int):
    """Flat padded (M, O) -> NHWC with the pad ring sliced off."""
    n, h2, w2 = geom
    y = y_flat.reshape(n, h2, w2, -1)
    if p:
        y = y[:, p:-p, p:-p, :]
    return y
