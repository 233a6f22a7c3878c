"""Pallas TPU kernel: fused ResNet stem -- 7x7/s2 conv + bias + ReLU +
3x3/s2 maxpool -- emitting ONLY the pooled int32 activation.

Why: layer attribution (docs/BENCHMARKS.md round-2) shows the int8 engine's
entire deficit vs the bf16 baseline sits in the stem: the bit-exact residual
contract forces the head conv output and the maxpool round trip through HBM
at int32 width (~10 GB of traffic at b1024, 18.7 of ~40 ms).  Fusing the
pool into the conv's consumer writes 0.8 GB instead.

Construction (all bit-exact; integers accumulate exactly in f32):

  * space-to-depth: 7x7/s2/p3 conv over C=3 becomes a 4x4/s1 conv over 12
    channels on the (112,112) grid (engine _conv_int_s2d math).
  * column phases: s2d columns split even/odd so the stride-2 maxpool's
    x-subsampling becomes phase selection (no strided lane ops): conv cols
    2k live in the 'e' stream, 2k+1 in 'o'; pooled col px =
    max(e[px], o[px], o[px-1]).
  * implicit im2col in VMEM: for each conv row, the 4x4x12 window is a
    lane-concat of 16 (64,12) pieces -- 4 y-taps (sublane row shifts) x 4
    x-taps (which alternate between the two phase streams at column offsets
    0/1/2) -- giving a (rows*64, 192) bf16 patch against the row-major
    reshaped s2d weights (192, 64).
  * y-pool: stride-2 slices on the major (row) dim of the (57, 56, 64)
    conv block; pad rows masked to 0 (valid: post-ReLU values are >= 0 and
    every pool window contains a real element, so 0-pads never win).

Reference semantics: fix_resnet.py:366-372 (conv -> bn-folded bias -> relu
-> maxpool) in the int_op_only regime; bit-exactness is asserted against
the XLA engine pipeline in tests/test_pallas_stem.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_p(out_h: int) -> int:
    """Pooled rows per grid step: largest divisor of out_h <= 16.  The cap is
    a VMEM budget: p=28 put the patch scratch + two phase accumulators at
    18.7 MB, past the 16 MB scoped-vmem limit; p=14 fits comfortably."""
    for cand in range(min(out_h, 16), 0, -1):
        if out_h % cand == 0:
            return cand
    return 1


WP = 64  # patch width per phase: >= valid_w + 1, multiple of 16 (bf16 tiles)


def _stem_kernel(
    be_ref, be1_ref, bo_ref, bo1_ref, w_ref, b_ref, o_ref, patch_ref,
    *, p: int, valid_w: int
):
    R = 2 * p + 1  # conv rows per block (incl. the pool's -1/top edge row)
    band_e = jnp.concatenate([be_ref[0], be1_ref[0]], axis=0)[: R + 3]
    band_o = jnp.concatenate([bo_ref[0], bo1_ref[0]], axis=0)[: R + 3]

    w = w_ref[:].astype(jnp.bfloat16)  # (192, O)
    o_ch = w.shape[1]
    bias = b_ref[:]  # (1, O) int32

    def conv_phase(p0, p1, p2, p3):
        """patch slots [p_{k-1}, q_{k-1}, p_k, q_k]-style: the four
        (band, col-offset) streams in x-tap order; returns (R, WP, 64).
        Pieces are assembled through the VMEM scratch: Mosaic's concat
        requires equal sublane offsets across pieces, which the 0/1/2
        column shifts violate -- ref stores re-normalize the layout."""
        idx = 0
        for a in range(4):  # y-taps: band rows a..a+R
            for src, off in (p0, p1, p2, p3):
                patch_ref[:, :, idx * 12 : (idx + 1) * 12] = jax.lax.slice(
                    src, (a, off, 0), (a + R, off + WP, 12)
                ).astype(jnp.bfloat16)
                idx += 1
        m = patch_ref[:].reshape(R * WP, 192)
        acc = jax.lax.dot_general(
            m, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc.astype(jnp.int32) + bias
        acc = jnp.maximum(acc, 0)
        return acc.reshape(R, WP, o_ch)

    # x-tap streams (see module docstring): even conv cols read
    # [e[k-1], o[k-1], e[k], o[k]]; odd read [o[k-1], e[k], o[k], e[k+1]];
    # bands store phase col k at position k+1
    conv_e = conv_phase((band_e, 0), (band_o, 0), (band_e, 1), (band_o, 1))
    conv_o = conv_phase((band_o, 0), (band_e, 1), (band_o, 1), (band_e, 2))

    # pad-row mask: local row i is global conv row 2*p*q - 1 + i
    q = pl.program_id(1)
    gi = 2 * p * q - 1 + jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
    rowok = (gi >= 0) & (gi < 2 * p * pl.num_programs(1))  # conv_h rows
    conv_e = jnp.where(rowok, conv_e, 0)
    conv_o = jnp.where(rowok, conv_o, 0)

    # x-pool: pooled col px = max(e[px], o[px], o[px-1]); px in [0, valid_w)
    ce = jax.lax.slice(conv_e, (0, 0, 0), (R, valid_w, o_ch))
    co = jax.lax.slice(conv_o, (0, 0, 0), (R, valid_w, o_ch))
    co_prev = jnp.concatenate(
        [jnp.zeros((R, 1, o_ch), jnp.int32),
         jax.lax.slice(conv_o, (0, 0, 0), (R, valid_w - 1, o_ch))],
        axis=1,
    )
    px3 = jnp.maximum(jnp.maximum(ce, co), co_prev)  # (R, valid_w, 64)

    # y-pool: pooled row qr = max over local conv rows 2qr, 2qr+1, 2qr+2.
    # Mosaic has no stride-2 vector slices, so split even/odd rows with a
    # major-dim reshape instead.
    body = jax.lax.slice(px3, (0, 0, 0), (2 * p, valid_w, o_ch))
    r4 = body.reshape(p, 2, valid_w, o_ch)
    ev = jax.lax.slice(r4, (0, 0, 0, 0), (p, 1, valid_w, o_ch)).reshape(
        p, valid_w, o_ch
    )
    od = jax.lax.slice(r4, (0, 1, 0, 0), (p, 2, valid_w, o_ch)).reshape(
        p, valid_w, o_ch
    )
    last = jax.lax.slice(px3, (2 * p, 0, 0), (2 * p + 1, valid_w, o_ch))
    ev_next = jnp.concatenate(
        [jax.lax.slice(ev, (1, 0, 0), (p, valid_w, o_ch)), last], axis=0
    )
    o_ref[0] = jnp.maximum(jnp.maximum(ev, od), ev_next)


@functools.partial(
    jax.jit, static_argnames=("conv_h", "valid_w", "interpret")
)
def stem_pool_int8(
    band_e: jnp.ndarray,
    band_o: jnp.ndarray,
    w192: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    conv_h: int = 112,
    valid_w: int = 56,
    interpret: Optional[bool] = None,
):
    """Fused stem over pre-built phase bands.

    band_e/band_o: (N, ROWS, COLS, 12) int8 -- space-to-depth phase streams,
    rows offset by 3 (band row s = s2d row s-3, zero-padded), phase col k at
    position k+1, COLS padded to a sublane-tile multiple.  w192: (192, 64)
    int8 row-major reshape of the s2d 4x4x12x64 weights.  bias: (64,) int32.
    Returns (N, conv_h//2, valid_w, 64) int32 pooled activations.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, rows, cols, c12 = band_e.shape
    o_ch = w192.shape[1]
    assert c12 == 12 and band_o.shape == band_e.shape
    out_h = conv_h // 2
    p = _pick_p(out_h)
    blocks = out_h // p
    assert rows >= 2 * p * blocks + 4, (rows, p, blocks)
    nblocks_needed = blocks + 1
    rows_needed = nblocks_needed * 2 * p
    if rows < rows_needed:
        # tail rows feed only pad-masked conv rows; any value works
        pad = rows_needed - rows
        band_e = jnp.pad(band_e, ((0, 0), (0, pad), (0, 0), (0, 0)))
        band_o = jnp.pad(band_o, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rows = rows_needed
    num_rblocks = rows // (2 * p)

    kernel = functools.partial(_stem_kernel, p=p, valid_w=valid_w)
    R = 2 * p + 1
    block = (1, 2 * p, cols, 12)
    m0 = lambda i, j: (i, j, 0, 0)
    m1 = lambda i, j, _nb=num_rblocks: (i, jnp.minimum(j + 1, _nb - 1), 0, 0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_h, valid_w, o_ch), jnp.int32),
        grid=(n, blocks),
        in_specs=[
            pl.BlockSpec(block, m0, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, m1, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, m0, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, m1, memory_space=pltpu.VMEM),
            pl.BlockSpec((192, o_ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, valid_w, o_ch), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((R, WP, 192), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * conv_h * valid_w * 2 * 192 * o_ch,
            bytes_accessed=2 * band_e.size + n * out_h * valid_w * o_ch * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(band_e, band_e, band_o, band_o, w192, bias.reshape(1, o_ch))


def build_stem_inputs(v8, w, conv_h: int = 112, col_tile: int = 16,
                      zero_point: int = 0):
    """XLA pre-pass: packed 8-bit head input (N, 2*conv_h, 2*conv_h, 3)
    int8 -> phase bands + reshaped weights + bias compensation.

    v8: int8.  For the unsigned pipeline pass s8 = u8' - 128 with
    zero_point=128: pads are stored as -zero_point (a true u8' zero), and
    because the bands explicitly materialize EVERY position the kernel
    reads, the compensation acc_true = acc_s8 + zp * colsum(w192) is a
    constant vector -- returned as `comp`, to be added to the conv bias.
    (Mosaic has no u8->bf16 cast, hence the signed representation.)
    w: (7, 7, 3, O) int8.  Returns (band_e, band_o, w192, comp).
    """
    n, h, wdt, c = v8.shape
    assert (h, wdt, c) == (2 * conv_h, 2 * conv_h, 3)
    assert v8.dtype == jnp.int8, v8.dtype
    pad_v = jnp.int8(-zero_point)
    # space-to-depth (N, conv_h, conv_h, 12)
    s = v8.reshape(n, conv_h, 2, conv_h, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    s = s.reshape(n, conv_h, conv_h, 12)
    # rows: band row s = s2d row s-3 (2 s2d top pads + 1 pool edge row)
    s = jnp.pad(s, ((0, 0), (3, 1), (0, 0), (0, 0)), constant_values=pad_v)
    # column phases with one lead column; pad cols to a tile multiple
    half = conv_h // 2
    cols = -(-(WP + 2) // col_tile) * col_tile  # pieces need offsets 0..2 + WP
    pe = s[:, :, 0::2, :]
    po = s[:, :, 1::2, :]
    band_e = jnp.pad(
        pe, ((0, 0), (0, 0), (1, cols - half - 1), (0, 0)), constant_values=pad_v
    )
    band_o = jnp.pad(
        po, ((0, 0), (0, 0), (1, cols - half - 1), (0, 0)), constant_values=pad_v
    )

    # weights: s2d rearrangement (engine _conv_int_s2d, k=7 -> 4x4x12),
    # then row-major (a, slot, cc) flatten to (192, O); jnp ops so the
    # transform stays traceable inside the jitted engine forward
    o_ch = w.shape[3]
    ws = jnp.zeros((4, 4, 12, o_ch), w.dtype)
    k, p3 = 7, 3
    for dy in range(k):
        ey, ay = (dy - p3) % 2, (dy - p3 - (dy - p3) % 2) // 2
        for dx in range(k):
            ex, ax = (dx - p3) % 2, (dx - p3 - (dx - p3) % 2) // 2
            ws = ws.at[
                ay + 2, ax + 2, (ey * 2 + ex) * 3 : (ey * 2 + ex) * 3 + 3, :
            ].set(w[dy, dx])
    w192 = ws.reshape(192, o_ch)
    comp = zero_point * jnp.sum(w192.astype(jnp.int32), axis=0)
    return band_e, band_o, w192, comp
