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
    _pool_finish(conv_e, conv_o, o_ref, p=p, valid_w=valid_w)


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


def _pool_finish(conv_e, conv_o, o_ref, *, p: int, valid_w: int):
    """Shared pooling tail: pad-row mask + x-phase max + y-pool (see
    _stem_kernel docstring).  conv_e/conv_o: (R, WP, o_ch) int32 post-ReLU."""
    R = 2 * p + 1
    o_ch = conv_e.shape[-1]

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


def _stem_kernel_v2(
    xe_ref, xe1_ref, xo_ref, xo1_ref, w_ref, b_ref, o_ref, *, p: int, valid_w: int
):
    """v2: the x-taps are PRE-EXPANDED on the XLA side into 64-lane channel
    blocks (build_stem_inputs_v2), so the per-row 4x4x12 window assembly
    reduces to 4 outer-dim row slices + one lane-aligned concat -- no
    narrow scratch stores (v1's 16 12-lane stores ran 0.24x at model
    level).  The dot is (R*WP, 256) x (256, O) with zero-padded lanes
    48..63 of each y-tap block; f32 accumulation stays exact (|sum| <
    192*128*127 < 2^24)."""
    R = 2 * p + 1
    band_e = jnp.concatenate([xe_ref[0], xe1_ref[0]], axis=0)[: R + 3]
    band_o = jnp.concatenate([xo_ref[0], xo1_ref[0]], axis=0)[: R + 3]
    w = w_ref[:].astype(jnp.bfloat16)  # (256, O)
    o_ch = w.shape[1]
    bias = b_ref[:]  # (1, O) int32

    def conv_phase(band):
        pieces = [
            jax.lax.slice(band, (a, 0, 0), (a + R, WP, 64)).astype(jnp.bfloat16)
            for a in range(4)  # y-taps: outer-dim slices, equal lane offsets
        ]
        m = jnp.concatenate(pieces, axis=-1).reshape(R * WP, 256)
        acc = jax.lax.dot_general(
            m, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc.astype(jnp.int32) + bias
        acc = jnp.maximum(acc, 0)
        return acc.reshape(R, WP, o_ch)

    _pool_finish(
        conv_phase(band_e), conv_phase(band_o), o_ref, p=p, valid_w=valid_w
    )


@functools.partial(
    jax.jit, static_argnames=("conv_h", "valid_w", "interpret")
)
def stem_pool_int8_v2(
    band_e: jnp.ndarray,
    band_o: jnp.ndarray,
    w256: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    conv_h: int = 112,
    valid_w: int = 56,
    interpret: Optional[bool] = None,
):
    """Fused stem over x-tap-expanded phase bands (build_stem_inputs_v2).

    band_e/band_o: (N, ROWS, WP, 64) int8 -- per conv row/col, the four
    x-tap streams of that phase packed as 12-channel groups at lane offsets
    0/12/24/36, lanes 48..63 zero.  w256: (256, O) int8 (y-tap-major).
    Returns (N, conv_h//2, valid_w, 64) int32 pooled activations."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, rows, wp, c64 = band_e.shape
    o_ch = w256.shape[1]
    assert (wp, c64) == (WP, 64) and band_o.shape == band_e.shape
    out_h = conv_h // 2
    p = _pick_p(out_h)
    blocks = out_h // p
    # Bands must carry enough REAL rows for every unmasked conv row; the
    # tail padding below only feeds pad-masked rows (same contract as v1).
    assert rows >= 2 * p * blocks + 4, (rows, p, blocks)
    nblocks_needed = blocks + 1
    rows_needed = nblocks_needed * 2 * p
    if rows < rows_needed:
        pad = rows_needed - rows
        band_e = jnp.pad(band_e, ((0, 0), (0, pad), (0, 0), (0, 0)))
        band_o = jnp.pad(band_o, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rows = rows_needed
    num_rblocks = rows // (2 * p)

    kernel = functools.partial(_stem_kernel_v2, p=p, valid_w=valid_w)
    block = (1, 2 * p, WP, 64)
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
            pl.BlockSpec((256, o_ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, valid_w, o_ch), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * conv_h * valid_w * 2 * 256 * o_ch,
            bytes_accessed=2 * band_e.size + n * out_h * valid_w * o_ch * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(band_e, band_e, band_o, band_o, w256, bias.reshape(1, o_ch))


def build_stem_inputs_v2(v8, w, conv_h: int = 112, zero_point: int = 0):
    """XLA pre-pass for the v2 kernel: expand the five (phase, col-offset)
    streams into per-phase x-tap bands of 64-lane blocks, so the kernel's
    window assembly needs no narrow stores.

    Layout (matches _stem_kernel's x-tap order): band_e channel block
    tap*12..tap*12+12 holds [e@0, o@0, e@1, o@1][tap]; band_o holds
    [o@0, e@1, o@1, e@2]; lanes 48..63 are zero (and stay zero through the
    dot: w256 rows 48..63 of each y-block are zero).  Returns
    (band_e, band_o, w256, comp)."""
    be, bo, w192, comp = build_stem_inputs(v8, w, conv_h, zero_point=zero_point)
    n, rows = be.shape[0], be.shape[1]

    def win(b, off):
        return jax.lax.slice(
            b, (0, 0, off, 0), (n, rows, off + WP, 12)
        )

    def expand(pieces):
        parts = [win(b, off) for b, off in pieces]
        parts.append(jnp.zeros((n, rows, WP, 16), v8.dtype))
        return jnp.concatenate(parts, axis=-1)

    band_e = expand([(be, 0), (bo, 0), (be, 1), (bo, 1)])
    band_o = expand([(bo, 0), (be, 1), (bo, 1), (be, 2)])

    o_ch = w192.shape[1]
    w256 = jnp.zeros((256, o_ch), w192.dtype)
    for a in range(4):
        w256 = w256.at[a * 64 : a * 64 + 48].set(w192[a * 48 : (a + 1) * 48])
    return band_e, band_o, w256, comp


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
