"""Pallas int8 GEMM v2: VMEM-resident M-loop with manual double-buffered DMA.

Round-1 A/Bs eliminated epilogue placement, dot dtype and tile sizes as the
cause of the v1 kernel's deficit at M-heavy small-K shapes (MobileNet 1x1
convs); the remaining suspect is per-grid-step overhead.  v2 therefore runs
ONE grid step per N-block and loops M inside the kernel:

  * weights (K, BN) + bias stay VMEM-resident for the whole program
    (fetched once by the standard pipeline);
  * the input streams through two (BM, K) VMEM slots -- chunk m+1's DMA is
    issued before chunk m's compute;
  * the output streams back through two (BM, BN) slots, with the epilogue
    (bias + exact shift-requant + int8 pack) fused on the compute path.

Bit-exact vs ops.pallas_gemm.int8_gemm (tests/test_pallas_gemm_v2.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gemm import _requant_i32, _round_up


def _kernel(
    x_hbm,
    w_ref,
    b_ref,
    o_hbm,
    xs,
    os_,
    sem_in,
    sem_out,
    *,
    m_chunks: int,
    bm: int,
    bn: int,
    epilogue: str,
    net: int,
    out_signed: bool,
    relu: bool,
    wt: bool = False,
):
    j = pl.program_id(0)

    def in_dma(slot, mi):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(mi * bm, bm), :], xs.at[slot], sem_in.at[slot]
        )

    def out_dma(slot, mi):
        return pltpu.make_async_copy(
            os_.at[slot],
            o_hbm.at[pl.ds(mi * bm, bm), pl.ds(j * bn, bn)],
            sem_out.at[slot],
        )

    in_dma(0, 0).start()

    def body(mi, _):
        slot = mi % 2

        @pl.when(mi + 1 < m_chunks)
        def _prefetch():
            in_dma((mi + 1) % 2, mi + 1).start()

        in_dma(slot, mi).wait()
        if wt:
            # lane-by-lane contraction: weights resident transposed (BN, K)
            acc = jax.lax.dot_general(
                xs[slot],
                w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc = jax.lax.dot_general(
                xs[slot],
                w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        out = acc + b_ref[:]
        if relu:
            out = jnp.maximum(out, 0)
        if epilogue == "requant8":
            r = _requant_i32(out, net, out_signed)
            if not out_signed:
                r = r - 128
            out = r.astype(jnp.int8)

        # the slot's previous write-back must have drained before reuse
        @pl.when(mi >= 2)
        def _drain():
            out_dma(slot, mi - 2).wait()

        os_[slot] = out
        out_dma(slot, mi).start()
        return 0

    jax.lax.fori_loop(0, m_chunks, body, 0)
    # drain the trailing write-backs
    @pl.when(m_chunks >= 2)
    def _():
        out_dma(m_chunks % 2, m_chunks - 2).wait()

    out_dma((m_chunks - 1) % 2, m_chunks - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "epilogue", "net", "out_signed", "relu", "bm", "bn", "bk",
        "dot_impl", "wt", "interpret",
    ),
)
def int8_gemm_v2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    epilogue: str = "int32",
    net: int = 0,
    out_signed: bool = True,
    relu: bool = False,
    bm: int = 1024,
    bn: int = 512,
    bk: int = 0,  # accepted for int8_gemm signature compatibility; unused
    dot_impl: str = "s8",  # ditto
    wt: bool = False,  # weights resident transposed (BN, K); lane contraction
    interpret: Optional[bool] = None,
):
    """y[M,N] = epilogue(x[M,K] @ w[K,N] + bias); same contract as int8_gemm."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and bias.shape == (N,)

    bn = min(bn, _round_up(N, 128))
    Kp = _round_up(K, 128)
    bm = min(bm, _round_up(M, 32))
    Mp = _round_up(M, bm)
    Np = _round_up(N, bn)
    if (Mp, Kp) != (M, K):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        bias = jnp.pad(bias, (0, Np - N))
    b2 = bias.reshape(1, Np)
    m_chunks = Mp // bm
    out_dtype = jnp.int32 if epilogue == "int32" else jnp.int8

    if wt:
        w = w.T  # (Np, Kp): lane-dim contraction layout
    kernel = functools.partial(
        _kernel,
        m_chunks=m_chunks,
        bm=bm,
        bn=bn,
        epilogue=epilogue,
        net=net,
        out_signed=out_signed,
        relu=relu,
        wt=wt,
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Np // bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((bn, Kp), lambda j: (j, 0), memory_space=pltpu.VMEM)
            if wt
            else pl.BlockSpec((Kp, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # manual write-back
        scratch_shapes=[
            pltpu.VMEM((2, bm, Kp), jnp.int8),
            pltpu.VMEM((2, bm, bn), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=int(Mp * Kp + Kp * Np + Mp * Np * (4 if epilogue == "int32" else 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b2)
    return y[:M, :N]
