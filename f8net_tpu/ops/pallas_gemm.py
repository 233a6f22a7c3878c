"""Pallas TPU kernel: int8 GEMM with int32 accumulation and a fused
power-of-two shift-requant epilogue.

This is the MXU hot path of the integer engine: 1x1 convs (the bulk of
MobileNetV2/ResNet50 FLOPs), im2col'd KxK convs and the classifier all lower
to GEMM.  The epilogue performs bias add, optional ReLU, and the exact
round-half-to-even shift requantization of the fxp algebra
(f8net_tpu.ops.fxp.shift_requant) with a *compile-time constant* shift --
no FP32 or 32-bit scaling anywhere.

Unsigned (post-ReLU) activations are carried as int8 with a zero-point offset
of 128 (u = s + 128); the caller folds the compensation 128 * colsum(w) into
the int32 bias, and the epilogue re-biases the output, so the MXU always sees
signed int8 operands.

Grid layout: (M/BM, N/BN, K/BK) with K innermost, accumulating into a VMEM
int32 scratch tile; epilogue fires on the last K step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _requant_i32(acc, net: int, signed: bool):
    """Static-shift round-half-to-even requant, clamp to the 8-bit range."""
    if net > 0:
        half = 1 << (net - 1)
        res = acc + half
        tie = jnp.mod(acc, 1 << net) == half
        res = jnp.where(tie, (res >> (net + 1)) << 1, res >> net)
    else:
        res = acc << (-net)
    if signed:
        return jnp.clip(res, -127, 127)
    return jnp.clip(res, 0, 255)


def _gemm_kernel(
    x_ref,
    w_ref,
    b_ref,
    o_ref,
    acc_ref,
    *,
    k_tiles: int,
    epilogue: str,
    net: int,
    out_signed: bool,
    relu: bool,
    dot_impl: str = "s8",
):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if dot_impl == "bf16":
        # bf16 dots with f32 accumulation are exact for 8-bit operands while
        # each contraction chunk stays <= 1024 (|acc| < 2^24); useful where
        # Mosaic's s8 dot lowering is emulated rather than native
        k = x_ref.shape[1]
        part = None
        for c0 in range(0, k, 1024):
            c1 = min(c0 + 1024, k)
            y = jax.lax.dot_general(
                x_ref[:, c0:c1].astype(jnp.bfloat16),
                w_ref[c0:c1, :].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            part = y if part is None else part + y
        acc_ref[:] += part
    else:
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:],
            w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _epilogue():
        acc = acc_ref[:] + b_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0)
        if epilogue == "int32":
            o_ref[:] = acc
        elif epilogue == "requant8":
            r = _requant_i32(acc, net, out_signed)
            if not out_signed:
                r = r - 128  # store unsigned with zero-point 128 as int8
            o_ref[:] = r.astype(jnp.int8)
        else:
            raise NotImplementedError(epilogue)


@functools.partial(
    jax.jit,
    static_argnames=(
        "epilogue",
        "net",
        "out_signed",
        "relu",
        "bm",
        "bn",
        "bk",
        "dot_impl",
        "interpret",
    ),
)
def int8_gemm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    epilogue: str = "int32",
    net: int = 0,
    out_signed: bool = True,
    relu: bool = False,
    bm: int = 256,
    bn: int = 256,
    bk: int = 256,
    dot_impl: str = "s8",
    interpret: Optional[bool] = None,
):
    """y[M,N] = requant(x[M,K] @ w[K,N] + bias[N]).

    x, w are int8 (signed representation; unsigned activations pre-offset by
    -128 with the compensation folded into bias).  bias is int32 at the
    accumulator scale.  epilogue:
      'int32'    -> int32 accumulator out (feeds residual adds)
      'requant8' -> int8 out at the next layer's fraclen (net = in_fl_out
                    shift, out_signed = next layer's double_side)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and bias.shape == (N,)

    bm = min(bm, _round_up(M, 32))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
    Mp, Kp, Np = _round_up(M, bm), _round_up(K, bk), _round_up(N, bn)
    if (Mp, Kp) != (M, K):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        bias = jnp.pad(bias, (0, Np - N))
    b2 = bias.reshape(1, Np)

    k_tiles = Kp // bk
    out_dtype = jnp.int32 if epilogue == "int32" else jnp.int8

    kernel = functools.partial(
        _gemm_kernel,
        k_tiles=k_tiles,
        epilogue=epilogue,
        net=net,
        out_signed=out_signed,
        relu=relu,
        dot_impl=dot_impl,
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Mp // bm, Np // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * (4 if epilogue == "int32" else 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b2)
    return y[:M, :N]


def fold_zero_point(w: jnp.ndarray, bias: jnp.ndarray, zero_point: int = 128):
    """Compensation for unsigned activations stored as s8 = u8 - zp:
    acc_true = s8 @ w + zp * colsum(w).  Returns the adjusted int32 bias."""
    comp = zero_point * jnp.sum(w.astype(jnp.int32), axis=0)
    return bias + comp
