"""Explicit tensor-parallel collectives for the int8 path (shard_map).

The default TP route lets GSPMD place an all-gather after every
out-channel-sharded layer (parallel/mesh.py).  These primitives encode the
two classic hand-sharded alternatives from the TPU scaling playbook, in
exact integer arithmetic with the engine's fused shift-requant epilogue:

* `tp_paired_matmul_int8` -- the Megatron pairing: layer 1 column-parallel
  (weights N-sharded, activations stay sharded through the elementwise
  requant), layer 2 row-parallel (weights K-sharded), ONE `psum` of int32
  partials per pair instead of an all-gather after each layer.  int32
  addition is associative, so the psum is bit-exact; the requant runs
  after it.  This maps 1:1 onto MobileNetV2's expand -> (per-channel
  depthwise) -> project inverted residual: the depthwise stage is
  channelwise and runs on the sharded activations for free.

* `tp_ring_matmul_int8` -- all-gather/matmul overlap: activations arrive
  K-sharded, weights live K-sharded on each device's N-columns; at ring
  step q each device multiplies the activation shard it currently holds
  against the matching K-rows of its local weights, then `ppermute`s the
  shard to its ring neighbor.  The collective rides ICI while the MXU
  works on the chunk already in hand; after P steps every device has its
  N-shard of the full product with no monolithic all-gather buffer.

Both are bitwise-equal to the unsharded reference (integer ops commute
with the sharding) -- tested on the virtual 8-device CPU mesh, including
an HLO check that the pairing emits no all-gather
(tests/test_tp_overlap.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.fxp import shift_requant


def _requant8(acc, net: int, signed: bool):
    """int32 accumulator -> packed int8 operand (engine pack_for wire)."""
    v = shift_requant(acc, 8, 0, net, signed)
    if not signed:
        v = v - 128
    return v.astype(jnp.int8)


def tp_paired_matmul_int8(
    mesh: Mesh,
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    net1: int,
    net2: int,
    signed1: bool = False,
    signed2: bool = True,
    axis: str = "model",
):
    """requant2(requant1(x @ w1 + b1) @ w2 + b2), Megatron-paired over `axis`.

    x: (M, K) int8 replicated.  w1: (K, N) int8 -- sharded on N (column
    parallel).  w2: (N, O) int8 -- sharded on N (row parallel).  b1: (N,)
    int32 sharded; b2: (O,) int32 replicated (added after the psum).
    One collective (psum of int32 partials) for the whole pair.
    """
    p = mesh.shape[axis]
    k, n = w1.shape
    n2, o = w2.shape
    assert n == n2 and n % p == 0, (n, n2, p)

    def body(xb, w1b, b1b, w2b, b2b):
        h = jnp.dot(
            xb.astype(jnp.int32), w1b.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        ) + b1b
        h8 = _requant8(h, net1, signed1)
        part = jnp.dot(
            h8.astype(jnp.int32), w2b.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        acc = jax.lax.psum(part, axis) + b2b
        return _requant8(acc, net2, signed2)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis, None), P()),
        out_specs=P(),
    )
    return fn(x, w1, b1, w2, b2)


def tp_ring_matmul_int8(
    mesh: Mesh,
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    net: int,
    signed: bool = True,
    axis: str = "model",
):
    """requant(x @ w + b) with x K-sharded and the output N-sharded, via a
    ppermute ring that overlaps shard transfer with the per-chunk dots.

    x: (M, K) int8 -- sharded on K over `axis`.  w: (K, N) int8 -- sharded
    on N (every device holds all K rows of its N-columns).  b: (N,) int32
    sharded on N.  Returns (M, N) int8 sharded on N.
    """
    p = mesh.shape[axis]
    k, n = w.shape
    assert k % p == 0 and n % p == 0, (k, n, p)
    kb = k // p

    def body(xb, wb, bb):
        # xb: (M, K/P) -- the shard this device holds at ring step 0
        # wb: (K, N/P)
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % p) for i in range(p)]
        acc = jnp.zeros((xb.shape[0], wb.shape[1]), jnp.int32)
        cur = xb
        for q in range(p):
            # the shard in hand after q hops started at ring position
            # (idx - q); its rows of w are [(idx - q) * kb, ...)
            src = (idx - q) % p
            wrows = jax.lax.dynamic_slice_in_dim(wb, src * kb, kb, axis=0)
            acc = acc + jnp.dot(
                cur.astype(jnp.int32), wrows.astype(jnp.int32),
                preferred_element_type=jnp.int32,
            )
            if q != p - 1:
                cur = jax.lax.ppermute(cur, axis, perm)
        return _requant8(acc + bb, net, signed)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis)),
        out_specs=P(None, axis),
    )
    return fn(x, w, b)
