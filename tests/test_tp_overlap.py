"""Explicit-collective TP primitives: bitwise equality vs the unsharded
integer reference, and the collective structure they were built for
(no all-gather in the Megatron pair; a ppermute ring in the overlap matmul).
Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.ops import shift_requant
from f8net_tpu.parallel import make_mesh
from f8net_tpu.parallel.tp_overlap import (
    tp_paired_matmul_int8,
    tp_ring_matmul_int8,
)


def _rq8(acc, net, signed):
    v = shift_requant(acc, 8, 0, net, signed)
    if not signed:
        v = v - 128
    return np.asarray(v).astype(np.int8)


def _rand(rng, shape, lo=-127, hi=128):
    return jnp.asarray(rng.randint(lo, hi, shape), jnp.int8)


def test_paired_matmul_bitexact_and_single_collective():
    mesh = make_mesh(data=2, model=4)
    rng = np.random.RandomState(0)
    m, k, n, o = 16, 64, 128, 96
    x = _rand(rng, (m, k))
    w1, w2 = _rand(rng, (k, n)), _rand(rng, (n, o))
    b1 = jnp.asarray(rng.randint(-1000, 1000, (n,)), jnp.int32)
    b2 = jnp.asarray(rng.randint(-1000, 1000, (o,)), jnp.int32)
    net1, net2 = 6, 7

    fn = jax.jit(
        lambda *a: tp_paired_matmul_int8(
            mesh, *a, net1=net1, net2=net2, signed1=False, signed2=True
        )
    )
    y = np.asarray(fn(x, w1, b1, w2, b2))

    h = np.asarray(x, np.int64).astype(np.int32) @ np.asarray(w1, np.int32) + np.asarray(b1)
    h8 = _rq8(jnp.asarray(h), net1, False)
    acc = h8.astype(np.int32) @ np.asarray(w2, np.int32) + np.asarray(b2)
    want = _rq8(jnp.asarray(acc), net2, True)
    np.testing.assert_array_equal(y, want)

    hlo = fn.lower(x, w1, b1, w2, b2).compile().as_text()
    assert "all-gather" not in hlo, "Megatron pair must not all-gather"
    assert "all-reduce" in hlo, "the pair's one collective is the psum"


def test_ring_matmul_bitexact_and_uses_ppermute():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.RandomState(1)
    m, k, n = 8, 128, 256
    x = _rand(rng, (m, k))
    w = _rand(rng, (k, n))
    b = jnp.asarray(rng.randint(-1000, 1000, (n,)), jnp.int32)
    net = 5

    fn = jax.jit(lambda *a: tp_ring_matmul_int8(mesh, *a, net=net, signed=True))
    y = np.asarray(fn(x, w, b))

    acc = np.asarray(x, np.int32) @ np.asarray(w, np.int32) + np.asarray(b)
    want = _rq8(jnp.asarray(acc), net, True)
    np.testing.assert_array_equal(y, want)

    hlo = fn.lower(x, w, b).compile().as_text()
    assert "collective-permute" in hlo, "ring must lower to ppermute"
    assert "all-gather" not in hlo, "no monolithic all-gather buffer"


def test_paired_matmul_odd_mesh_sizes():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.RandomState(2)
    x = _rand(rng, (4, 32))
    w1, w2 = _rand(rng, (32, 64)), _rand(rng, (64, 10))
    b1 = jnp.zeros((64,), jnp.int32)
    b2 = jnp.zeros((10,), jnp.int32)
    y = np.asarray(
        tp_paired_matmul_int8(mesh, x, w1, b1, w2, b2, net1=4, net2=4)
    )
    h8 = _rq8(
        jnp.asarray(np.asarray(x, np.int32) @ np.asarray(w1, np.int32)), 4, False
    )
    want = _rq8(jnp.asarray(h8.astype(np.int32) @ np.asarray(w2, np.int32)), 4, True)
    np.testing.assert_array_equal(y, want)
