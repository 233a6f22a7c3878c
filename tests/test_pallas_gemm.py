"""Pallas int8 GEMM kernel vs dense jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.ops import shift_requant
from f8net_tpu.ops.pallas_gemm import fold_zero_point, int8_gemm


def _ref_gemm(x, w, b):
    return (
        x.astype(jnp.int32) @ w.astype(jnp.int32) + b
    )


@pytest.mark.parametrize("shape", [(32, 128, 128), (40, 200, 130), (256, 512, 256)])
def test_int32_epilogue_matches_reference(shape):
    M, K, N = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    b = jnp.asarray(rng.randint(-1000, 1000, (N,)), jnp.int32)
    y = int8_gemm(x, w, b, epilogue="int32")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(_ref_gemm(x, w, b)))


@pytest.mark.parametrize("out_signed", [True, False])
@pytest.mark.parametrize("net", [3, 7, 0, -1])
def test_requant8_epilogue_bit_exact(net, out_signed):
    M, K, N = 64, 256, 128
    rng = np.random.RandomState(net + 100)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-10, 11, (K, N)), jnp.int8)
    b = jnp.asarray(rng.randint(-500, 500, (N,)), jnp.int32)
    y = int8_gemm(x, w, b, epilogue="requant8", net=net, out_signed=out_signed)
    acc = _ref_gemm(x, w, b)
    # reference: fxp shift_requant with fl chosen so input_fl - fl = net
    want = shift_requant(acc, 8, 0, net, out_signed)
    if not out_signed:
        want = want - 128
    np.testing.assert_array_equal(np.asarray(y), np.asarray(want).astype(np.int8))


def test_relu_before_requant():
    M, K, N = 32, 128, 128
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-5, 6, (K, N)), jnp.int8)
    b = jnp.zeros((N,), jnp.int32)
    y = int8_gemm(x, w, b, epilogue="int32", relu=True)
    acc = np.maximum(np.asarray(_ref_gemm(x, w, b)), 0)
    np.testing.assert_array_equal(np.asarray(y), acc)


def test_zero_point_fold_reproduces_unsigned_gemm():
    """u8 activations as s8 with zp=128 + bias compensation == true u8 GEMM."""
    M, K, N = 48, 160, 96
    rng = np.random.RandomState(3)
    u = rng.randint(0, 256, (M, K))  # unsigned activations
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    b = jnp.asarray(rng.randint(-100, 100, (N,)), jnp.int32)
    true = jnp.asarray(u) @ w.astype(jnp.int32) + b

    s = jnp.asarray(u - 128, jnp.int8)
    b_adj = fold_zero_point(w, b)
    got = int8_gemm(s, w, b_adj, epilogue="int32")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(true))


def test_grid_tiling_edge_sizes():
    # non-multiple sizes exercise padding on every grid dim
    M, K, N = 33, 129, 131
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    b = jnp.asarray(rng.randint(-10, 10, (N,)), jnp.int32)
    y = int8_gemm(x, w, b, epilogue="int32", bm=32, bn=128, bk=128)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(_ref_gemm(x, w, b)))
