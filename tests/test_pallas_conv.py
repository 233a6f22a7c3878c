"""Pallas implicit-GEMM int8 conv vs lax reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from f8net_tpu.ops import shift_requant
from f8net_tpu.ops.pallas_conv import pallas_conv_int8


def _ref_conv(x, w, b, stride, padding, pad_value=0):
    x = jnp.pad(
        x.astype(jnp.int32),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
        constant_values=pad_value,
    )
    y = lax.conv_general_dilated(
        x,
        w.astype(jnp.int32),
        (stride, stride),
        [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y + b


@pytest.mark.parametrize(
    "shape",
    [
        # n, h, w, c, o, k, stride, padding
        (2, 16, 16, 64, 64, 3, 1, 1),
        (1, 15, 15, 32, 48, 3, 2, 1),
        (2, 8, 8, 128, 96, 1, 1, 0),
        (1, 14, 14, 64, 130, 3, 1, 1),  # non-multiple O
        (1, 9, 9, 16, 32, 5, 2, 2),  # 5x5
    ],
)
def test_int32_epilogue_matches_lax(shape):
    n, h, w_, c, o, k, s, p = shape
    rng = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rng.randint(-127, 128, (n, h, w_, c)), jnp.int8)
    w = jnp.asarray(rng.randint(-20, 21, (k, k, c, o)), jnp.int8)
    b = jnp.asarray(rng.randint(-500, 500, (o,)), jnp.int32)
    y = pallas_conv_int8(x, w, b, stride=s, padding=p, boh=4)
    ref = _ref_conv(x, w, b, s, p)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_pad_value_unsigned_zero_point():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-128, 128, (1, 10, 10, 32)), jnp.int8)
    w = jnp.asarray(rng.randint(-9, 10, (3, 3, 32, 64)), jnp.int8)
    b = jnp.zeros((64,), jnp.int32)
    y = pallas_conv_int8(x, w, b, stride=1, padding=1, pad_value=-128, boh=4)
    ref = _ref_conv(x, w, b, 1, 1, pad_value=-128)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


@pytest.mark.parametrize("out_signed", [True, False])
def test_requant8_epilogue(out_signed):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(-127, 128, (1, 12, 12, 32)), jnp.int8)
    w = jnp.asarray(rng.randint(-9, 10, (3, 3, 32, 64)), jnp.int8)
    b = jnp.asarray(rng.randint(-100, 100, (64,)), jnp.int32)
    net = 5
    y = pallas_conv_int8(
        x, w, b, stride=1, padding=1, epilogue="requant8",
        net=net, out_signed=out_signed, boh=4,
    )
    acc = _ref_conv(x, w, b, 1, 1)
    want = shift_requant(acc, 8, 0, net, out_signed)
    if not out_signed:
        want = want - 128
    np.testing.assert_array_equal(np.asarray(y), np.asarray(want).astype(np.int8))


def test_relu_then_requant():
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randint(-127, 128, (1, 8, 8, 16)), jnp.int8)
    w = jnp.asarray(rng.randint(-9, 10, (3, 3, 16, 32)), jnp.int8)
    b = jnp.zeros((32,), jnp.int32)
    y = pallas_conv_int8(x, w, b, stride=1, padding=1, relu=True, boh=4)
    ref = jnp.maximum(_ref_conv(x, w, b, 1, 1), 0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_tall_image_multi_rowblocks():
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randint(-127, 128, (1, 56, 30, 32)), jnp.int8)
    w = jnp.asarray(rng.randint(-9, 10, (3, 3, 32, 32)), jnp.int8)
    b = jnp.asarray(rng.randint(-10, 10, (32,)), jnp.int32)
    y = pallas_conv_int8(x, w, b, stride=1, padding=1, boh=8)
    ref = _ref_conv(x, w, b, 1, 1)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
