"""Pallas VPU depthwise int8 conv vs lax reference (interpret mode on CPU),
plus engine-level bit-equality of the depthwise-only Pallas mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from f8net_tpu.ops import shift_requant
from f8net_tpu.ops.pallas_dw import pallas_depthwise_int8


def _ref_dw(x, w, b, stride, padding, pad_value=0):
    c = x.shape[-1]
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
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )
    return y + b


@pytest.mark.parametrize(
    "shape",
    [
        # n, h, w, c, k, stride, padding
        (2, 16, 16, 64, 3, 1, 1),
        (1, 15, 15, 32, 3, 2, 1),
        (3, 14, 14, 96, 3, 1, 1),   # non-128-multiple C
        (1, 7, 7, 144, 3, 2, 1),    # non-128-multiple C, stride 2
        (2, 9, 9, 16, 5, 2, 2),     # 5x5
        (1, 8, 8, 32, 3, 1, 0),     # no padding
    ],
)
def test_int32_epilogue_matches_lax(shape):
    n, h, w_, c, k, s, p = shape
    rng = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rng.randint(-128, 128, (n, h, w_, c)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (k, k, 1, c)), jnp.int8)
    b = jnp.asarray(rng.randint(-500, 500, (c,)), jnp.int32)
    y = pallas_depthwise_int8(x, w, b, stride=s, padding=p, boh=4)
    ref = _ref_dw(x, w, b, s, p)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_pad_value_unsigned_zero_point():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-128, 128, (2, 10, 10, 48)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, 48)), jnp.int8)
    b = jnp.zeros((48,), jnp.int32)
    y = pallas_depthwise_int8(x, w, b, stride=1, padding=1, pad_value=-128, boh=4)
    ref = _ref_dw(x, w, b, 1, 1, pad_value=-128)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


@pytest.mark.parametrize("out_signed", [True, False])
def test_requant8_epilogue(out_signed):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(-128, 128, (1, 12, 12, 32)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, 32)), jnp.int8)
    b = jnp.asarray(rng.randint(-100, 100, (32,)), jnp.int32)
    net = 5
    y = pallas_depthwise_int8(
        x, w, b, stride=1, padding=1, epilogue="requant8",
        net=net, out_signed=out_signed, boh=4,
    )
    acc = _ref_dw(x, w, b, 1, 1)
    want = shift_requant(acc, 8, 0, net, out_signed)
    if not out_signed:
        want = want - 128
    np.testing.assert_array_equal(np.asarray(y), np.asarray(want).astype(np.int8))


def test_relu_then_requant():
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randint(-128, 128, (1, 8, 8, 16)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, 16)), jnp.int8)
    b = jnp.zeros((16,), jnp.int32)
    y = pallas_depthwise_int8(x, w, b, stride=1, padding=1, relu=True, boh=4)
    ref = jnp.maximum(_ref_dw(x, w, b, 1, 1), 0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_batch_blocking():
    """bn > 1 groups several images into one grid step."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randint(-128, 128, (6, 14, 14, 32)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, 32)), jnp.int8)
    b = jnp.asarray(rng.randint(-10, 10, (32,)), jnp.int32)
    for bn in (1, 2, 3, 6):
        y = pallas_depthwise_int8(x, w, b, stride=1, padding=1, boh=7, bn=bn)
        ref = _ref_dw(x, w, b, 1, 1)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_dw_engine_mode_bitexact_vs_xla():
    """use_pallas='dw' (depthwise on the VPU kernel, dense on XLA) must be
    bit-equal to the default engine on both MobileNets -- this transitively
    triangulates the kernel against the C++ golden runtime
    (tests/test_native.py keeps engine == csrc bit-equal)."""
    from f8net_tpu.engine import IntEngine
    from f8net_tpu.quant import bake_plan
    from tests.test_int_engine import BASE, _trained_model

    for name in ("mobilenet_v1", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE)
        plan, int_params = bake_plan(model, params, state)
        e_xla = IntEngine(model, plan, int_params, int_only=True)
        e_dw = IntEngine(model, plan, int_params, int_only=True, use_pallas="dw")
        xi = e_xla.condition_input(x)
        np.testing.assert_array_equal(np.asarray(e_dw(xi)), np.asarray(e_xla(xi)))
