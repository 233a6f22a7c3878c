"""Bit-exactness of the flat big-M implicit-GEMM conv kernel.

Reference semantics: int8 x int8 -> int32 conv with explicit packed-zero
spatial padding, int32 bias, optional ReLU, round-half-to-even shift requant
(fix_quant_ops.py:90-114) -- checked against lax.conv + ops.fxp.shift_requant
in interpret mode, including the zero-glue chained-layer contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from f8net_tpu.ops.fxp import shift_requant
from f8net_tpu.ops.pallas_conv_flat import conv_flat_int8, pack_flat, unpack_flat


def _ref_conv(x8, w8, bias, pad_value, p, relu=False):
    xp = jnp.pad(
        x8.astype(jnp.int32),
        ((0, 0), (p, p), (p, p), (0, 0)),
        constant_values=pad_value,
    )
    y = lax.conv_general_dilated(
        xp,
        w8.astype(jnp.int32),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    return jnp.maximum(y, 0) if relu else y


def _rand(shape, key, lo=-128, hi=128):
    return jax.random.randint(jax.random.PRNGKey(key), shape, lo, hi).astype(jnp.int8)


@pytest.mark.parametrize(
    "n,hw,c,o", [(2, 9, 64, 96), (1, 14, 128, 64), (2, 7, 256, 256), (3, 10, 32, 128)]
)
def test_int32_epilogue_matches_xla(n, hw, c, o):
    x = _rand((n, hw, hw, c), 0)
    w = _rand((3, 3, c, o), 1, -127, 128)
    b = jax.random.randint(jax.random.PRNGKey(2), (o,), -(1 << 15), 1 << 15)
    pad_value = -128  # unsigned-packed zero
    ref = _ref_conv(x, w, b, pad_value, 1)

    xf, geom = pack_flat(x, 1, pad_value)
    yf = conv_flat_int8(xf, w, b, geom=geom, epilogue="int32")
    got = unpack_flat(yf, geom, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_5x5_kernel():
    x = _rand((2, 11, 11, 64), 3)
    w = _rand((5, 5, 64, 128), 4, -127, 128)
    b = jnp.zeros((128,), jnp.int32)
    ref = _ref_conv(x, w, b, 0, 2)
    xf, geom = pack_flat(x, 2, 0)
    yf = conv_flat_int8(xf, w, b, geom=geom, kernel=(5, 5), epilogue="int32")
    np.testing.assert_array_equal(np.asarray(unpack_flat(yf, geom, 2)), np.asarray(ref))


@pytest.mark.parametrize("out_signed", [True, False])
def test_requant8_epilogue(out_signed):
    n, hw, c, o = 2, 9, 128, 96
    x = _rand((n, hw, hw, c), 5)
    w = _rand((3, 3, c, o), 6, -127, 128)
    b = jax.random.randint(jax.random.PRNGKey(7), (o,), -(1 << 12), 1 << 12)
    net = 3
    acc = _ref_conv(x, w, b, 0, 1, relu=True)
    ref = shift_requant(acc, 8, 0, net, out_signed)
    if not out_signed:
        ref = ref - 128

    xf, geom = pack_flat(x, 1, 0)
    yf = conv_flat_int8(
        xf, w, b, geom=geom, epilogue="requant8", net=net,
        out_signed=out_signed, relu=True,
        mask_value=(0 if out_signed else -128),
    )
    got = unpack_flat(yf, geom, 1)
    np.testing.assert_array_equal(
        np.asarray(got, np.int32), np.asarray(ref, np.int32)
    )


def test_chained_convs_zero_glue():
    """conv1 (requant8, ring re-masked to conv2's packed zero) feeds conv2
    directly in flat layout; the pair must equal the two-step XLA reference.
    This is the contract that lets ResNet bodies flow HBM->HBM in int8."""
    n, hw, c, m, o = 2, 12, 64, 128, 96
    x = _rand((n, hw, hw, c), 8)
    w1 = _rand((3, 3, c, m), 9, -127, 128)
    b1 = jax.random.randint(jax.random.PRNGKey(10), (m,), -(1 << 12), 1 << 12)
    w2 = _rand((3, 3, m, o), 11, -127, 128)
    b2 = jax.random.randint(jax.random.PRNGKey(12), (o,), -(1 << 12), 1 << 12)
    net = 4

    # reference: conv1 (signed input, zero pads) + relu + unsigned requant
    # (packed -128), then conv2 on the packed operand with the zero-point
    # compensation acc = s8conv + 128*colsum(w2) folded into its bias
    a1 = _ref_conv(x, w1, b1, 0, 1, relu=True)
    q1 = shift_requant(a1, 8, 0, net, False) - 128  # packed unsigned int8
    comp2 = 128 * jnp.sum(w2.astype(jnp.int32), axis=(0, 1, 2))
    ref = _ref_conv(q1.astype(jnp.int8), w2, b2 + comp2, -128, 1)

    xf, geom = pack_flat(x, 1, 0)
    y1 = conv_flat_int8(
        xf, w1, b1, geom=geom, epilogue="requant8", net=net,
        out_signed=False, relu=True, mask_value=-128,
    )
    y2 = conv_flat_int8(y1, w2, b2 + comp2, geom=geom, epilogue="int32")
    got = unpack_flat(y2, geom, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tiny_spatial_and_mask_values():
    """3x3 over a 3x3 image (h2=5 < typical bm alignments) and explicit
    pad-ring value check."""
    x = _rand((1, 3, 3, 128), 13)
    w = _rand((3, 3, 128, 128), 14, -127, 128)
    b = jnp.zeros((128,), jnp.int32)
    xf, geom = pack_flat(x, 1, 0)
    yf = conv_flat_int8(xf, w, b, geom=geom, epilogue="int32", mask_value=0)
    y = np.asarray(yf).reshape(1, 5, 5, 128)
    ref = np.asarray(_ref_conv(x, w, b, 0, 1))
    np.testing.assert_array_equal(y[:, 1:-1, 1:-1, :], ref)
    # ring is exactly the mask value
    assert (y[:, 0, :, :] == 0).all() and (y[:, -1, :, :] == 0).all()
    assert (y[:, :, 0, :] == 0).all() and (y[:, :, -1, :] == 0).all()
