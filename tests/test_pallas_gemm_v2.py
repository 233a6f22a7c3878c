"""GEMM v2 (manual double-buffered DMA) vs v1 and the dense reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.ops import shift_requant
from f8net_tpu.ops.pallas_gemm import int8_gemm
from f8net_tpu.ops.pallas_gemm_v2 import int8_gemm_v2


@pytest.mark.parametrize(
    "shape,epi",
    [
        ((2048, 96, 576), "int32"),
        ((1030, 130, 100), "int32"),
        ((3000, 576, 96), "requant8"),
        ((4096, 1152, 512), "requant8"),
    ],
)
def test_v2_matches_reference(shape, epi):
    M, K, N = shape
    rng = np.random.RandomState(M % 97)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-15, 16, (K, N)), jnp.int8)
    b = jnp.asarray(rng.randint(-500, 500, (N,)), jnp.int32)
    ref = x.astype(jnp.int32) @ w.astype(jnp.int32) + b
    want = np.asarray(ref) if epi == "int32" else np.asarray(
        shift_requant(ref, 8, 0, 5, True)
    ).astype(np.int8)
    y2 = int8_gemm_v2(x, w, b, epilogue=epi, net=5 if epi == "requant8" else 0)
    np.testing.assert_array_equal(np.asarray(y2), want)
    y1 = int8_gemm(x, w, b, epilogue=epi, net=5 if epi == "requant8" else 0)
    np.testing.assert_array_equal(np.asarray(y1), want)


def test_v2_unsigned_pack():
    M, K, N = 1024, 128, 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-9, 10, (K, N)), jnp.int8)
    b = jnp.zeros((N,), jnp.int32)
    y = int8_gemm_v2(x, w, b, epilogue="requant8", net=4, out_signed=False)
    ref = x.astype(jnp.int32) @ w.astype(jnp.int32)
    want = np.asarray(shift_requant(ref, 8, 0, 4, False)) - 128
    np.testing.assert_array_equal(np.asarray(y), want.astype(np.int8))
