"""Bit-exactness of the fused stem kernel (conv7x7s2 + bias + relu +
maxpool3x3s2) against the XLA reference pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from f8net_tpu.ops.pallas_stem import (
    build_stem_inputs,
    build_stem_inputs_v2,
    stem_pool_int8,
    stem_pool_int8_v2,
)

IMPLS = {
    "v1": (build_stem_inputs, stem_pool_int8),
    "v2": (build_stem_inputs_v2, stem_pool_int8_v2),
}


def _ref_stem(v8, w, bias):
    y = lax.conv_general_dilated(
        v8.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (2, 2),
        [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    y = jnp.maximum(y + bias, 0)
    init = jnp.iinfo(jnp.int32).min
    return lax.reduce_window(
        y, jnp.int32(init), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@pytest.mark.parametrize("impl", ["v1", "v2"])
@pytest.mark.parametrize("size,unsigned", [(112, True), (224, True), (112, False)])
def test_stem_pool_bitexact(size, unsigned, impl):
    rng = np.random.RandomState(size)
    if unsigned:
        u8 = rng.randint(0, 256, (2, size, size, 3))
        x8 = jnp.asarray(u8 - 128, jnp.int8)
        zp = 128
        xv = jnp.asarray(u8, jnp.int32)
    else:
        x8 = jnp.asarray(rng.randint(-127, 128, (2, size, size, 3)), jnp.int8)
        zp = 0
        xv = x8.astype(jnp.int32)
    w = jnp.asarray(rng.randint(-15, 16, (7, 7, 3, 64)), jnp.int8)
    bias = jnp.asarray(rng.randint(-(1 << 14), 1 << 14, (64,)), jnp.int32)

    ref = _ref_stem(xv, w, bias)

    build, pool = IMPLS[impl]
    be, bo, wk, comp = build(x8, w, conv_h=size // 2, zero_point=zp)
    got = pool(be, bo, wk, bias + comp, conv_h=size // 2, valid_w=size // 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stem_matches_engine_head_pipeline():
    """The kernel's output must equal the engine's head path exactly:
    pack -> s8 conv with zero-point compensation -> relu -> int32 maxpool.
    The kernel takes the UNPACKED u8' values, so equality also validates
    the no-zero-point formulation."""
    from f8net_tpu.ops.fxp import shift_requant

    rng = np.random.RandomState(7)
    wire = jnp.asarray(rng.randint(0, 256, (2, 112, 112, 3)), jnp.int32)
    w = jnp.asarray(rng.randint(-20, 21, (7, 7, 3, 64)), jnp.int8)
    bias = jnp.asarray(rng.randint(-(1 << 12), 1 << 12, (64,)), jnp.int32)
    input_fl = 6

    # engine path: requant wire(fl8) -> u8', pack s8 = u8'-128, conv with
    # -128 pads + comp, bias, relu, int32 maxpool
    u8p = shift_requant(wire, 8, input_fl, 8, False)  # [0,255]
    s8 = (u8p - 128).astype(jnp.int8)
    comp = 128 * jnp.sum(w.astype(jnp.int32), axis=(0, 1, 2))
    xp = jnp.pad(
        s8.astype(jnp.int32), ((0, 0), (3, 3), (3, 3), (0, 0)),
        constant_values=-128,
    )
    y = lax.conv_general_dilated(
        xp, w.astype(jnp.int32), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias + comp
    y = jnp.maximum(y, 0)
    ref = lax.reduce_window(
        y, jnp.int32(jnp.iinfo(jnp.int32).min), lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    # kernel path: s8 bands with explicit -128 pads + constant compensation
    be, bo, w192, comp = build_stem_inputs(
        (u8p - 128).astype(jnp.int8), w, conv_h=56, zero_point=128
    )
    got = stem_pool_int8(be, bo, w192, bias + comp, conv_h=56, valid_w=28)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_engine_stem_kernel_bitexact(impl, monkeypatch):
    """IntEngine(stem_kernel=True) must be bit-equal to the default engine
    on ResNet18 end-to-end (both pipelines, unnormalized + normalized),
    with either stem kernel implementation."""
    import jax

    monkeypatch.setenv("F8NET_STEM_IMPL", impl)
    from f8net_tpu.engine import IntEngine
    from f8net_tpu.models import get_model
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    for normalize in (False, True):
        cfg = QuantConfig(
            format_from_metric=True, metric="std", quant_bias=True,
            quant_avgpool=True, pool_fusing=True, normalize=normalize,
        )
        model = get_model("resnet18", cfg, num_classes=10, image_size=64)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.round(
            255 * jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        ) / 256
        if normalize:
            x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        for _ in range(2):
            _, state = model.apply(params, state, x, mode="train")
        plan, ip = bake_plan(model, params, state)
        e0 = IntEngine(model, plan, ip, int_only=True)
        e1 = IntEngine(model, plan, ip, int_only=True, stem_kernel=True)
        xi = e0.condition_input(x)
        np.testing.assert_array_equal(
            np.asarray(e0(xi)), np.asarray(e1(e1.condition_input(x))),
            err_msg=f"normalize={normalize}",
        )


def test_engine_stem_s2d_bitexact():
    """stem_s2d (XLA space-to-depth stem with explicit pads) bit-equal to
    the default engine on all three model families."""
    import jax
    from f8net_tpu.engine import IntEngine
    from f8net_tpu.models import get_model
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    for name in ("resnet18", "mobilenet_v1", "mobilenet_v2"):
        model = get_model(name, cfg, num_classes=10, image_size=64)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.round(
            255 * jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        ) / 256
        for _ in range(2):
            _, state = model.apply(params, state, x, mode="train")
        plan, ip = bake_plan(model, params, state)
        e0 = IntEngine(model, plan, ip, int_only=True)
        e1 = IntEngine(model, plan, ip, int_only=True, stem_s2d=True)
        xi = e0.condition_input(x)
        np.testing.assert_array_equal(
            np.asarray(e0(xi)), np.asarray(e1(xi)), err_msg=name
        )
