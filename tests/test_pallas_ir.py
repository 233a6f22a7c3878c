"""Fused inverted-residual block engine (ops/pallas_ir_block.py).

Bit-equality bar, same as every alternative materialization path in this
repo: IntEngine(fuse_ir=True) must match the default per-layer engine
BITWISE in every boundary mode -- the kernel replays the identical junction
math (s8 dots + zp bias, static-shift round-half-even requants, unpacked-
grid depthwise, saturating aligned residual add), so any deviation is a bug,
not tolerance.  Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def _baked(name="mobilenet_v2", hw=32, n=4, seed=0):
    model = get_model(name, CFG, num_classes=16, image_size=hw)
    params, state = model.init(jax.random.PRNGKey(seed))
    x = jnp.round(
        255 * jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, hw, hw, 3))
    ) / 256
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    return model, plan, ip, x


@pytest.mark.parametrize(
    "mode",
    [{}, {"bf16_boundary": True}, {"int8_boundary": True}],
    ids=["strict", "bf16b", "int8b"],
)
def test_fused_ir_bitwise_equals_per_layer(mode):
    model, plan, ip, x = _baked()
    ref = IntEngine(model, plan, ip, **mode)
    fus = IntEngine(model, plan, ip, fuse_ir=True, **mode)
    xi = ref.condition_input(x)
    np.testing.assert_array_equal(np.asarray(ref(xi)), np.asarray(fus(xi)))


def test_fused_ir_odd_batch_falls_back_cleanly():
    # n=3 still divides by bn=1; the point is no crash and bit-equality
    model, plan, ip, x = _baked(n=3, seed=2)
    ref = IntEngine(model, plan, ip)
    fus = IntEngine(model, plan, ip, fuse_ir=True)
    xi = ref.condition_input(x)
    np.testing.assert_array_equal(np.asarray(ref(xi)), np.asarray(fus(xi)))


def test_fused_ir_float_sim_agrees():
    # the float-sim contract engine is untouched by fuse_ir; the fused int
    # engine must still match it exactly (transitivity with the main
    # cross-mode test, but cheap and direct here)
    model, plan, ip, x = _baked(seed=3)
    sim = IntEngine(model, plan, ip, int_only=False)
    fus = IntEngine(model, plan, ip, fuse_ir=True)
    ys = np.asarray(sim(sim.condition_input(x)))
    yf = np.asarray(fus(fus.condition_input(x)))
    np.testing.assert_array_equal(ys, yf)
