"""Cross-mode equivalence: the reference's de-facto integration test.

The four eval modes of the same trained weights must agree
(README.md:76 of the reference):
  (a) QAT-sim eval          -- float ops on quantized values
  (b) int_infer eval        -- integer-valued math in float dtype, QAT graph
  (c) float-sim engine      -- converted graph, float dtype ('integize')
  (d) integer-only engine   -- converted graph, int dtype ('int_op_only')

We require (c) == (d) bit-for-bit, and (a)/(b) close to (c)/(d) up to the
documented float error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

BASE = QuantConfig(
    format_from_metric=True,
    metric="std",
    quant_bias=True,
    quant_avgpool=True,
    pool_fusing=True,
)


def _trained_model(name, cfg, steps=3, hw=32, n=2, num_classes=10, seed=0):
    model = get_model(name, cfg, num_classes=num_classes)
    params, state = model.init(jax.random.PRNGKey(seed))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, hw, hw, 3))) / 256
    for _ in range(steps):
        _, state = model.apply(params, state, x, mode="train")
    return model, params, state, x


@pytest.mark.parametrize(
    "name", ["resnet18", "resnet34", "resnet50", "resnet101", "mobilenet_v1", "mobilenet_v2"]
)
def test_float_sim_equals_int_only_bitexact(name):
    model, params, state, x = _trained_model(name, BASE)
    plan, int_params = bake_plan(model, params, state)

    eng_int = IntEngine(model, plan, int_params, int_only=True)
    eng_sim = IntEngine(model, plan, int_params, int_only=False)

    y_int = np.asarray(eng_int(eng_int.condition_input(x)))
    y_sim = np.asarray(eng_sim(eng_sim.condition_input(x)))
    # identical integer values: float-sim carries exact ints (accumulators
    # well inside the f32-exact range at these sizes)
    np.testing.assert_array_equal(y_int, y_sim)


def test_qat_modes_agree_with_engine_resnet18():
    cfg = BASE.replace(pool_fusing=False)  # pool fusing only exists post-conversion
    model, params, state, x = _trained_model("resnet18", cfg)
    plan, int_params = bake_plan(model, params, state)

    logits_a, _ = model.apply(params, state, x, mode="eval")
    logits_b, _ = model.apply(params, state, x, mode="eval", cfg=cfg.replace(int_infer=True))
    eng_int = IntEngine(model, plan, int_params, int_only=True)
    y_d = np.asarray(eng_int(eng_int.condition_input(x)))

    # d is on the 2^out_fl grid; b is at real scale
    scale = 2.0 ** plan["classifier"].out_fl
    np.testing.assert_allclose(np.asarray(logits_b), y_d / scale, rtol=0, atol=1e-3)
    # QAT-sim eval is the loosest mode; same predictions, close logits
    np.testing.assert_array_equal(
        np.argmax(np.asarray(logits_a), -1), np.argmax(y_d, -1)
    )
    np.testing.assert_allclose(np.asarray(logits_a), y_d / scale, rtol=0, atol=5e-2)


def test_plan_is_static_and_sane():
    model, params, state, _ = _trained_model("mobilenet_v2", BASE)
    plan, int_params = bake_plan(model, params, state)
    for p in plan.layers:
        assert isinstance(p.input_fl, int) and 0 <= p.input_fl <= 8
        assert isinstance(p.weight_fl, int) and 0 <= p.weight_fl <= 7
    # head of the unnormalized pipeline consumes fraclen-8 uint8 images
    assert plan["head"].input_fl == 8
    assert not plan["head"].input_symmetric
    # int8 weights within the symmetric bound
    for name, entry in int_params.items():
        w = np.asarray(entry["w"])
        assert w.dtype == np.int8
        assert w.min() >= -127 and w.max() <= 127
        if "b" in entry:
            assert np.asarray(entry["b"]).dtype == np.int32


def test_engine_jit_static_shifts():
    """All requant shifts must be trace-time constants (no traced fraclens)."""
    model, params, state, x = _trained_model("resnet18", BASE)
    plan, int_params = bake_plan(model, params, state)
    eng = IntEngine(model, plan, int_params, int_only=True)
    xi = eng.condition_input(x)
    y1 = eng(xi)
    y2 = eng(xi)  # cached executable
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert y1.dtype == jnp.float32


def test_normalized_pipeline_engine():
    cfg = BASE.replace(normalize=True)
    model = get_model("resnet18", cfg, num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    for _ in range(3):
        _, state = model.apply(params, state, x, mode="train")
    plan, int_params = bake_plan(model, params, state)
    assert plan["head"].input_symmetric  # double-side signed head
    eng_int = IntEngine(model, plan, int_params, int_only=True)
    eng_sim = IntEngine(model, plan, int_params, int_only=False)
    y_int = np.asarray(eng_int(eng_int.condition_input(x)))
    y_sim = np.asarray(eng_sim(eng_sim.condition_input(x)))
    np.testing.assert_array_equal(y_int, y_sim)


def test_int8_operands_bitexact_vs_int32():
    """The MXU int8 path (zero-point repack) == the int32 reference path."""
    model, params, state, x = _trained_model("mobilenet_v2", BASE)
    plan, int_params = bake_plan(model, params, state)
    e8 = IntEngine(model, plan, int_params, int_only=True, int8_operands=True)
    e32 = IntEngine(model, plan, int_params, int_only=True, int8_operands=False)
    xi = e8.condition_input(x)
    np.testing.assert_array_equal(np.asarray(e8(xi)), np.asarray(e32(xi)))


def test_pallas_engine_bitexact_vs_xla():
    """The Pallas conv path (fused epilogues) == the XLA engine, bit for bit
    (interpret mode on CPU)."""
    for name in ("resnet18", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE)
        plan, int_params = bake_plan(model, params, state)
        e_xla = IntEngine(model, plan, int_params, int_only=True)
        e_pal = IntEngine(model, plan, int_params, int_only=True, use_pallas=True)
        xi = e_xla.condition_input(x)
        np.testing.assert_array_equal(np.asarray(e_pal(xi)), np.asarray(e_xla(xi)))


def test_engine_without_quant_avgpool():
    """The adaptive-avgpool fallback (reference int path uses a float mean
    there, fix_resnet.py:375-382): engines still agree bit-for-bit."""
    cfg = BASE.replace(quant_avgpool=False, pool_fusing=False)
    model, params, state, x = _trained_model("resnet18", cfg)
    plan, int_params = bake_plan(model, params, state)
    ei = IntEngine(model, plan, int_params, int_only=True)
    es = IntEngine(model, plan, int_params, int_only=False)
    y_int = np.asarray(ei(ei.condition_input(x)))
    y_sim = np.asarray(es(es.condition_input(x)))
    # the float-mean fallback makes c/d agree only to float rounding on the
    # mean; classifier inputs re-quantize to the same 8-bit grid, so logits
    # agree exactly in practice
    np.testing.assert_allclose(y_int, y_sim, atol=1.0)
    assert np.mean(np.argmax(y_int, -1) == np.argmax(y_sim, -1)) == 1.0
