"""Adversarial numerics: degenerate inputs, saturation, and seeded fuzz of
the cross-mode bit-exactness claim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.ops import fix_quant, metric2fraclen, shift_requant
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


class TestDegenerate:
    def test_metric2fraclen_zero_metric(self):
        # zero std (constant tensor) -> log2(inf) -> clamps to the max fl
        assert float(metric2fraclen(jnp.asarray(0.0), "std", 1.0, True)) == 7.0
        assert float(metric2fraclen(jnp.asarray(0.0), "std", 1.0, False)) == 8.0

    def test_all_zero_image_through_everything(self):
        model = get_model("resnet18", CFG, num_classes=10, image_size=32)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 32, 32, 3))
        logits, new_state = model.apply(params, state, x, mode="train")
        assert np.all(np.isfinite(np.asarray(logits)))
        plan, ip = bake_plan(model, params, new_state)
        eng = IntEngine(model, plan, ip)
        y = eng(eng.condition_input(x))
        assert np.all(np.isfinite(np.asarray(y)))

    def test_constant_image(self):
        model = get_model("mobilenet_v1", CFG, num_classes=10, image_size=32)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.full((1, 32, 32, 3), 0.5)
        logits, _ = model.apply(params, state, x, mode="train")
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_saturating_activations(self):
        # alpha tiny -> fix_scaling tiny -> folded weights huge -> saturation
        model = get_model("resnet18", CFG, num_classes=10, image_size=32)
        params, state = model.init(jax.random.PRNGKey(0))
        for name in params:
            if "alpha" in params[name]:
                params[name]["alpha"] = jnp.asarray(0.05)
        x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))) / 256
        _, state = model.apply(params, state, x, mode="train")
        plan, ip = bake_plan(model, params, state)
        ei = IntEngine(model, plan, ip, int_only=True)
        es = IntEngine(model, plan, ip, int_only=False)
        y_int = np.asarray(ei(ei.condition_input(x)))
        y_sim = np.asarray(es(es.condition_input(x)))
        # saturation must hit clamps identically on both paths
        np.testing.assert_array_equal(y_int, y_sim)

    def test_shift_requant_extremes(self):
        # at INT32_MAX the rounding-bias add wraps in int32 exactly like the
        # reference's torch path (x + (1 << (net-1)) on int32 tensors):
        # bit-parity includes this overflow behavior
        x = jnp.asarray([2**31 - 1, -(2**31 - 1), 0], jnp.int32)
        out = shift_requant(x, 8, 0, 24, True)
        np.testing.assert_array_equal(np.asarray(out), [-127, -127, 0])
        from f8net_tpu.native import build_native, fxpref_available

        if build_native() and fxpref_available():
            from f8net_tpu.native import c_shift_requant

            np.testing.assert_array_equal(
                c_shift_requant(np.asarray(x), 8, 0, 24, True), np.asarray(out)
            )
        # left shift from large values wraps like the reference's << then
        # clamps; zero shift clamps only
        out0 = shift_requant(jnp.asarray([300, -300], jnp.int32), 8, 5, 5, True)
        np.testing.assert_array_equal(np.asarray(out0), [127, -127])

    def test_fix_quant_nan_free_on_extremes(self):
        x = jnp.asarray([1e30, -1e30, 1e-30])
        q, _ = fix_quant(x, 8, 7.0, 0, True)
        np.testing.assert_array_equal(np.asarray(q), [127 / 128, -127 / 128, 0.0])


@pytest.mark.parametrize("seed", [11, 23, 77])
@pytest.mark.parametrize("name", ["resnet18", "mobilenet_v2"])
def test_cross_mode_fuzz(name, seed):
    """Seeded fuzz of float-sim == int-only (different init + data each run)."""
    model = get_model(name, CFG, num_classes=7, image_size=32)
    params, state = model.init(jax.random.PRNGKey(seed))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(seed + 1), (2, 32, 32, 3))) / 256
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    ei = IntEngine(model, plan, ip, int_only=True)
    es = IntEngine(model, plan, ip, int_only=False)
    xi = ei.condition_input(x)
    np.testing.assert_array_equal(np.asarray(ei(xi)), np.asarray(es(es.condition_input(x))))
