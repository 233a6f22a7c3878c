"""Megatron-paired TP integer engine (engine/tp_engine.py): bit-equality
against the single-device engine on the virtual 8-device mesh, for all
three families, plus the collective structure it exists for (psums only,
no all-gathers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.tp_engine import int_forward_tp, tp_modes
from f8net_tpu.models import get_model
from f8net_tpu.parallel import batch_sharding, make_mesh
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def _baked(name, hw=32, n=8, seed=0):
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
    "name,dp,tp",
    [
        ("resnet18", 4, 2),
        ("resnet18", 2, 4),
        ("resnet50", 4, 2),  # bottleneck: col -> row -> row (2 psums)
        ("mobilenet_v1", 2, 4),
        ("mobilenet_v2", 4, 2),
    ],
)
def test_tp_engine_bitexact_vs_single_device(name, dp, tp):
    model, plan, ip, x = _baked(name)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    mesh = make_mesh(data=dp, model=tp)
    xd = jax.device_put(xi, batch_sharding(mesh))
    # params are tracers under jit, so the f32-requant bounds must be
    # precomputed outside and closed over (they are static Python ints)
    from f8net_tpu.engine.tp_engine import tp_requant_bounds

    bounds = tp_requant_bounds(model, plan, ip)
    fwd = jax.jit(
        lambda v, p: int_forward_tp(
            model, plan, p, v, mesh, CFG, requant_bounds=bounds
        )
    )
    out = np.asarray(fwd(xd, ip))
    np.testing.assert_array_equal(out, ref)
    # and without bounds: the walker must silently fall back to the pure
    # integer requant under traced params -- still bit-identical
    fwd2 = jax.jit(lambda v, p: int_forward_tp(model, plan, p, v, mesh, CFG))
    np.testing.assert_array_equal(np.asarray(fwd2(xd, ip)), ref)


def test_tp_engine_collective_structure():
    """The whole sharded model must lower to psums (all-reduce) with ZERO
    all-gathers -- the point of the explicit pairing."""
    model, plan, ip, x = _baked("mobilenet_v2")
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    mesh = make_mesh(data=2, model=4)
    xd = jax.device_put(xi, batch_sharding(mesh))
    fwd = jax.jit(lambda v, p: int_forward_tp(model, plan, p, v, mesh, CFG))
    hlo = fwd.lower(xd, ip).compile().as_text()
    assert "all-gather" not in hlo
    assert "all-reduce" in hlo

    # mode assignment covers every layer exactly once
    modes = tp_modes(model)
    assert set(modes) == set(model.graph.names())


def test_tp_engine_modes_cover_all_families():
    for name in ("resnet50", "mobilenet_v1", "mobilenet_v2"):
        model = get_model(name, CFG, num_classes=16, image_size=32)
        modes = tp_modes(model)
        assert set(modes) == set(model.graph.names()), name
        assert all(v in ("col", "row", "shard", "rep") for v in modes.values())


def test_tp_engine_normalized_pipeline():
    """Signed (double-side) head input: no zero-point compensation, zero
    padding -- the other conv_int branch of the TP walker."""
    cfg = CFG.replace(normalize=True)
    model = get_model("resnet18", cfg, num_classes=16, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    from f8net_tpu.quant import bake_plan

    plan, ip = bake_plan(model, params, state)
    assert plan["head"].input_symmetric
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))
    mesh = make_mesh(data=2, model=4)
    xd = jax.device_put(xi, batch_sharding(mesh))
    out = np.asarray(int_forward_tp(model, plan, ip, xd, mesh, cfg))
    np.testing.assert_array_equal(out, ref)


def test_tp_engine_f32_requant_bitexact():
    """The f32 requant fast path (static-bound eligibility) must be
    bit-equal to the pure-integer shift chain under sharding too -- the
    bound is computed from FULL weights, so it covers every shard's
    accumulators (row: the post-psum total; col/shard: a channel subset)."""
    model, plan, ip, x = _baked("mobilenet_v2")
    eng = IntEngine(model, plan, ip, f32_requant=False)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))
    mesh = make_mesh(data=2, model=4)
    xd = jax.device_put(xi, batch_sharding(mesh))
    for f32rq in (False, True):
        out = np.asarray(
            int_forward_tp(model, plan, ip, xd, mesh, CFG, f32_requant=f32rq)
        )
        np.testing.assert_array_equal(out, ref, err_msg=f"f32_requant={f32rq}")

def test_tp_engine_mxu_bf16_bitexact():
    """bf16-operand MXU convs under TP: col-mode output-channel shards and
    row-mode K-shard partials (each bounded by 128*sum_subset|w| <= the
    full-layer bound, so f32-exact pre-psum) are bit-equal to the integer
    engine on both families that exercise all three conv modes."""
    for name in ("resnet50", "mobilenet_v2"):
        model, plan, ip, x = _baked(name)
        eng = IntEngine(model, plan, ip, f32_requant=False)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        mesh = make_mesh(data=2, model=4)
        xd = jax.device_put(xi, batch_sharding(mesh))
        for policy in ("1x1", "eligible"):
            out = np.asarray(
                int_forward_tp(
                    model, plan, ip, xd, mesh, CFG, mxu_bf16=policy
                )
            )
            np.testing.assert_array_equal(
                out, ref, err_msg=f"{name}/mxu_bf16={policy}"
            )


def test_tp_engine_bf16_boundary_matches_single_device():
    """Relaxed-boundary throughput mode under TP: every boundary conversion
    runs on the post-psum int32 total (row mode) or a channel shard of the
    single-device accumulator (col/shard), so TP bf16_boundary is bit-equal
    to the single-device bf16_boundary engine -- the mode trades exactness
    against the INT32 CONTRACT, not determinism across shardings."""
    for name in ("resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2"):
        model, plan, ip, x = _baked(name)
        eng = IntEngine(model, plan, ip, bf16_boundary=True)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        # (accuracy vs the bit-exact contract is pinned in
        # test_int_engine.py::test_bf16_boundary_relaxed_mode; here we pin
        # that SHARDING does not add any further divergence at all)
        mesh = make_mesh(data=2, model=4)
        xd = jax.device_put(xi, batch_sharding(mesh))
        from f8net_tpu.engine.tp_engine import tp_requant_bounds

        bounds = tp_requant_bounds(model, plan, ip)
        out = np.asarray(
            int_forward_tp(
                model, plan, ip, xd, mesh, CFG, requant_bounds=bounds,
                bf16_boundary=True,
            )
        )
        np.testing.assert_array_equal(out, ref, err_msg=name)


def test_tp_engine_int8_boundary_matches_single_device():
    """1-byte boundary mode under TP: packed carries widen on post-psum
    totals, so TP int8_boundary is bit-equal to the single-device
    int8-boundary engine on every family."""
    for name in ("resnet18", "resnet50", "mobilenet_v2"):
        model, plan, ip, x = _baked(name)
        eng = IntEngine(model, plan, ip, int8_boundary=True)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        mesh = make_mesh(data=2, model=4)
        xd = jax.device_put(xi, batch_sharding(mesh))
        from f8net_tpu.engine.tp_engine import tp_requant_bounds

        bounds = tp_requant_bounds(model, plan, ip)
        out = np.asarray(
            int_forward_tp(
                model, plan, ip, xd, mesh, CFG, requant_bounds=bounds,
                int8_boundary=True,
            )
        )
        np.testing.assert_array_equal(out, ref, err_msg=name)
