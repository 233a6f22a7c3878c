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
    model = get_model(name, cfg, num_classes=num_classes, image_size=hw)
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

    # d is on the 2^out_fl grid; b is at real scale.  b quantizes the pooled
    # activation with float round-half-even (fix_quant) while d requantized it
    # with the integer tie-fix (int_op_only_fix_quant) -- the reference pair
    # diverges identically at exact .5-ulp ties (fix_quant_ops.py:15-45 vs
    # :418-431), flipping a handful of classifier inputs by one ulp.
    scale = 2.0 ** plan["classifier"].out_fl
    np.testing.assert_allclose(np.asarray(logits_b), y_d / scale, rtol=0, atol=5e-2)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(logits_b), -1), np.argmax(y_d, -1)
    )
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
    model = get_model("resnet18", cfg, num_classes=10, image_size=32)
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


def test_quant_maxpool_wiring():
    """quant_maxpool swaps FXQMaxPool2d into the ResNet head
    (fix_resnet.py:331-334).  On the non-negative post-ReLU input the
    zero-padding pool is value-identical to the stock -inf-padding pool, so
    the two configs must agree bit-for-bit; the engines must stay bit-equal."""
    model_q, params, state, x = _trained_model("resnet18", BASE.replace(quant_maxpool=True))
    model_s = get_model("resnet18", BASE, num_classes=10, image_size=32)

    yq, _ = model_q.apply(params, state, x, mode="eval")
    ys, _ = model_s.apply(params, state, x, mode="eval")
    np.testing.assert_array_equal(np.asarray(yq), np.asarray(ys))

    plan, int_params = bake_plan(model_q, params, state)
    ei = IntEngine(model_q, plan, int_params, int_only=True)
    es = IntEngine(model_q, plan, int_params, int_only=False)
    np.testing.assert_array_equal(
        np.asarray(ei(ei.condition_input(x))), np.asarray(es(es.condition_input(x)))
    )


@pytest.mark.parametrize("name,hw", [("resnet18", 96), ("mobilenet_v1", 64)])
def test_non224_pool_extent_all_modes(name, hw):
    """Non-224 input sizes: the avgpool shift/pool-fusing scale must be
    derived from the actual pooled extent (fix_quant_ops.py:117-124).
    96 -> 3x3 pool (shift 3, residue 8/9, non-trivial); 64 -> 2x2 (shift 2,
    residue 1).  All four modes must stay consistent."""
    model, params, state, x = _trained_model(name, BASE, hw=hw)
    plan, int_params = bake_plan(model, params, state)

    ei = IntEngine(model, plan, int_params, int_only=True)
    es = IntEngine(model, plan, int_params, int_only=False)
    y_int = np.asarray(ei(ei.condition_input(x)))
    y_sim = np.asarray(es(es.condition_input(x)))
    np.testing.assert_array_equal(y_int, y_sim)

    # int_infer QAT graph agrees at real scale (no pool fusing in QAT)
    cfg_nf = BASE.replace(pool_fusing=False)
    model_nf, params_nf, state_nf, x_nf = _trained_model(name, cfg_nf, hw=hw)
    plan_nf, ip_nf = bake_plan(model_nf, params_nf, state_nf)
    logits_b, _ = model_nf.apply(
        params_nf, state_nf, x_nf, mode="eval", cfg=cfg_nf.replace(int_infer=True)
    )
    e_nf = IntEngine(model_nf, plan_nf, ip_nf, int_only=True)
    y_d = np.asarray(e_nf(e_nf.condition_input(x_nf)))
    scale = 2.0 ** plan_nf["classifier"].out_fl
    # .5-ulp tie flips between float round-half-even and the integer tie-fix
    # (see test_qat_modes_agree_with_engine_resnet18)
    np.testing.assert_allclose(np.asarray(logits_b), y_d / scale, rtol=0, atol=5e-2)


def test_mismatched_pool_extent_raises():
    """Building for 224 (7x7 pool) but feeding 32x32 must be a loud error,
    not a silently wrong shift."""
    model = get_model("resnet18", BASE, num_classes=10, image_size=224)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))) / 256
    with pytest.raises(ValueError, match="extent"):
        model.apply(params, state, x, mode="eval")


def test_per_channel_int_infer_guard():
    """per-channel fraclens have no integer-inference scale contract on the
    conv path (the reference's own per-channel int_infer fails the same way,
    fix_quant_ops.py:430): require a clear error, not channel-0 truncation."""
    cfg = BASE.replace(format_type="per_channel", pool_fusing=False)
    model = get_model("resnet18", cfg, num_classes=10, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))) / 256
    _, state = model.apply(params, state, x, mode="train")
    with pytest.raises(NotImplementedError, match="per_layer"):
        model.apply(params, state, x, mode="eval", cfg=cfg.replace(int_infer=True))


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


@pytest.mark.parametrize("name", ["resnet18", "mobilenet_v2"])
def test_border_bias_bitexact_vs_pad(name):
    """The zero-point border-bias path (conv-internal zero padding + the
    position-dependent 128*conv(ones, w) correction) must be bit-equal to
    the explicit -128 pad path on every model family."""
    model, params, state, x = _trained_model(name, BASE)
    plan, int_params = bake_plan(model, params, state)
    e_pad = IntEngine(model, plan, int_params, int_only=True, border_bias=False)
    e_bb = IntEngine(model, plan, int_params, int_only=True, border_bias=True)
    xi = e_pad.condition_input(x)
    np.testing.assert_array_equal(np.asarray(e_pad(xi)), np.asarray(e_bb(xi)))


def test_dw_int_path_bitexact():
    """Depthwise via the s8/s32 int conv (dw_int=True) produces identical
    integers to the default exact-f32 VPU path, both MobileNet families."""
    for name in ("mobilenet_v1", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE)
        plan, ip = bake_plan(model, params, state)
        eng = IntEngine(model, plan, ip, int_only=True)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        eng2 = IntEngine(model, plan, ip, int_only=True, dw_int=True)
        np.testing.assert_array_equal(np.asarray(eng2(xi)), ref, err_msg=name)


def test_f32_requant_engine_bitexact():
    """The f32 requant fast path (default on) is bit-identical to the pure
    integer engine on every family, both packing regimes."""
    for name in ("resnet18", "mobilenet_v1", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE)
        plan, ip = bake_plan(model, params, state)
        eng = IntEngine(model, plan, ip, int_only=True, f32_requant=False)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        eng2 = IntEngine(model, plan, ip, int_only=True, f32_requant=True)
        np.testing.assert_array_equal(np.asarray(eng2(xi)), ref, err_msg=name)
        # and the fast path actually engages somewhere
        from f8net_tpu.engine.int_engine import compute_requant_bounds
        from f8net_tpu.ops import requant_f32_eligible

        bounds = compute_requant_bounds(model, plan, eng2.int_params)
        assert any(b < (1 << 24) for b in bounds.values()), name


@pytest.mark.parametrize(
    "name", ["resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2"]
)
def test_requant_form_audit(name):
    """audit_requant_forms captures every static requant decision via one
    abstract trace, every requant carries a bound (VERDICT r3 #5: bounds are
    propagated through relu/maxpool/add AND the avgpool sum, so the
    classifier-input requant -- previously always integer -- is eligible
    too), and at these model sizes the eligibility rule accepts every
    requant: no integer-form stragglers remain."""
    model, params, state, x = _trained_model(name, BASE)
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip, int_only=True)
    xi = eng.condition_input(x)
    log = eng.audit_requant_forms(xi)
    assert log, name
    consumers = [c for c, _, _ in log]
    # the classifier pack (fed by the avgpool sum) is audited and f32
    assert "classifier" in consumers, consumers
    assert all(b is not None for _, _, b in log), log
    stragglers = [(c, b) for c, f, b in log if f == "int"]
    assert not stragglers, stragglers
    # the audit is pure bookkeeping: engine output is unchanged and
    # bit-equal to the pure-integer form
    eng0 = IntEngine(model, plan, ip, int_only=True, f32_requant=False)
    np.testing.assert_array_equal(np.asarray(eng(xi)), np.asarray(eng0(xi)))


def test_dw_taps_path_bitexact():
    """Depthwise as the fused f32 tap chain (dw_taps=True) produces
    identical integers to the default path on both MobileNet families --
    covers stride-1 and stride-2 depthwise, signed and unsigned inputs
    (zero-point -128 pads)."""
    for name in ("mobilenet_v1", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE)
        plan, ip = bake_plan(model, params, state)
        eng = IntEngine(model, plan, ip, int_only=True, dw_taps=False)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        eng2 = IntEngine(model, plan, ip, int_only=True, dw_taps=True)
        np.testing.assert_array_equal(np.asarray(eng2(xi)), ref, err_msg=name)
        # the taps branch actually engages: every depthwise layer's bound
        # is within the f32-exact gate on these baked models
        from f8net_tpu.engine.int_engine import compute_requant_bounds

        bounds = compute_requant_bounds(model, plan, eng2.int_params)
        dw = [
            n for n in model.graph.names()
            if getattr(model.graph[n], "is_depthwise", False)
        ]
        assert dw and all(bounds[n] < (1 << 24) for n in dw), name


@pytest.mark.parametrize("policy", ["1x1", "eligible"])
def test_mxu_bf16_engine_bitexact(policy):
    """bf16-operand MXU convs (mxu_bf16 policy) are bit-identical to the
    s8->s32 conv form on every family: int8 values are exact in bf16, MXU
    products accumulate in f32, and the static bound (the same one that
    licenses the f32 requant) keeps the accumulator under 2^24 where f32
    integer accumulation is exact regardless of order."""
    for name in ("resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE)
        plan, ip = bake_plan(model, params, state)
        eng = IntEngine(model, plan, ip, int_only=True, mxu_bf16="")
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        eng2 = IntEngine(model, plan, ip, int_only=True, mxu_bf16=policy)
        np.testing.assert_array_equal(
            np.asarray(eng2(xi)), ref, err_msg=f"{name}/{policy}"
        )
        # the path actually engages: the bf16 engine's jaxpr carries more
        # bf16 ops than the default engine's (whose only bf16 convs are the
        # depthwise/tiny-C exact-f32 detours)
        jx0 = jax.make_jaxpr(eng._jit)(eng.int_params, xi)
        jx2 = jax.make_jaxpr(eng2._jit)(eng2.int_params, xi)
        cnt = lambda jx: str(jx).count("bf16")
        assert cnt(jx2) > cnt(jx0), (name, policy)


def test_bf16_boundary_relaxed_mode():
    """The relaxed-boundary throughput mode (bf16_boundary=True) is the
    ONLY non-bit-exact engine mode and is clearly flagged as such: fused
    int8 chains are identical, but residual/stem boundaries carry bf16
    values (integize-grade).  Contract tested here: (a) the relaxed mode
    is NO FARTHER from the QAT float referent than the bit-exact engine
    (its accuracy claim), and close to the bit-exact engine; (b) the mode
    actually changes the boundary dataflow (bf16 ops appear); (c) it
    refuses to compose with the alternative materialization paths
    (pallas/stem kernels)."""
    for name in ("resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE, n=4)
        plan, ip = bake_plan(model, params, state)
        e0 = IntEngine(model, plan, ip, int_only=True)
        e1 = IntEngine(model, plan, ip, int_only=True, bf16_boundary=True)
        xi = e0.condition_input(x)
        a, b = np.asarray(e0(xi)), np.asarray(e1(xi))
        qat = np.asarray(model.apply(params, state, x, mode="eval")[0])
        cos = lambda u, v: (
            (u * v).sum(-1)
            / (np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1))
        )
        # within float-noise of the bit-exact engine's own distance to the
        # float referent (these are random-weight toys with near-degenerate
        # logits; trained models sit far tighter)
        assert cos(b, qat).min() >= cos(a, qat).min() - 0.02, (
            name, cos(a, qat).min(), cos(b, qat).min()
        )
        assert cos(a, b).min() >= 0.97, (name, cos(a, b).min())
        jx = str(jax.make_jaxpr(e1._jit)(e1.int_params, xi))
        assert "bf16" in jx, name
    with pytest.raises(AssertionError):
        IntEngine(model, plan, ip, int_only=True, bf16_boundary=True,
                  use_pallas="dw")


def test_bf16_boundary_normalized_and_float_avgpool_paths():
    """Relaxed-mode coverage of the two non-default graph paths: the
    normalized (signed-head) pipeline and the float-mean avgpool fallback
    (cfg.quant_avgpool=False).  Both must run and stay argmax-consistent
    with the strict engine (relaxed touches only boundary carries)."""
    for cfg in (
        BASE.replace(normalize=True),
        BASE.replace(quant_avgpool=False, pool_fusing=False),
    ):
        model = get_model("resnet18", cfg, num_classes=10, image_size=32)
        params, state = model.init(jax.random.PRNGKey(0))
        x = (
            jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
            if cfg.normalize
            else jnp.round(
                255 * jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
            ) / 256
        )
        for _ in range(3):
            _, state = model.apply(params, state, x, mode="train")
        plan, ip = bake_plan(model, params, state)
        e0 = IntEngine(model, plan, ip, int_only=True)
        e1 = IntEngine(model, plan, ip, int_only=True, bf16_boundary=True)
        xi = e0.condition_input(x)
        a, b = np.asarray(e0(xi)), np.asarray(e1(xi))
        assert b.shape == a.shape and np.isfinite(b).all()
        cosr = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        )
        assert cosr.min() >= 0.97, (cfg.normalize, cosr.min())


def test_int8_boundary_relaxed_mode():
    """The 1-byte boundary mode (int8_boundary=True): carries requantize
    once onto the next conv's QAT input grid -- the standard production
    int8 residual dataflow.  Contract: (a) no farther from the QAT float
    referent than the bit-exact engine (same bar as bf16_boundary);
    (b) the ResNet stem maxpool actually runs on int8 (the mode's memory
    claim); (c) refuses to compose with pallas paths or bf16_boundary."""
    for name in ("resnet18", "resnet50", "mobilenet_v2"):
        model, params, state, x = _trained_model(name, BASE, n=4)
        plan, ip = bake_plan(model, params, state)
        e0 = IntEngine(model, plan, ip, int_only=True)
        e8 = IntEngine(model, plan, ip, int_only=True, int8_boundary=True)
        xi = e0.condition_input(x)
        a, b = np.asarray(e0(xi)), np.asarray(e8(xi))
        qat = np.asarray(model.apply(params, state, x, mode="eval")[0])
        cos = lambda u, v: (
            (u * v).sum(-1)
            / (np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1))
        )
        assert cos(b, qat).min() >= cos(a, qat).min() - 0.05, (
            name, cos(a, qat).min(), cos(b, qat).min()
        )
        assert cos(a, b).min() >= 0.95, (name, cos(a, b).min())
        if name.startswith("resnet"):
            jx = str(jax.make_jaxpr(e8._jit)(e8.int_params, xi))
            # stem maxpool on the packed int8 tensor: reduce_window over i8
            import re
            assert re.search(r"i8\[[0-9,]+\] = reduce_window\[", jx), name
    with pytest.raises(AssertionError):
        IntEngine(model, plan, ip, int_only=True, int8_boundary=True,
                  use_pallas="dw")
    with pytest.raises(AssertionError):
        IntEngine(model, plan, ip, int_only=True, int8_boundary=True,
                  bf16_boundary=True)


def test_int8_boundary_degenerates_on_mbv1():
    """MobileNetV1 is a pure single-consumer chain (no residual adds, no
    stem maxpool -- reference fix_mobilenet_v1.py), so the 1-byte boundary
    mode has nothing to relax: every carry is already an int8 activation on
    its producer's grid.  Pin the degeneracy BITWISE -- int8_boundary must
    equal the strict contract exactly on MBv1 (on the residual families it
    only has to stay within the QAT-referent tolerance, the test above)."""
    model, params, state, x = _trained_model("mobilenet_v1", BASE, n=4)
    plan, ip = bake_plan(model, params, state)
    e0 = IntEngine(model, plan, ip, int_only=True)
    e8 = IntEngine(model, plan, ip, int_only=True, int8_boundary=True)
    xi = e0.condition_input(x)
    a, b = np.asarray(e0(xi)), np.asarray(e8(xi))
    assert (a == b).all(), np.abs(a - b).max()
