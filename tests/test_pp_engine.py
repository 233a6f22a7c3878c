"""Pipeline-parallel integer engine (engine/pp_engine.py): GPipe schedule
over a 'pipe' mesh axis must be BIT-EQUAL to the single-device engine for
every family and stage count (the stages run the unmodified _Walker code on
full tensors; only byte-preserving bitcasts and ppermute moves are new)."""

import jax
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.engine.pp_engine import (
    PPEngine,
    build_units,
    make_pipe_mesh,
    stage_bounds,
)
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

from test_tp_engine import CFG, _baked


@pytest.mark.parametrize(
    "name,stages,micro",
    [
        ("resnet18", 2, 4),
        ("resnet18", 4, 8),
        ("mobilenet_v1", 4, 8),
        ("mobilenet_v2", 4, 8),
        ("resnet50", 2, 4),
    ],
)
def test_pp_engine_bitexact_vs_single_device(name, stages, micro):
    model, plan, ip, x = _baked(name)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    mesh = make_pipe_mesh(stages)
    pp = PPEngine(model, plan, ip, mesh, microbatches=micro)
    out = np.asarray(pp(xi))
    np.testing.assert_array_equal(out, ref)


def test_pp_engine_normalized_pipeline():
    """Signed (double-side) head input crosses the wire as int8 with no
    zero-point; exercises the symmetric pack in stage 0."""
    cfg = CFG.replace(normalize=True)
    model = get_model("resnet18", cfg, num_classes=16, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    pp = PPEngine(model, plan, ip, make_pipe_mesh(2), microbatches=4, cfg=cfg)
    out = np.asarray(pp(xi))
    np.testing.assert_array_equal(out, ref)


def test_pp_engine_float_avgpool_path():
    """quant_avgpool=False: the final unit takes the float-mean fallback."""
    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=False, pool_fusing=True,
    )
    model = get_model("resnet18", cfg, num_classes=16, image_size=32)
    params, state = model.init(jax.random.PRNGKey(2))
    x = (
        np.round(
            255
            * np.asarray(
                jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
            )
        )
        / 256
    )
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    pp = PPEngine(model, plan, ip, make_pipe_mesh(2), microbatches=4, cfg=cfg)
    out = np.asarray(pp(xi))
    np.testing.assert_array_equal(out, ref)


def test_pp_engine_composes_with_data_axis():
    """2-D Mesh(('data','pipe')): each data shard pipelines its slice of
    every microbatch; still bit-equal to the single-device engine."""
    from jax.sharding import Mesh

    model, plan, ip, x = _baked("resnet18")
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    pp = PPEngine(
        model, plan, ip, mesh, microbatches=4, data_axis="data"
    )
    out = np.asarray(pp(xi))
    np.testing.assert_array_equal(out, ref)


def test_stage_bounds_partition():
    for n, s in [(10, 2), (10, 4), (7, 3), (5, 5)]:
        b = stage_bounds(n, s)
        assert b[0][0] == 0 and b[-1][1] == n
        assert all(x[1] == y[0] for x, y in zip(b, b[1:]))
        assert all(e > a for a, e in b)


def test_units_cover_all_layers():
    """Every layer's params are read by exactly the units of one stage set;
    the union covers the whole graph."""
    for name in ("resnet18", "mobilenet_v1", "mobilenet_v2"):
        model, plan, ip, _ = _baked(name, n=4)
        units, layer_sets = build_units(model, plan, CFG)
        assert len(units) == len(layer_sets)
        union = set().union(*layer_sets)
        assert union == set(model.graph.names()), name


def test_pp_weights_are_stage_local():
    """The packed parameter stack is sharded over the pipe axis: each device
    holds one stage's blob only."""
    model, plan, ip, x = _baked("resnet18", n=4)
    mesh = make_pipe_mesh(4)
    pp = PPEngine(model, plan, ip, mesh, microbatches=4)
    shard_shapes = {
        s.data.shape for s in pp._pstack.addressable_shards
    }
    assert shard_shapes == {(1, pp._pstack.shape[1])}


def test_pp_wire_cost_matches_compiled_hlo():
    """Cost accounting (VERDICT r2 item 8): the compiled program contains
    exactly ONE collective-permute per tick, and its operand byte size
    equals the engine's boundary-trace maximum (the wire pad target)."""
    import sys, os
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from pp_cost_accounting import hlo_collective_permute_bytes

    model, plan, ip, x = _baked("resnet18", n=8)
    mesh = make_pipe_mesh(4)
    pp = PPEngine(model, plan, ip, mesh, microbatches=4)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    mb = xi.shape[0] // 4
    prog = pp._program(mb, xi.shape[1:], xi.dtype)
    stream_struct = jax.ShapeDtypeStruct((4, mb) + xi.shape[1:], xi.dtype)
    pstruct = jax.ShapeDtypeStruct(pp._pstack.shape, pp._pstack.dtype)
    txt = prog.lower(stream_struct, pstruct).compile().as_text()
    sizes = hlo_collective_permute_bytes(txt)
    assert len(sizes) == 1, sizes

    metas, _ = pp._trace_boundaries(mb, xi.shape[1:], xi.dtype)
    maxbytes = max(
        int(np.prod(m[0])) * np.dtype(m[1]).itemsize for m in metas[1:]
    )
    assert sizes[0] == maxbytes, (sizes, maxbytes)


def test_pp_engine_f32_requant_bitexact():
    """f32 requant fast path through the pipeline: stage-internal requants
    use the walker's static bounds and boundary crossings carry the bound in
    the wire metadata; both settings must match the pure-integer engine."""
    import numpy as np

    from f8net_tpu.engine import IntEngine

    model, plan, ip, x = _baked("resnet18")
    eng = IntEngine(model, plan, ip, f32_requant=False)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))
    mesh = make_pipe_mesh(4)
    for f32rq in (False, True):
        pp = PPEngine(
            model, plan, ip, mesh, microbatches=4, f32_requant=f32rq
        )
        np.testing.assert_array_equal(
            np.asarray(pp(xi)), ref, err_msg=f"f32_requant={f32rq}"
        )

def test_pp_engine_mxu_bf16_bitexact():
    """bf16-operand MXU convs through the pipeline stages are bit-equal to
    the pure-integer engine (stage walkers get the same bounds + policy)."""
    import numpy as np

    from f8net_tpu.engine import IntEngine

    model, plan, ip, x = _baked("mobilenet_v2")
    eng = IntEngine(model, plan, ip, f32_requant=False)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))
    mesh = make_pipe_mesh(4)
    pp = PPEngine(model, plan, ip, mesh, microbatches=4, mxu_bf16="1x1")
    np.testing.assert_array_equal(np.asarray(pp(xi)), ref)


def test_pp_engine_bf16_boundary_matches_single_device():
    """Relaxed-boundary mode through the pipeline: stages emit bf16
    boundaries, the pipe wire bitcasts them at 2 B/elt (vs 4 for the int32
    contract), and the logits are bit-equal to the single-device
    bf16_boundary engine (same walker code, byte-preserving moves)."""
    for name, stages, micro in (
        ("resnet18", 4, 8),
        ("mobilenet_v2", 4, 8),
    ):
        model, plan, ip, x = _baked(name)
        eng = IntEngine(model, plan, ip, bf16_boundary=True)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        mesh = make_pipe_mesh(stages)
        pp = PPEngine(
            model, plan, ip, mesh, microbatches=micro, bf16_boundary=True
        )
        np.testing.assert_array_equal(np.asarray(pp(xi)), ref, err_msg=name)


def test_pp_relaxed_wire_is_half_the_int32_contract():
    """The relaxed mode's 2 B/elt claim, pinned at the wire: the PP
    boundary-trace maximum under bf16_boundary is exactly half the int32
    contract's for stage cuts whose boundary is a multi-consumer int32
    tensor in strict mode (ResNet18 4-stage cuts land on block outputs)."""
    model, plan, ip, x = _baked("resnet18", n=8)
    mesh = make_pipe_mesh(4)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    mb = xi.shape[0] // 4
    wires = {}
    for relaxed in (False, True):
        pp = PPEngine(
            model, plan, ip, mesh, microbatches=4, bf16_boundary=relaxed
        )
        metas, _ = pp._trace_boundaries(mb, xi.shape[1:], xi.dtype)
        wires[relaxed] = [
            (m[0], np.dtype(m[1]).itemsize, m[1]) for m in metas[1:]
        ]
    for (shp_s, it_s, dt_s), (shp_r, it_r, dt_r) in zip(
        wires[False], wires[True]
    ):
        assert shp_s == shp_r
        if it_s == 4:  # int32 boundary in strict mode -> bf16 in relaxed
            assert it_r == 2, (dt_s, dt_r)
    assert any(it == 4 for _, it, _ in wires[False]), "no int32 cut hit"
    assert all(it < 4 for _, it, _ in wires[True])


def test_pp_engine_int8_boundary_matches_single_device():
    """1-byte boundary mode through the pipeline: packed carries cross the
    pipe wire at 1 B/elt (metadata carries packed_for) and logits are
    bit-equal to the single-device int8-boundary engine."""
    for name in ("resnet18", "mobilenet_v2"):
        model, plan, ip, x = _baked(name)
        eng = IntEngine(model, plan, ip, int8_boundary=True)
        xi = eng.condition_input(x)
        ref = np.asarray(eng(xi))
        mesh = make_pipe_mesh(4)
        pp = PPEngine(
            model, plan, ip, mesh, microbatches=8, int8_boundary=True
        )
        np.testing.assert_array_equal(np.asarray(pp(xi)), ref, err_msg=name)
