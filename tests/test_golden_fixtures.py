"""Golden fixtures: the reference's bundled training logs parse into
per-layer fraclen profiles that map onto our layer graphs.

The fraclen_visual/*.out logs are ground-truth per-layer profiles of
trained models (SURVEY.md §2.5); our report parser must ingest them
(tooling compatibility) and their layer vocabulary must correspond 1:1 to
our graph names, so an imported reference checkpoint lands on the right
layers.
"""

import os

import pytest

from f8net_tpu.models import get_model
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.reporting import parse_fraclen_report

REF = "/root/reference/fraclen_visual"
CFG = QuantConfig(format_from_metric=True, metric="std")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference logs not mounted"
)


def _ref_layer_to_ours(name: str) -> str:
    # the reference names sequential wrappers head.0 / tail.0 / classifier.0
    for stem in ("head", "tail", "classifier"):
        if name == f"{stem}.0":
            return stem
    return name


def _parse(fname):
    with open(os.path.join(REF, fname), errors="replace") as f:
        return parse_fraclen_report(f.read())


def test_mbv2_log_maps_onto_graph():
    parsed = _parse("mbv2_fix_quant.out")
    model = get_model("mobilenet_v2", CFG)
    ours = set(model.graph.names())
    mapped = {_ref_layer_to_ours(n) for n in parsed}
    assert mapped == ours, mapped ^ ours
    # ground-truth profile facts (BASELINE.md): tail input fraclen 6,
    # classifier input fraclen 8
    assert parsed["tail.0"]["input_fraclen"][0] == 6.0
    assert parsed["classifier.0"]["input_fraclen"][0] == 8.0
    assert parsed["tail.0"]["weight_fraclen"][0] == 7.0
    # every layer carries both fraclens
    for n, d in parsed.items():
        assert "input_fraclen" in d and "weight_fraclen" in d, n
        assert 0.0 <= d["weight_fraclen"][0] <= 7.0


def test_res50_logs_map_onto_graph():
    model = get_model("resnet50", CFG)
    ours = set(model.graph.names())
    for fname in (
        "res50_fix_quant_ptcv_pretrained.out",
        "res50_fix_quant_nvidia_pretrained.out",
    ):
        parsed = _parse(fname)
        mapped = {_ref_layer_to_ours(n) for n in parsed}
        assert mapped == ours, (fname, mapped ^ ours)
        # head consumes fraclen-8 input in these normalized?-no: ptcv tiny
        # finetuning uses normalize, head signed; fraclens within range
        for n, d in parsed.items():
            if "input_fraclen" in d and d["input_fraclen"]:
                assert 0.0 <= d["input_fraclen"][0] <= 8.0, (fname, n)


def test_profiles_usable_by_visual_tool():
    from f8net_tpu.tools.fraclen_visual import profile_table

    parsed = _parse("mbv2_fix_quant.out")
    table = profile_table(parsed)
    assert "tail.0\t6.0\t7.0" in table


def test_mbv2_log_fraclens_bake_through_conversion():
    """Imported-profile path: seed the input-fraclen EMA buffers with the
    reference's bundled trained-model profile (mbv2_fix_quant.out) and run
    the integer conversion -- every layer's baked input_fl must reproduce
    the logged value exactly (this also cross-checks the master/following
    EMA-owner indirection against the reference's own logs: a follower's
    logged fraclen must equal its owner's or the assertion fails)."""
    import jax
    import jax.numpy as jnp

    from f8net_tpu.quant import bake_plan

    parsed = _parse("mbv2_fix_quant.out")
    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    model = get_model("mobilenet_v2", cfg, num_classes=1000, image_size=224)
    params, state = model.init(jax.random.PRNGKey(0))

    state = {name: dict(st) for name, st in state.items()}
    for ref_name, d in parsed.items():
        ours = _ref_layer_to_ours(ref_name)
        if "input_fl_ema" in state.get(ours, {}):
            state[ours]["input_fl_ema"] = jnp.full_like(
                state[ours]["input_fl_ema"], float(d["input_fraclen"][0])
            )

    plan, _ = bake_plan(model, params, state)
    for ref_name, d in parsed.items():
        ours = _ref_layer_to_ours(ref_name)
        if model.graph[ours].weight_only:
            # the log prints the dormant EMA buffer, but weight-only layers
            # consume fraclen-8 raw input (reference get_input_fraclen;
            # ours: nn/quant_layers.py:input_fraclen)
            assert plan[ours].input_fl == 8, ours
            continue
        want = int(round(d["input_fraclen"][0]))
        assert plan[ours].input_fl == want, (ours, plan[ours].input_fl, want)
