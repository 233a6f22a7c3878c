"""The accuracy-parity harness dry-runs end to end on synthetic data.

Proves the one-command plumbing (config load -> model -> checkpoint hook ->
val loader -> four eval modes -> table) works today, so the real parity table
is producible the moment ImageNet + Model Zoo artifacts are available."""

import io
from contextlib import redirect_stdout

from f8net_tpu.parity import MODES, PUBLISHED, evaluate_parity, print_table


def test_synthetic_dry_run_all_modes():
    results, total, fraclen_check = evaluate_parity(
        "resnet18",
        "conventional",
        synthetic=True,
        batch_size=8,
        limit_batches=2,
        image_size=32,
        num_classes=16,
    )
    assert total == 16
    assert fraclen_check is None  # no checkpoint, no profile requested
    assert set(results) == set(MODES)
    for m in MODES:
        assert 0.0 <= results[m]["top1"] <= 100.0
        assert results[m]["top1"] <= results[m]["top5"]
    # the two integer-graph modes are bit-identical by construction
    assert results["integize"]["top1"] == results["int_op_only"]["top1"]
    assert results["integize"]["top5"] == results["int_op_only"]["top5"]

    buf = io.StringIO()
    with redirect_stdout(buf):
        print_table("resnet18", "conventional", results, total)
    out = buf.getvalue()
    assert "published" in out and "71.0" in out and "int_op_only" in out


def test_golden_fraclen_diff_plumbing():
    """check_golden_fraclens flags exactly the perturbed layer (synthetic
    fixture of the reference dump vocabulary, VERDICT r2 item 7)."""
    import jax

    from f8net_tpu.models import get_model
    from f8net_tpu.parity import check_golden_fraclens, print_fraclen_table
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    cfg = QuantConfig(format_from_metric=True, metric="std")
    model = get_model("resnet18", cfg, num_classes=16, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, _ = bake_plan(model, params, state)

    # synthesize a profile in the reference's dump vocabulary from the baked
    # plan itself (head.0-style wrapper names), then perturb one layer
    lines = []
    for name in model.graph.names():
        lp = plan[name]
        ref = f"{name}.0" if name in ("head", "tail", "classifier") else name
        want_in = 8 if model.graph[name].weight_only else lp.input_fl
        lines.append(f"layer name: {ref}.")
        lines.append(f"input_fraclen: tensor([{float(want_in)}], device='cuda:0').")
        lines.append(f"weight_fraclen: {float(lp.weight_fl)}.")
    rows, n_bad = check_golden_fraclens(model, plan, "\n".join(lines))
    assert n_bad == 0 and len(rows) == len(list(model.graph.names()))

    # perturb one mid-stack layer's weight fraclen -> exactly one mismatch
    victim = list(model.graph.names())[3]
    bad_lines = []
    for name in model.graph.names():
        lp = plan[name]
        ref = f"{name}.0" if name in ("head", "tail", "classifier") else name
        want_in = 8 if model.graph[name].weight_only else lp.input_fl
        w = lp.weight_fl + (1 if name == victim else 0)
        bad_lines.append(f"layer name: {ref}.")
        bad_lines.append(f"input_fraclen: tensor([{float(want_in)}]).")
        bad_lines.append(f"weight_fraclen: {float(w)}.")
    rows, n_bad = check_golden_fraclens(model, plan, "\n".join(bad_lines))
    assert n_bad == 1
    assert [r[0] for r in rows if not r[5]] == [victim]

    # unknown layer names are reported as mismatches, not dropped
    rows, n_bad = check_golden_fraclens(
        model, plan, "layer name: not_a_layer.\nweight_fraclen: 3.0."
    )
    assert n_bad == 1 and rows[0][0] == "not_a_layer"

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        print_fraclen_table(rows, n_bad, "fixture")
    assert "MISMATCH" in buf.getvalue()


def test_published_table_covers_readme():
    """The harness knows every 8-bit row of the reference README table."""
    assert PUBLISHED[("resnet18", "tiny_finetuning")] == 72.3
    assert PUBLISHED[("resnet50", "tiny_finetuning")] == 77.6
    assert PUBLISHED[("mobilenet_v1", "conventional")] == 72.8
