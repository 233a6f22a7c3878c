"""The accuracy-parity harness dry-runs end to end on synthetic data.

Proves the one-command plumbing (config load -> model -> checkpoint hook ->
val loader -> four eval modes -> table) works today, so the real parity table
is producible the moment ImageNet + Model Zoo artifacts are available."""

import io
from contextlib import redirect_stdout

from f8net_tpu.parity import MODES, PUBLISHED, evaluate_parity, print_table


def test_synthetic_dry_run_all_modes():
    results, total = evaluate_parity(
        "resnet18",
        "conventional",
        synthetic=True,
        batch_size=8,
        limit_batches=2,
        image_size=32,
        num_classes=16,
    )
    assert total == 16
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


def test_published_table_covers_readme():
    """The harness knows every 8-bit row of the reference README table."""
    assert PUBLISHED[("resnet18", "tiny_finetuning")] == 72.3
    assert PUBLISHED[("resnet50", "tiny_finetuning")] == 77.6
    assert PUBLISHED[("mobilenet_v1", "conventional")] == 72.8
