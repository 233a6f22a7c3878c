"""Offline analysis tools: sigma->fl Monte-Carlo, fraclen visual, boxplots."""

import io

import jax
import numpy as np

from f8net_tpu.models import get_model
from f8net_tpu.tools.error_analysis import fit_threshold_coeff, quant_rel_error, sweep
from f8net_tpu.tools.fraclen_visual import profile_table
from f8net_tpu.tools.weight_boxplot import folded_weight_stats
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.reporting import fraclen_report, parse_fraclen_report

CFG = QuantConfig(format_from_metric=True, metric="std")


def test_monte_carlo_reproduces_coeff_scale():
    """The fitted threshold coefficient lands in the range that produced the
    reference's table (signed ~40, unsigned ~70) -- order-of-magnitude check
    with a small n for speed."""
    sigmas = np.logspace(-1.5, 2.5, 41)
    s, opt, table, stats = sweep(n=2000, signed=True, sigmas=sigmas)
    coeff = fit_threshold_coeff(s, opt)
    assert 10 < coeff < 160, coeff
    # optimal fraclen decreases with sigma
    assert opt[0] >= opt[-1]
    # small sigma: finest grid wins
    assert opt[0] == 7


def test_all_metrics_fit_matches_table():
    """All six coefficients (std/mae/rms x signed/unsigned) independently
    re-derived by the reference's methodology
    (fixed_quant_analysis_all_metrics.py:465-559) land within a factor ~1.5
    of the hardcoded 40/70/30/50 table in ops/fxp.py -- the table entries are
    themselves coarse roundings of such fits."""
    from f8net_tpu.ops.fxp import SIGNED_COEFF, UNSIGNED_COEFF
    from f8net_tpu.tools.error_analysis import fit_all_metrics

    fits = fit_all_metrics(n=4000)
    for signed, table in ((True, SIGNED_COEFF), (False, UNSIGNED_COEFF)):
        for m, expected in table.items():
            got = fits[signed][m]
            assert expected / 1.6 < got < expected * 1.6, (signed, m, got)
    # the key orderings the table encodes: unsigned std threshold is higher
    # (rectified tail), mae thresholds sit below std
    assert fits[False]["std"] > fits[True]["std"]
    assert fits[True]["mae"] < fits[True]["std"]


def test_error_metric_sane():
    e_fine = quant_rel_error(0.01, 7, 2000, True)
    e_coarse = quant_rel_error(0.01, 0, 2000, True)
    assert e_fine < e_coarse


def test_fraclen_visual_roundtrip():
    model = get_model("resnet18", CFG, num_classes=10)
    p, s = model.init(jax.random.PRNGKey(0))
    buf = io.StringIO()
    fraclen_report(model, p, s, CFG, print_fn=lambda t: buf.write(t + "\n"))
    parsed = parse_fraclen_report(buf.getvalue())
    table = profile_table(parsed)
    assert "head" in table and "classifier" in table
    assert len(table.splitlines()) == len(model.graph.names()) + 1


def test_weight_boxplot_stats():
    model = get_model("mobilenet_v1", CFG, num_classes=10)
    p, s = model.init(jax.random.PRNGKey(0))
    stats = folded_weight_stats(model, p, s)
    assert "head" in stats and len(stats) == len(model.conv_order) - 1  # all convs
    st = stats["head"]
    assert st["min"] <= st["q25"] <= st["median"] <= st["q75"] <= st["max"]
    assert st["std"] > 0
