"""YAML flag loading, argv parsing, LR scaling rule, meters."""

import os

import numpy as np
import yaml

from f8net_tpu.utils.flags import from_flags, load_experiment, parse_argv
from f8net_tpu.utils.meters import ScalarMeter, flush_scalar_meters


def test_argv_tokens():
    app, bs, extra = parse_argv(["app:configs/x.yml", "bs:512", "foo:bar"])
    assert app == "configs/x.yml" and bs == 512 and extra == {"foo": "bar"}


def test_lr_scaling_rule():
    flags = {"lr": 0.1, "num_epochs": 10}
    _, t, _ = from_flags(flags, batch_size=2048)
    np.testing.assert_allclose(t.lr, 0.1 * 2048 / 256)
    assert t.warmup_epochs == 5  # rule sets warmup when scaling kicks in
    _, t2, _ = from_flags({"lr": 0.1}, batch_size=128)
    np.testing.assert_allclose(t2.lr, 0.1)
    assert t2.warmup_epochs == 0


def test_quant_flags_split():
    q, t, extras = from_flags(
        {
            "weight_format": [8, 7],
            "input_format": [8, 6],
            "format_from_metric": True,
            "metric": "std",
            "quant_avgpool": True,
            "lr": 0.05,
            "num_epochs": 150,
            "model": "models.fix_resnet",
            "depth": 18,
        },
        batch_size=256,
    )
    assert q.weight_format == (8, 7) and q.input_format == (8, 6)
    assert q.format_from_metric and q.metric == "std" and q.quant_avgpool
    assert t.num_epochs == 150
    assert extras["model"] == "models.fix_resnet" and extras["depth"] == 18
    # TPU-only knobs plumb through the same vocabulary
    q2, _, _ = from_flags({"train_conv_bf16": True}, batch_size=8)
    assert q2.train_conv_bf16


def test_generated_configs_load(tmp_path):
    # every YAML in configs/ must parse into valid typed configs
    import glob

    n = 0
    for path in glob.glob("configs/**/*.yml", recursive=True):
        q, t, extras = load_experiment(path, batch_size=128)
        assert t.num_classes > 0
        n += 1
    assert n >= 40


def test_meters():
    m = ScalarMeter("loss")
    m.cache(1.0)
    m.cache_list([2.0, 3.0])
    assert m.flush("avg") == 2.0
    assert m.values == []
    meters = {"a": ScalarMeter("a"), "b": ScalarMeter("b")}
    meters["a"].cache(0.12345)
    meters["b"].cache_list([1, 3])
    out = flush_scalar_meters(meters)
    assert out == {"a": 0.123, "b": 2.0}
