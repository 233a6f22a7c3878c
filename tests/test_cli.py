"""CLI phases end-to-end on tiny synthetic configs (in-process)."""

import os

import numpy as np
import pytest
import yaml

from f8net_tpu import run as cli

BASE = {
    "dataset": "synthetic",
    "synthetic_size": 16,
    "num_classes": 5,
    "image_size": 32,
    "num_epochs": 1,
    "lr": 0.01,
    "lr_scheduler": "constant",
    "batch_size": 8,
    "data_loader_workers": 1,
    "topk": [1],
    "model": "models.fix_resnet",
    "depth": 18,
    "weight_format": [8, 7],
    "input_format": [8, 6],
    "format_from_metric": True,
    "metric": "std",
    "momentum": 0.9,
    "weight_decay": 0.0,
    "nesterov": True,
    "random_seed": 7,
    "experiment_subdir": False,
}


def _cfg(tmp_path, name, **over):
    d = dict(BASE)
    d["log_dir"] = os.path.join(tmp_path, name)
    d.update(over)
    p = os.path.join(tmp_path, f"{name}.yml")
    with open(p, "w") as f:
        yaml.safe_dump(d, f)
    return p


def test_cli_train_then_resume(tmp_path, capsys):
    p = _cfg(tmp_path, "train")
    cli.main([f"app:{p}", "bs:8"])
    out = capsys.readouterr().out
    assert "Start training." in out and "layer name: head." in out
    assert os.path.exists(os.path.join(tmp_path, "train", "latest_checkpoint.npz"))
    # resume picks up the checkpoint
    cli.main([f"app:{p}", "bs:8"])
    out = capsys.readouterr().out
    assert "Loaded checkpoint" in out


def test_cli_bn_calib_phase(tmp_path, capsys):
    p = _cfg(tmp_path, "calib", bn_calib_before_test=True, bn_calib_batch_num=1)
    cli.main([f"app:{p}", "bs:8"])
    out = capsys.readouterr().out
    assert "Start calibration." in out
    assert os.path.exists(
        os.path.join(tmp_path, "calib", "best_model_bn_calibrated.npz")
    )


def test_cli_int_op_only_phase(tmp_path, capsys):
    p = _cfg(
        tmp_path,
        "int",
        quant_bias=True,
        quant_avgpool=True,
        pool_fusing=True,
        int_infer=True,
        int_op_only=True,
        test_only=True,
        int_op_only_file_path=os.path.join(tmp_path, "int", "export"),
    )
    cli.main([f"app:{p}", "bs:8"])
    out = capsys.readouterr().out
    assert "Converted model saved" in out and "top1_error" in out
    assert os.path.exists(
        os.path.join(tmp_path, "int", "export", "checkpoints", "int_op_only_model.npz")
    )


def test_cli_test_only(tmp_path, capsys):
    p = _cfg(tmp_path, "testonly", test_only=True)
    cli.main([f"app:{p}", "bs:8"])
    out = capsys.readouterr().out
    assert "test" in out and "weight_fraclen" in out


def test_cli_train_on_jpeg_imagefolder(tmp_path, capsys):
    """End-to-end through the real data path: ImageFolder of JPEGs ->
    native batched decode -> transforms -> QAT train + eval via the CLI."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for split, n in (("train", 20), ("val", 10)):
        for c in range(5):
            os.makedirs(os.path.join(tmp_path, "data", split, f"c{c}"), exist_ok=True)
        for i in range(n):
            arr = rng.randint(0, 256, (48, 56, 3), np.uint8)
            Image.fromarray(arr).save(
                os.path.join(tmp_path, "data", split, f"c{i % 5}", f"i{i:03d}.jpg"),
                quality=80,
            )
    p = _cfg(
        tmp_path, "jpeg",
        dataset="imagenet1k_blah", dataset_dir=os.path.join(tmp_path, "data"),
        synthetic_size=None,
    )
    cli.main([f"app:{p}", "bs:8"])
    out = capsys.readouterr().out
    assert "Start training." in out and "layer name: head." in out
