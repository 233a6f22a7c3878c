"""Checkpoint importers (torch dialects) and the input pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f8net_tpu.importers import (
    load_ordered_conv_bn_fc,
    load_reference_checkpoint,
    parse_nvidia_state_dict,
)
from f8net_tpu.models import get_model
from f8net_tpu.nn.spec import ConvBNSpec, LinearSpec
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(format_from_metric=True, metric="std")


def _fake_reference_ckpt(model, rng):
    """Reference-shaped state dict (torch names/layouts) with random values."""
    sd = {}
    for lname in model.graph.names():
        spec = model.graph[lname]
        r = f"{lname}.0" if lname in ("head", "tail", "classifier") else lname
        if isinstance(spec, ConvBNSpec):
            kh, kw = spec.kernel
            sd[f"{r}.conv.weight"] = rng.randn(
                spec.out_ch, spec.in_ch // spec.groups, kh, kw
            ).astype(np.float32)
            for suffix, shape in (
                ("bn.weight", (spec.out_ch,)),
                ("bn.bias", (spec.out_ch,)),
                ("bn.running_mean", (spec.out_ch,)),
            ):
                sd[f"{r}.{suffix}"] = rng.randn(*shape).astype(np.float32)
            sd[f"{r}.bn.running_var"] = np.abs(rng.randn(spec.out_ch)).astype(np.float32) + 0.5
            sd[f"{r}.alpha"] = np.float32(rng.rand() * 10)
            sd[f"{r}.input_fraclen"] = np.float32(rng.randint(0, 8))
        else:
            sd[f"{r}.weight"] = rng.randn(spec.out_features, spec.in_features).astype(np.float32)
            sd[f"{r}.bias"] = rng.randn(spec.out_features).astype(np.float32)
            sd[f"{r}.alpha"] = np.float32(3.0)
            sd[f"{r}.input_fraclen"] = np.float32(5.0)
    return sd


def test_reference_checkpoint_import_mobilenet_v2():
    model = get_model("mobilenet_v2", CFG, num_classes=10)
    rng = np.random.RandomState(0)
    sd = _fake_reference_ckpt(model, rng)
    # DataParallel prefix must be stripped
    sd = {f"module.{k}": v for k, v in sd.items()}
    params, state = load_reference_checkpoint(model, sd)
    # layout: OIHW -> HWIO round trip on a depthwise conv
    lname = "stage_1_layer_0.body.1"
    want = np.transpose(sd[f"module.{lname}.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(params[lname]["w"]), want)
    # classifier transpose
    np.testing.assert_array_equal(
        np.asarray(params["classifier"]["w"]),
        sd["module.classifier.0.weight"].T,
    )
    assert float(state["tail"]["input_fl_ema"][0]) == float(sd["module.tail.0.input_fraclen"])
    # the imported net runs
    logits, _ = model.apply(params, state, jnp.zeros((1, 32, 32, 3)), mode="eval")
    assert logits.shape == (1, 10)


def test_ordered_conv_bn_fc_import_resnet18():
    model = get_model("resnet18", CFG, num_classes=10)
    rng = np.random.RandomState(1)
    entries = []
    for lname in model.conv_order:
        spec = model.graph[lname]
        if isinstance(spec, ConvBNSpec):
            kh, kw = spec.kernel
            entries.append(
                ("conv", rng.randn(spec.out_ch, spec.in_ch // spec.groups, kh, kw).astype(np.float32), None)
            )
            entries.append(
                (
                    "bn",
                    np.ones(spec.out_ch, np.float32),
                    np.zeros(spec.out_ch, np.float32),
                    np.zeros(spec.out_ch, np.float32),
                    np.ones(spec.out_ch, np.float32),
                )
            )
        else:
            entries.append(
                ("fc", rng.randn(spec.out_features, spec.in_features).astype(np.float32),
                 np.zeros(spec.out_features, np.float32))
            )
    params, state = load_ordered_conv_bn_fc(model, entries)
    lname = model.conv_order[0]
    assert np.asarray(params[lname]["w"]).shape == model.graph[lname].weight_shape()

    # shape mismatch must assert loudly
    bad = list(entries)
    bad[0] = ("conv", rng.randn(10, 3, 7, 7).astype(np.float32), None)
    with pytest.raises(AssertionError):
        load_ordered_conv_bn_fc(model, bad)


def test_nvidia_key_parser():
    rng = np.random.RandomState(2)
    sd = {}
    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.int64(10)
    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    bn("bn1", 64)
    sd["layer1.0.conv1.weight"] = rng.randn(64, 64, 1, 1).astype(np.float32)
    bn("layer1.0.bn1", 64)
    sd["layer1.0.downsample.0.weight"] = rng.randn(256, 64, 1, 1).astype(np.float32)
    bn("layer1.0.downsample.1", 256)
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    entries = parse_nvidia_state_dict(sd)
    kinds = [e[0] for e in entries]
    assert kinds == ["conv", "bn", "conv", "bn", "conv", "bn", "fc"]


def test_torch_pt_file_roundtrip_reference_dialect(tmp_path):
    """Turnkey real-artifact path: a torch.save'd reference checkpoint
    ({'model': state_dict} wrapper, torch tensors, DataParallel 'module.'
    prefixes) loads through load_torch_file -> load_reference_checkpoint."""
    torch = pytest.importorskip("torch")
    model = get_model("resnet18", CFG, num_classes=10, image_size=32)
    rng = np.random.RandomState(4)
    sd = _fake_reference_ckpt(model, rng)
    tsd = {f"module.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    path = str(tmp_path / "best_model.pt")
    torch.save({"model": tsd, "optimizer": {}, "last_epoch": 149}, path)

    params, state = load_reference_checkpoint(model, path)
    lname = model.conv_order[0]
    want = np.transpose(sd[f"{lname}.0.conv.weight" if lname == "head" else f"{lname}.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(params[lname]["w"]), want)
    logits, _ = model.apply(params, state, jnp.zeros((1, 32, 32, 3)), mode="eval")
    assert logits.shape == (1, 10)


def test_torch_pt_file_roundtrip_ptcv_dialect(tmp_path):
    """ptcv-style plain CNN .pt file -> parse_plain_cnn_state_dict ->
    ordered import (the ptcv_load path, fix_train.py:93-133)."""
    torch = pytest.importorskip("torch")
    from f8net_tpu.importers import parse_plain_cnn_state_dict

    model = get_model("resnet18", CFG, num_classes=10, image_size=32)
    rng = np.random.RandomState(5)
    sd = {}
    i = 0
    for lname in model.conv_order:
        spec = model.graph[lname]
        if isinstance(spec, ConvBNSpec):
            kh, kw = spec.kernel
            sd[f"features.{i}.conv.weight"] = rng.randn(
                spec.out_ch, spec.in_ch // spec.groups, kh, kw
            ).astype(np.float32)
            sd[f"features.{i}.bn.weight"] = np.ones(spec.out_ch, np.float32)
            sd[f"features.{i}.bn.bias"] = np.zeros(spec.out_ch, np.float32)
            sd[f"features.{i}.bn.running_mean"] = np.zeros(spec.out_ch, np.float32)
            sd[f"features.{i}.bn.running_var"] = np.ones(spec.out_ch, np.float32)
            sd[f"features.{i}.bn.num_batches_tracked"] = np.int64(7)
        else:
            sd["output.weight"] = rng.randn(
                spec.out_features, spec.in_features
            ).astype(np.float32)
            sd["output.bias"] = np.zeros(spec.out_features, np.float32)
        i += 1
    path = str(tmp_path / "ptcv.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)

    from f8net_tpu.importers.torch_ckpt import load_torch_file

    loaded = load_torch_file(path)
    entries = parse_plain_cnn_state_dict(loaded)
    params, state = load_ordered_conv_bn_fc(model, entries)
    logits, _ = model.apply(params, state, jnp.zeros((1, 32, 32, 3)), mode="eval")
    assert logits.shape == (1, 10)


def test_parity_harness_end_to_end_pt_file_with_golden_fraclens(tmp_path):
    """The first-real-artifact run, rehearsed: a torch.save'd MobileNetV2
    reference checkpoint whose input_fraclen buffers carry the bundled
    golden profile (fraclen_visual/mbv2_fix_quant.out) goes through
    `evaluate_parity` -- checkpoint import, all four eval modes, AND the
    golden-fraclen diff, whose input_fl column must match exactly
    (VERDICT r2 items 7+9)."""
    import os

    torch = pytest.importorskip("torch")
    from f8net_tpu.parity import (
        GOLDEN_PROFILES, REF_FRACLEN_DIR, _ref_layer_to_ours, evaluate_parity,
    )
    from f8net_tpu.utils.reporting import parse_fraclen_report

    profile = os.path.join(
        REF_FRACLEN_DIR, GOLDEN_PROFILES[("mobilenet_v2", "conventional")]
    )
    if not os.path.isfile(profile):
        pytest.skip("reference logs not mounted")
    with open(profile, errors="replace") as f:
        golden = parse_fraclen_report(f.read())

    model = get_model("mobilenet_v2", CFG, num_classes=16, image_size=32)
    rng = np.random.RandomState(6)
    sd = _fake_reference_ckpt(model, rng)
    for ref_name, d in golden.items():
        ours = _ref_layer_to_ours(ref_name)
        key = f"{ours}.0.input_fraclen" if ours in ("head", "tail", "classifier") else f"{ours}.input_fraclen"
        if key in sd and d.get("input_fraclen"):
            sd[key] = np.float32(d["input_fraclen"][0])
    path = str(tmp_path / "mbv2_best_model.pt")
    torch.save(
        {"model": {f"module.{k}": torch.from_numpy(np.atleast_1d(np.asarray(v))) for k, v in sd.items()}},
        path,
    )

    results, total, fraclen_check = evaluate_parity(
        "mobilenet_v2",
        "conventional",
        pretrained_file=path,
        synthetic=True,
        batch_size=4,
        limit_batches=1,
        image_size=32,
        num_classes=16,
    )
    assert total == 4
    assert results["integize"]["top1"] == results["int_op_only"]["top1"]
    assert fraclen_check is not None
    rows, n_bad, name = fraclen_check
    assert name == "mbv2_fix_quant.out"
    assert len(rows) == len(golden)
    # the imported EMA buffers must bake back into the golden input fraclens
    # for every layer (weight fraclens depend on the random fixture weights)
    bad_inputs = [
        r[0] for r in rows
        if r[1] is not None and r[3] is not None and r[1] != r[3]
    ]
    assert bad_inputs == [], bad_inputs


def test_data_pipeline_synthetic():
    from f8net_tpu.data import Loader, SyntheticDataset

    ds = SyntheticDataset(n=20, size=32, classes=5)
    ld = Loader(ds, batch_size=8, train=True, image_size=32, num_workers=2, seed=3)
    batches = list(ld)
    assert len(batches) == len(ld) == 3
    imgs, labels = batches[0]
    assert imgs.shape == (8, 32, 32, 3) and imgs.dtype == np.float32
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert labels.dtype == np.int32

    # epoch changes the shuffle; sharding partitions the data
    ld.set_epoch(1)
    b2 = list(ld)
    assert not np.array_equal(b2[0][1], batches[0][1])
    l0 = Loader(ds, batch_size=4, train=False, image_size=32, shard=0, num_shards=2)
    l1 = Loader(ds, batch_size=4, train=False, image_size=32, shard=1, num_shards=2)
    n0 = sum(b[1].shape[0] for b in l0)
    n1 = sum(b[1].shape[0] for b in l1)
    assert n0 + n1 == 20


def test_eval_transform_geometry():
    from PIL import Image

    from f8net_tpu.data import eval_transform

    img = Image.fromarray(np.zeros((300, 500, 3), np.uint8))
    a = eval_transform(img, size=224, resize=256)
    assert a.shape == (224, 224, 3)
    img2 = Image.fromarray(np.zeros((100, 80, 3), np.uint8))
    a2 = eval_transform(img2, size=64, resize=96)
    assert a2.shape == (64, 64, 3)


def test_native_jpeg_decode_loader_parity(tmp_path, monkeypatch):
    """The native JPEG decode path (csrc libjpeg, GIL-free threads) must
    produce the same loader batches as the PIL decode path -- exactly for
    eval/train full decode (both are libjpeg-turbo), and same shapes +
    RNG stream for the approximate fast_decode path."""
    import pytest
    from PIL import Image

    from f8net_tpu.data.pipeline import ImageFolderDataset, Loader
    from f8net_tpu.native import imageops_available, jpeg_available

    if not (imageops_available() and jpeg_available()):
        pytest.skip("native imageops/jpeg not built")

    rng = np.random.RandomState(0)
    for c in range(2):
        (tmp_path / f"c{c}").mkdir()
    for i in range(12):
        w, h = (90, 70) if i % 2 else (70, 90)
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(
            tmp_path / f"c{i % 2}" / f"im{i:02d}.jpg", quality=80
        )
    ds = ImageFolderDataset(str(tmp_path))

    for train in (True, False):
        def run():
            ld = Loader(
                ds, batch_size=4, train=train, image_size=32,
                num_workers=1, seed=3,
            )
            return list(ld)

        monkeypatch.setenv("F8NET_PY_DECODE", "1")
        ref = run()
        monkeypatch.delenv("F8NET_PY_DECODE")
        out = run()
        assert len(out) == len(ref)
        for (ia, la), (ib, lb) in zip(ref, out):
            np.testing.assert_array_equal(la, lb)
            np.testing.assert_array_equal(ia, ib)

    # the raw decoder agrees with PIL bit-for-bit (both libjpeg-turbo)
    from f8net_tpu.native import c_decode_jpeg_batch

    blob, _ = ds.load_bytes(0)
    out = c_decode_jpeg_batch([blob])[0]
    # samples[0] is the first sorted file of the first class: c0/im00.jpg
    ref = np.asarray(Image.open(tmp_path / "c0" / "im00.jpg").convert("RGB"))
    np.testing.assert_array_equal(out, ref)
    # garbage input degrades to None (loader falls back to PIL)
    assert c_decode_jpeg_batch([b"junk"]) == [None]
