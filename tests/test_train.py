"""Training stack: optimizer semantics, LR schedules, loop, checkpointing."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.models import get_model
from f8net_tpu.train import (
    Trainer,
    load_checkpoint,
    lr_schedule,
    save_checkpoint,
    sgd_init,
    sgd_update,
    weight_decay_mask,
)
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig

CFG = QuantConfig(format_from_metric=True, metric="std")


def test_sgd_matches_torch_semantics():
    # single scalar parameter, compare against hand-stepped torch-SGD rule
    p = {"l": {"w": jnp.asarray(1.0)}}
    g = {"l": {"w": jnp.asarray(0.5)}}
    mask = {"l": {"w": 0.1}}
    st = sgd_init(p)
    lr, mu = 0.1, 0.9
    p1, st1 = sgd_update(p, g, st, lr, mask, momentum=mu, nesterov=True)
    # g' = 0.5 + 0.1*1 = 0.6; buf = 0.6; d = 0.6 + 0.9*0.6 = 1.14
    np.testing.assert_allclose(float(p1["l"]["w"]), 1.0 - 0.1 * 1.14, rtol=1e-6)
    p2, _ = sgd_update(p1, g, st1, lr, mask, momentum=mu, nesterov=False)
    # g' = 0.5 + 0.1*p1; buf = 0.9*0.6 + g'; d = buf
    gp = 0.5 + 0.1 * float(p1["l"]["w"])
    buf = 0.9 * 0.6 + gp
    np.testing.assert_allclose(float(p2["l"]["w"]), float(p1["l"]["w"]) - 0.1 * buf, rtol=1e-6)


def test_weight_decay_schemes():
    model = get_model("mobilenet_v1", CFG, num_classes=10)
    params, _ = model.init(jax.random.PRNGKey(0))
    dw_name = "stage_0_layer_0.body.0"  # depthwise conv
    pw_name = "stage_0_layer_0.body.1"
    m_all = weight_decay_mask(model.graph, params, "all", 1e-4)
    assert m_all[dw_name]["w"] == 1e-4 and m_all[dw_name]["alpha"] == 1e-4
    m_nd = weight_decay_mask(model.graph, params, "only_no_depthwise", 1e-4)
    assert m_nd[dw_name]["w"] == 0.0 and m_nd[pw_name]["w"] == 1e-4
    assert m_nd[dw_name]["gamma"] == 1e-4  # 1-D params keep decay
    m_nb = weight_decay_mask(model.graph, params, "only_no_bn", 1e-4)
    assert m_nb[dw_name]["w"] == 1e-4 and m_nb[dw_name]["gamma"] == 0.0
    m_ndb = weight_decay_mask(model.graph, params, "no_depthwise_no_bn", 1e-4)
    assert m_ndb[dw_name]["w"] == 0.0 and m_ndb[pw_name]["w"] == 1e-4
    assert m_ndb[pw_name]["gamma"] == 0.0 and m_ndb["classifier"]["w"] == 1e-4


def test_lr_schedules():
    t = TrainConfig(num_epochs=10, warmup_epochs=2, batch_size=1024, lr_scheduler="cos_annealing_iter")
    f = lr_schedule(t, steps_per_epoch=100)
    # warmup starts at 256/bs and reaches ~1 at warmup end
    np.testing.assert_allclose(f(0), 0.25)
    assert f(199) < 1.0 <= f(200) + 1e-6
    # cosine end reaches ~0
    assert f(999) < 0.01
    t2 = t.replace(lr_scheduler="multistep", multistep_lr_milestones=(3, 6), multistep_lr_gamma=0.1)
    f2 = lr_schedule(t2, 100)
    assert f2(0) == 1.0 and abs(f2(300) - 0.1) < 1e-12 and abs(f2(600) - 0.01) < 1e-12
    t3 = t.replace(lr_scheduler="constant")
    assert lr_schedule(t3, 100)(500) == 1.0
    t4 = t.replace(lr_scheduler="exp_decaying_iter")
    f4 = lr_schedule(t4, 100)
    np.testing.assert_allclose(f4(999), math.exp(-8 * (999 - 200) / 800), rtol=1e-6)


def _loader(rng, n_batches, bs=4, hw=24, classes=10):
    out = []
    for i in range(n_batches):
        k1, k2, rng = jax.random.split(rng, 3)
        out.append(
            (
                jax.random.uniform(k1, (bs, hw, hw, 3)),
                jax.random.randint(k2, (bs,), 0, classes),
            )
        )
    return out


def test_trainer_overfits_tiny_batch():
    tcfg = TrainConfig(
        num_epochs=3, batch_size=4, lr=0.02, lr_scheduler="constant",
        weight_decay=0.0, topk=(1,), num_classes=10,
    )
    model = get_model("resnet18", CFG, num_classes=10)
    tr = Trainer(model, CFG, tcfg, log=lambda *a: None)
    params, state, opt = tr.init(jax.random.PRNGKey(0))
    batches = _loader(jax.random.PRNGKey(1), 2)
    losses = []
    for epoch in range(3):
        params, state, opt, res = tr.run_epoch(
            params, state, opt, batches, epoch, len(batches), "train"
        )
        losses.append(res["loss"])
    assert losses[-1] < losses[0], losses
    # eval runs
    _, _, _, res = tr.run_epoch(params, state, opt, batches, 0, len(batches), "val")
    assert "top1_error" in res


def test_print_each_iter_logs_topk_lines():
    """print_each_iter emits a per-iteration top-k error line per batch
    (fix_train.py:714-715)."""
    tcfg = TrainConfig(
        num_epochs=1, batch_size=4, lr=0.0, lr_scheduler="constant",
        topk=(1,), num_classes=10, print_each_iter=True,
    )
    model = get_model("resnet18", CFG, num_classes=10)
    lines = []
    tr = Trainer(model, CFG, tcfg, log=lines.append)
    params, state, opt = tr.init(jax.random.PRNGKey(0))
    batches = _loader(jax.random.PRNGKey(1), 3)
    tr.run_epoch(params, state, opt, batches, 0, 3, "val")
    iter_lines = [l for l in lines if l.startswith("top1 err: ")]
    assert len(iter_lines) == 3, lines
    # the printed value is an error rate in [0, 1]
    assert all(0.0 <= float(l.split(": ")[1].rstrip(".")) <= 1.0 for l in iter_lines)


def test_finetune_iters_cap():
    tcfg = TrainConfig(num_epochs=1, batch_size=4, lr=0.0, lr_scheduler="constant",
                       finetune_iters=1, topk=(1,))
    model = get_model("mobilenet_v2", CFG, num_classes=10)
    tr = Trainer(model, CFG, tcfg, log=lambda *a: None)
    params, state, opt = tr.init(jax.random.PRNGKey(0))
    batches = _loader(jax.random.PRNGKey(1), 5)
    alpha0 = float(params["head"]["alpha"])  # train_step donates its inputs
    params, state, opt, _ = tr.run_epoch(params, state, opt, batches, 0, 5, "train")
    # lr 0 -> params unchanged (statistics-calibration-only finetuning)
    np.testing.assert_allclose(float(params["head"]["alpha"]), alpha0)


def test_checkpoint_roundtrip(tmp_path):
    model = get_model("resnet18", CFG, num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = sgd_init(params)
    path = os.path.join(tmp_path, "latest_checkpoint")
    save_checkpoint(
        path,
        {"params": params, "state": state, "opt_momentum": opt.momentum},
        meta={"last_epoch": 7, "best_val": 0.31},
    )
    trees, meta = load_checkpoint(path)
    assert meta["last_epoch"] == 7 and meta["best_val"] == 0.31
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        trees["params"],
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state,
        trees["state"],
    )


def test_async_checkpointer(tmp_path):
    import numpy as np

    from f8net_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint

    ck = AsyncCheckpointer()
    path = str(tmp_path / "latest")
    # queue several saves of the same path: last one must win
    for epoch in range(4):
        trees = {"params": {"w": np.full((8, 8), epoch, np.float32)}}
        ck.save(path, trees, meta={"last_epoch": epoch})
    ck.wait()
    trees, meta = load_checkpoint(path)
    assert meta == {"last_epoch": 3}
    np.testing.assert_array_equal(trees["params"]["w"], np.full((8, 8), 3, np.float32))

    # distinct paths all get written
    for name in ("a", "b"):
        ck.save(str(tmp_path / name), {"x": np.arange(3)}, meta={"n": name})
    ck.close()
    for name in ("a", "b"):
        _, meta = load_checkpoint(str(tmp_path / name))
        assert meta == {"n": name}


def test_async_checkpointer_surfaces_errors(tmp_path, monkeypatch):
    import numpy as np
    import pytest

    import f8net_tpu.train.checkpoint as C

    ck = C.AsyncCheckpointer()

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(C.np, "savez", boom)
    ck.save(str(tmp_path / "x"), {"x": np.arange(2)})
    with pytest.raises(OSError, match="disk full"):
        ck.wait()
    # checkpointer stays usable after the error is surfaced
    monkeypatch.undo()
    ck.save(str(tmp_path / "y"), {"x": np.arange(2)})
    ck.close()
    trees, _ = C.load_checkpoint(str(tmp_path / "y"))
    np.testing.assert_array_equal(trees["x"], np.arange(2))



def test_train_conv_bf16_op_semantics():
    """The bf16-operand training conv (nn/quant_layers.py:_conv2d_bf16):
    (a) on quantization-grid operands it equals the f32 conv up to f32
        reduction order (operands are exact in bf16);
    (b) its VJP is the f32 conv's VJP (backward precision untouched);
    (c) on arbitrary operands (the stat conv) the error is bf16 operand
        rounding, ~2^-9 relative."""
    from f8net_tpu.nn.quant_layers import _conv2d, _conv2d_bf16
    from f8net_tpu.nn.spec import ConvBNSpec

    spec = ConvBNSpec(
        name="t", in_ch=32, out_ch=48, kernel=(3, 3), stride=(1, 1), padding=(1, 1)
    )
    rng = np.random.RandomState(3)
    # grid operands: x = k * 2^-8 (k in [0, 255]), w = k * 2^-7 (|k| <= 127)
    x = jnp.asarray(rng.randint(0, 256, (2, 16, 16, 32)) / 256.0, jnp.float32)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 32, 48)) / 128.0, jnp.float32)

    y_b = _conv2d_bf16(x, w, spec)
    y_f = _conv2d(x, w, spec)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_f), rtol=2e-6, atol=2e-5)

    g = jnp.asarray(rng.randn(*y_f.shape), jnp.float32)
    _, vjp_b = jax.vjp(lambda a, b: _conv2d_bf16(a, b, spec), x, w)
    _, vjp_f = jax.vjp(lambda a, b: _conv2d(a, b, spec), x, w)
    for db, df in zip(vjp_b(g), vjp_f(g)):
        np.testing.assert_allclose(np.asarray(db), np.asarray(df), rtol=1e-6, atol=1e-6)

    # arbitrary (stat-conv) operands: bounded by bf16 operand rounding
    xs = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    ws = jnp.asarray(rng.randn(3, 3, 32, 48) * 0.1, jnp.float32)
    es = np.abs(np.asarray(_conv2d_bf16(xs, ws, spec) - _conv2d(xs, ws, spec)))
    scale = np.abs(np.asarray(_conv2d(xs, ws, spec))).max()
    assert es.max() / scale < 2e-2, es.max() / scale


def test_train_conv_bf16_model_contract():
    """Model-level: the flag must not change formats discretely beyond
    threshold flips (EMA fraclens stay close after one step; the first
    layer, with no upstream quantization flips, tracks tightly) and the
    baked integer engines stay bit-exact after training with the flag."""
    from f8net_tpu.engine import IntEngine
    from f8net_tpu.quant import bake_plan

    base = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    results = {}
    for flag in (False, True):
        cfg = base.replace(train_conv_bf16=flag)
        model = get_model("resnet18", cfg, num_classes=10, image_size=32)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.round(
            255 * jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
        ) / 256
        _, state = model.apply(params, state, x, mode="train")
        results[flag] = (model, params, state, x)

    _, _, s32, _ = results[False]
    _, _, sb16, _ = results[True]
    # head: identical inputs/weights both runs -- only bf16 stat rounding
    np.testing.assert_allclose(
        np.asarray(sb16["head"]["bn_mean"]), np.asarray(s32["head"]["bn_mean"]),
        rtol=1e-2, atol=1e-2,
    )
    # EMA fraclens (log2 domain) stay close everywhere
    for name in s32:
        if "input_fl_ema" in s32[name]:
            np.testing.assert_allclose(
                np.asarray(sb16[name]["input_fl_ema"]),
                np.asarray(s32[name]["input_fl_ema"]),
                rtol=5e-2, atol=0.1, err_msg=name,
            )

    # train two more steps with the flag, bake, and hold the engine contract
    model, params, state, x = results[True]
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, int_params = bake_plan(model, params, state)
    ei = IntEngine(model, plan, int_params, int_only=True)
    es = IntEngine(model, plan, int_params, int_only=False)
    xe = jnp.round(
        255 * jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    ) / 256
    np.testing.assert_array_equal(
        np.asarray(ei(ei.condition_input(xe))),
        np.asarray(es(es.condition_input(xe))),
    )
