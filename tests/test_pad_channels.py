"""Bake-time channel padding (quant/pad_channels.py) is bit-exact.

Zero-weight lane padding must leave the integer engine's logits IDENTICAL
(not just argmax-equal) for every model family, in both packing regimes
(unsigned single-side and signed double-side inputs), under the float-sim
engine, and through the pad policy edge cases."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.quant.pad_channels import _pad_to, pad_channels
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def _baked(name, cfg=CFG, hw=32, n=8, seed=0):
    model = get_model(name, cfg, num_classes=16, image_size=hw)
    params, state = model.init(jax.random.PRNGKey(seed))
    x = jnp.round(
        255 * jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, hw, hw, 3))
    ) / 256
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    return model, plan, ip, x


def test_pad_policy():
    assert _pad_to(3, 128, 128) == 3  # image channels never pad
    assert _pad_to(16, 128, 128) == 128
    assert _pad_to(96, 128, 128) == 128
    assert _pad_to(128, 128, 128) == 128
    assert _pad_to(256, 128, 128) == 256
    assert _pad_to(24, 64, 64) == 64
    assert _pad_to(96, 64, 64) == 96  # above threshold: untouched


@pytest.mark.parametrize("name", ["resnet18", "mobilenet_v1", "mobilenet_v2"])
@pytest.mark.parametrize("to", [64, 128])
def test_padded_engine_bitexact(name, to):
    model, plan, ip, x = _baked(name)
    eng = IntEngine(model, plan, ip, int_only=True)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    peng = IntEngine(model, plan, ip, int_only=True, pad_channels_to=to)
    out = np.asarray(peng(xi))
    np.testing.assert_array_equal(out, ref)


def test_padded_engine_bitexact_normalized():
    """Signed (double-side) head input: padded zeros ride the symmetric
    pack (no -128 offset)."""
    cfg = CFG.replace(normalize=True)
    model, plan, ip, x = _baked("resnet18", cfg=cfg)
    eng = IntEngine(model, plan, ip, int_only=True, cfg=cfg)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))
    peng = IntEngine(
        model, plan, ip, int_only=True, cfg=cfg, pad_channels_to=128
    )
    np.testing.assert_array_equal(np.asarray(peng(xi)), ref)


def test_padded_graph_shapes_consistent():
    """Spec channel counts and padded weight shapes agree layer by layer;
    producers' padded out_ch equals consumers' padded in_ch."""
    model, plan, ip, _ = _baked("mobilenet_v2")
    pm, pp = pad_channels(model, ip, multiple=128, threshold=128)
    for lname in pm.graph.names():
        spec = pm.graph[lname]
        w = np.asarray(pp[lname]["w"])
        assert tuple(w.shape) == tuple(spec.weight_shape()), lname
        if hasattr(spec, "out_ch") and "b" in pp[lname]:
            assert pp[lname]["b"].shape == (spec.out_ch,), lname
    # depthwise group counts track their channel counts
    dw = pm.graph["stage_0_layer_0.body.0"]
    assert dw.groups == dw.in_ch == dw.out_ch == 128
    # zero padding only: real values untouched
    orig = np.asarray(ip["stage_0_layer_0.body.1"]["w"])
    padded = np.asarray(pp["stage_0_layer_0.body.1"]["w"])
    np.testing.assert_array_equal(padded[:, :, : orig.shape[2], : orig.shape[3]], orig)
    assert (padded[:, :, orig.shape[2] :, :] == 0).all()
    assert (padded[:, :, :, orig.shape[3] :] == 0).all()
