"""Export paths: deployment bundle round-trip, TorchScript int model parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.export import (
    build_torch_int_model,
    export_torchscript,
    load_deploy_bundle,
    save_deploy_bundle,
)
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(
    format_from_metric=True, metric="std", quant_bias=True,
    quant_avgpool=True, pool_fusing=True,
)


def _trained(name, hw=32, seed=0):
    model = get_model(name, CFG, num_classes=10, image_size=32)
    params, state = model.init(jax.random.PRNGKey(seed))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(seed + 1), (2, hw, hw, 3))) / 256
    for _ in range(2):
        _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    return model, plan, ip, x


def test_bundle_roundtrip(tmp_path):
    model, plan, ip, x = _trained("mobilenet_v2")
    path = save_deploy_bundle(os.path.join(tmp_path, "mbv2_int8"), model, plan, ip)
    topo, plan2, ip2 = load_deploy_bundle(path)
    assert topo["model"] == "mobilenet_v2"
    for p in plan.layers:
        q = plan2[p.name]
        assert (q.input_fl, q.weight_fl, q.input_symmetric) == (
            p.input_fl, p.weight_fl, p.input_symmetric,
        )
    # engine from the reloaded bundle == engine from the baked params
    e1 = IntEngine(model, plan, ip)
    e2 = IntEngine(model, plan2, ip2)
    xi = e1.condition_input(x)
    np.testing.assert_array_equal(np.asarray(e1(xi)), np.asarray(e2(xi)))


@pytest.mark.parametrize("name", ["resnet18", "mobilenet_v1", "mobilenet_v2"])
def test_torch_int_model_parity(name):
    import torch

    model, plan, ip, x = _trained(name)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    y_jax = np.asarray(eng(xi))

    tm = build_torch_int_model(model, plan, ip)
    xt = torch.from_numpy(np.transpose(np.asarray(xi), (0, 3, 1, 2))).contiguous()
    with torch.no_grad():
        y_t = tm(xt).numpy()
    np.testing.assert_array_equal(y_t, y_jax)


def test_torchscript_trace_and_save(tmp_path):
    import torch

    model, plan, ip, x = _trained("resnet18")
    path = os.path.join(tmp_path, "resnet18_int8.pt")
    export_torchscript(model, plan, ip, path, image_size=32)
    loaded = torch.jit.load(path)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    xt = torch.from_numpy(np.transpose(np.asarray(xi), (0, 3, 1, 2))).contiguous()
    with torch.no_grad():
        y_t = loaded(xt).numpy()
    np.testing.assert_array_equal(y_t, np.asarray(eng(xi)))


def test_native_bundle_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f8net_tpu.export import load_native_bundle, save_native_bundle
    from f8net_tpu.models import get_model
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    cfg = QuantConfig(format_from_metric=True, metric="std", quant_bias=True,
                      quant_avgpool=True, pool_fusing=True)
    model = get_model("mobilenet_v2", cfg, num_classes=10, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))) / 256
    _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)

    path = str(tmp_path / "m.f8nb")
    save_native_bundle(path, model, plan, ip)
    b = load_native_bundle(path)
    assert b["family"] == 2 and b["num_classes"] == 10 and b["quant_avgpool"]
    assert len(b["layers"]) == len(plan.layers)
    for rec, p in zip(b["layers"], plan.layers):
        assert rec["input_fl"] == p.input_fl and rec["weight_fl"] == p.weight_fl
        np.testing.assert_array_equal(rec["w"], np.asarray(ip[p.name]["w"]))
    assert b["layers"][-1]["kind"] == "linear"
