"""Multi-device sharding on the 8-device virtual CPU mesh.

The JAX-native analog of a fake distributed backend: data-parallel gradient
sync and tensor-parallel weight sharding are validated by comparing sharded
execution against single-device results.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from f8net_tpu.models import get_model
from f8net_tpu.parallel import batch_sharding, make_mesh, param_shardings
from f8net_tpu.train import make_train_step, sgd_init
from f8net_tpu.utils import QuantConfig
from f8net_tpu.utils.config import TrainConfig

CFG = QuantConfig(format_from_metric=True, metric="std")


def test_mesh_shapes():
    mesh = make_mesh(data=-1, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(data=8, model=1)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_dp_train_step_matches_single_device():
    """Data-parallel sharded step == single-device step (same math, XLA
    inserts the gradient all-reduce).

    Uses the floating (unquantized) model: a QAT forward quantizes through
    batch-statistics-dependent floor(log2)/round thresholds, so reduction-
    order FP noise legitimately amplifies to whole quantization steps across
    device layouts (EMA fraclens stay identical -- asserted separately).
    """
    fcfg = QuantConfig(floating_model=True, floating_wo_clip=True)
    tcfg = TrainConfig(num_epochs=1, batch_size=8, lr=0.05, lr_scheduler="constant", topk=(1,))
    model = get_model("mobilenet_v1", fcfg, num_classes=8)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = sgd_init(params)
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 8)
    w0 = np.asarray(params["head"]["w"]).copy()  # donation-proof snapshot

    step = make_train_step(model, fcfg, tcfg)

    p1, s1, o1, m1 = step(
        jax.tree_util.tree_map(jnp.copy, params),
        jax.tree_util.tree_map(jnp.copy, state),
        jax.tree_util.tree_map(jnp.copy, opt),
        images,
        labels,
        0.05,
    )

    mesh = make_mesh(data=8, model=1)
    repl = NamedSharding(mesh, P())
    pd = jax.device_put(params, repl)
    sd = jax.device_put(state, repl)
    od = jax.device_put(opt, repl)
    bsh = batch_sharding(mesh)
    xd = jax.device_put(images, bsh)
    yd = jax.device_put(labels, bsh)
    step2 = make_train_step(model, fcfg, tcfg)
    p2, s2, o2, m2 = step2(pd, sd, od, xd, yd, 0.05)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    assert float(m1["top1"]) == float(m2["top1"])
    # parameter updates agree in direction (deep BN chains amplify f32
    # reduction-order noise, so elementwise equality is too strict)
    d1 = np.asarray(p1["head"]["w"]).ravel() - w0.ravel()
    d2 = np.asarray(p2["head"]["w"]).ravel() - w0.ravel()
    cos = np.dot(d1, d2) / (np.linalg.norm(d1) * np.linalg.norm(d2) + 1e-12)
    assert cos > 0.999, cos
    np.testing.assert_allclose(np.linalg.norm(d1), np.linalg.norm(d2), rtol=0.02)


def test_dp_quantized_ema_state_is_layout_invariant():
    """The quantized train forward's learned fraclen state must not depend on
    the device layout, even though logits legitimately jitter by quantization
    steps (batch-stat-dependent floor/round thresholds)."""
    model = get_model("mobilenet_v1", CFG, num_classes=8)
    params, state = model.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    _, s1 = model.apply(params, state, images, mode="train")
    mesh = make_mesh(data=8, model=1)
    repl = NamedSharding(mesh, P())
    fwd = jax.jit(lambda p, s, x: model.forward(p, s, x, "train", CFG))
    _, s2 = fwd(
        jax.device_put(params, repl),
        jax.device_put(state, repl),
        jax.device_put(images, batch_sharding(mesh)),
    )
    for k in s1:
        np.testing.assert_allclose(
            np.asarray(s1[k]["input_fl_ema"]),
            np.asarray(s2[k]["input_fl_ema"]),
            atol=1e-6,
            err_msg=k,
        )


def test_tp_sharded_eval_matches_replicated():
    """Out-channel tensor parallelism over the 'model' axis preserves
    numerics of the eval forward."""
    model = get_model("resnet18", CFG, num_classes=16)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))

    ref, _ = model.apply(params, state, x, mode="eval")

    mesh = make_mesh(data=4, model=2)
    psh = param_shardings(model.graph, params, mesh, tensor_parallel=True)
    pd = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, s), params, psh,
        is_leaf=lambda v: not isinstance(v, dict),
    )
    sd = jax.device_put(state, NamedSharding(mesh, P()))
    xd = jax.device_put(x, batch_sharding(mesh))

    fwd = jax.jit(lambda p, s, xx: model.forward(p, s, xx, "eval", CFG)[0])
    out = fwd(pd, sd, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_tp_sharded_int_engine_matches_replicated():
    """The integer engine under out-channel tensor parallelism: int8 weights
    sharded over 'model', batch over 'data', logits bit-equal to
    single-device."""
    import jax.numpy as jnp

    from f8net_tpu.engine import IntEngine
    from f8net_tpu.engine.int_engine import int_forward
    from f8net_tpu.parallel import int_param_shardings
    from f8net_tpu.quant import bake_plan

    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True, quant_avgpool=True
    )
    model = get_model("resnet18", cfg, num_classes=16, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))) / 256
    _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    mesh = make_mesh(data=4, model=2)
    psh = int_param_shardings(model.graph, eng.int_params, mesh, tensor_parallel=True)
    ipd = jax.tree_util.tree_map(
        lambda a, sh: jax.device_put(a, sh), eng.int_params, psh,
        is_leaf=lambda v: not isinstance(v, dict),
    )
    xd = jax.device_put(xi, batch_sharding(mesh))
    fwd = jax.jit(lambda p, v: int_forward(model, plan, p, v, cfg))
    out = np.asarray(fwd(ipd, xd))
    np.testing.assert_array_equal(out, ref)
