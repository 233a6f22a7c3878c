"""Model zoo structural + forward smoke tests (tiny inputs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.models import get_model
from f8net_tpu.utils import QuantConfig

QAT_CFG = QuantConfig(format_from_metric=True, metric="std")


def tiny_input(rng, n=2, hw=32):
    # unnormalized-pipeline conditioning: round(255 x)/256 in [0,1)
    x = jax.random.uniform(rng, (n, hw, hw, 3))
    return jnp.round(255.0 * x) / 256.0


@pytest.mark.parametrize("name", ["resnet18", "resnet50", "mobilenet_v1", "mobilenet_v2"])
def test_build_and_forward_modes(name):
    model = get_model(name, QAT_CFG, num_classes=10)
    rng = jax.random.PRNGKey(0)
    params, state = model.init(rng)
    x = tiny_input(jax.random.PRNGKey(1))

    logits_t, new_state = model.apply(params, state, x, mode="train")
    assert logits_t.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logits_t)))
    # training updated the EMA buffers
    changed = any(
        not np.allclose(
            np.asarray(new_state[k]["input_fl_ema"]), np.asarray(state[k]["input_fl_ema"])
        )
        for k in state
    )
    assert changed

    logits_e, state_e = model.apply(params, new_state, x, mode="eval")
    assert logits_e.shape == (2, 10)
    # eval must not mutate state
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        new_state,
        state_e,
    )


def test_resnet18_wiring():
    model = get_model("resnet18", QAT_CFG)
    g = model.graph
    # head follows into stage_0_layer_0.body.0
    assert g.following_of("head") == "stage_0_layer_0.body.0"
    # stage 0 blocks are residual (64->64): chain master is layer_0.body.0
    assert g["stage_0_layer_0.body.0"].master is None
    assert g["stage_0_layer_1.body.0"].master == "stage_0_layer_0.body.0"
    # stage 1 starts with a downsample block (stride 2): master resets
    assert g["stage_1_layer_0.shortcut.0"].master == "stage_0_layer_1.body.0"
    assert g["stage_1_layer_1.body.0"].master is None
    # following chain inside a block and across blocks
    assert g.following_of("stage_0_layer_0.body.0") == "stage_0_layer_0.body.1"
    assert g.following_of("stage_0_layer_0.body.1") == "stage_0_layer_1.body.0"
    # last block + tail into classifier
    assert g.following_of("stage_3_layer_1.body.1") == "classifier"
    # head is weight-only in the unnormalized pipeline with bita_min=8
    assert g["head"].weight_only and g["head"].bita_min == 8
    assert len(model.conv_order) == 1 + (2 * 8 + 3) + 1  # head + body convs + shortcuts + fc


def test_resnet50_bottleneck_structure():
    model = get_model("resnet50", QAT_CFG)
    g = model.graph
    # first block is a downsample bottleneck (64 -> 256 with 1x1 shortcut)
    assert g["stage_0_layer_0.shortcut.0"].kernel == (1, 1)
    assert g["stage_0_layer_0.body.0"].out_ch == 64
    assert g["stage_0_layer_0.body.2"].out_ch == 256
    assert g["stage_0_layer_1.body.0"].master is None
    assert g["stage_0_layer_2.body.0"].master == "stage_0_layer_1.body.0"


def test_mobilenet_v2_double_side_placement():
    model = get_model("mobilenet_v2", QAT_CFG)
    g = model.graph
    # stage 0 first block: not double side; later blocks: first conv signed
    assert not g["stage_0_layer_0.body.0"].double_side
    assert g["stage_1_layer_0.body.0"].double_side
    assert not g["stage_1_layer_0.body.1"].double_side  # depthwise unsigned
    assert not g["stage_1_layer_0.body.2"].double_side  # project unsigned
    assert g["tail"].double_side
    # depthwise conv shape
    assert g["stage_1_layer_0.body.1"].groups == g["stage_1_layer_0.body.1"].in_ch


def test_mobilenet_v1_straight_chain():
    model = get_model("mobilenet_v1", QAT_CFG)
    g = model.graph
    for spec in g:
        assert spec.master is None  # no residuals -> no alpha sharing
    assert g.following_of("stage_0_layer_0.body.0") == "stage_0_layer_0.body.1"
    assert g.following_of("stage_4_layer_1.body.1") == "classifier"


def test_gradients_flow_including_alpha():
    model = get_model("resnet18", QAT_CFG, num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    x = tiny_input(jax.random.PRNGKey(1))
    y = jnp.array([1, 2])

    def loss_fn(p):
        logits, _ = model.apply(p, state, x, mode="train")
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(2), y])

    grads = jax.grad(loss_fn)(params)
    # master alpha of the first residual chain receives gradient
    g_alpha = float(jnp.abs(grads["stage_0_layer_0.body.0"]["alpha"]))
    assert g_alpha > 0
    g_w = float(jnp.abs(grads["stage_0_layer_0.body.0"]["w"]).sum())
    assert g_w > 0
    # BN affine params get gradient
    assert float(jnp.abs(grads["stage_0_layer_0.body.0"]["gamma"]).sum()) > 0


def test_int_infer_eval_close_to_sim_eval():
    cfg = QAT_CFG.replace(quant_bias=True)
    model = get_model("resnet18", cfg, num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    x = tiny_input(jax.random.PRNGKey(1))
    # a few training steps to settle EMA fraclens / BN stats
    for _ in range(3):
        _, state = model.apply(params, state, x, mode="train")
    logits_sim, _ = model.apply(params, state, x, mode="eval")
    logits_int, _ = model.apply(params, state, x, mode="eval", cfg=cfg.replace(int_infer=True))
    # integer simulation reproduces the QAT-sim logits up to numerical error
    np.testing.assert_allclose(
        np.asarray(logits_int), np.asarray(logits_sim), rtol=0.0, atol=5e-2
    )


def test_floating_modes_run():
    for fl_cfg in (
        QuantConfig(floating_model=True),
        QuantConfig(floating_model=True, floating_wo_clip=True),
    ):
        model = get_model("mobilenet_v2", fl_cfg, num_classes=10)
        params, state = model.init(jax.random.PRNGKey(0))
        x = tiny_input(jax.random.PRNGKey(2))
        logits, _ = model.apply(params, state, x, mode="train")
        assert np.all(np.isfinite(np.asarray(logits)))


def test_calib_mode_cumulative_bn():
    model = get_model("resnet18", QAT_CFG, num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    x = tiny_input(jax.random.PRNGKey(3))
    _, s1 = model.apply(params, state, x, mode="calib")
    assert float(s1["head"]["bn_count"]) == 1.0
    _, s2 = model.apply(params, s1, x, mode="calib")
    assert float(s2["head"]["bn_count"]) == 2.0
    # same batch twice -> cumulative mean equals single-batch mean
    np.testing.assert_allclose(
        np.asarray(s2["head"]["bn_mean"]), np.asarray(s1["head"]["bn_mean"]), rtol=1e-5
    )
