"""Independent numpy model of one quantized ConvBN training step.

Re-derives the reference's layer math (metric mode, per-layer format) from
the SURVEY call stack (§3.3) with plain numpy and checks our functional
implementation against it -- an oracle that is structurally unlike the
implementation under test.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from f8net_tpu.nn.quant_layers import conv_bn_apply, init_conv_params, init_conv_state
from f8net_tpu.nn.spec import ConvBNSpec, LayerGraph, LinearSpec
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(format_from_metric=True, metric="std", momentum_for_metric=0.1)


def _np_quant(x, fl, wl=8, signed=True):
    s = 2.0**fl
    r = np.round(x * s)
    bound = 2 ** (wl - 1) - 1 if signed else 2**wl - 1
    lo = -bound if signed else 0
    return np.clip(r, lo, bound) / s


def _np_fl(metric, signed, hi):
    coeff = 40.0 if signed else 70.0
    return float(np.clip(np.floor(np.log2(coeff / metric)), 0, hi))


def _np_conv(x, w):
    return np.asarray(
        lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )


def test_training_forward_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    c_in, c_mid, c_out = 8, 12, 6
    spec1 = ConvBNSpec("l1", c_in, c_mid, (3, 3), padding=(1, 1), following="l2")
    spec2 = ConvBNSpec("l2", c_mid, c_out, (3, 3), padding=(1, 1), following="fc")
    fc = LinearSpec("fc", c_out, 4)
    graph = LayerGraph({"l1": spec1, "l2": spec2, "fc": fc})

    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    params = {
        "l1": init_conv_params(keys[0], spec1),
        "l2": init_conv_params(keys[1], spec2),
        "fc": {"w": jax.random.normal(keys[2], (c_out, 4)) * 0.01,
               "alpha": jnp.asarray(5.0)},
    }
    # distinct alphas/EMAs so the coupling is visible
    params["l1"]["alpha"] = jnp.asarray(7.0)
    params["l2"]["alpha"] = jnp.asarray(3.0)
    state = {
        "l1": init_conv_state(CFG, spec1),
        "l2": init_conv_state(CFG, spec2),
        "fc": {"input_fl_ema": jnp.full((1,), 4.0)},
    }
    state["l2"]["input_fl_ema"] = jnp.full((1,), 5.3)

    x = rng.randn(2, 6, 6, c_in).astype(np.float32)

    got, updates = conv_bn_apply(graph, CFG, "l1", params, state, jnp.asarray(x), "train")

    # ---- numpy oracle ----
    # input quantization (unsigned: layer not double_side)
    in_metric = np.std(x, ddof=1)
    in_fl = _np_fl(in_metric, signed=False, hi=8)
    x_q = _np_quant(x, in_fl, signed=False)
    # EMA update then fix_scaling from the *updated* buffer
    ema1 = 0.1 * in_fl + 0.9 * float(np.asarray(state["l1"]["input_fl_ema"][0]))
    fs1 = 2.0 ** np.clip(np.round(ema1), 0, 8) * abs(7.0) / 255.0
    # following layer scale from its (un-updated) EMA; l2 unsigned too
    ema2 = float(np.asarray(state["l2"]["input_fl_ema"][0]))
    fs2 = 2.0 ** np.clip(np.round(ema2), 0, 8) * abs(3.0) / 255.0

    w = np.asarray(params["l1"]["w"])
    y0 = _np_conv(fs1 * x_q, w)
    mu = y0.mean((0, 1, 2))
    var = y0.var((0, 1, 2))
    sd = np.sqrt(var + CFG.bn_eps)
    gamma = np.asarray(params["l1"]["gamma"])
    beta = np.asarray(params["l1"]["beta"])
    w_eff = w * (gamma / sd) * fs1 / fs2
    w_fl = _np_fl(np.std(w_eff, ddof=1), signed=True, hi=7)
    w_q = _np_quant(w_eff, w_fl, signed=True)
    bias = (beta - gamma / sd * mu) / fs2
    want = _np_conv(x_q, w_q) + bias

    np.testing.assert_allclose(np.asarray(got.x), want, rtol=2e-5, atol=2e-5)
    # EMA update visible in the returned state delta
    np.testing.assert_allclose(float(updates["l1"]["input_fl_ema"][0]), ema1, rtol=1e-6)
    # BN running stats updated with unbiased batch variance, momentum 0.1
    n = y0.size / c_mid
    run_var = 0.9 * 1.0 + 0.1 * var * n / (n - 1)
    np.testing.assert_allclose(np.asarray(updates["l1"]["bn_var"]), run_var, rtol=1e-4)


def test_eval_uses_running_stats_and_rounded_ema():
    spec1 = ConvBNSpec("l1", 4, 5, (1, 1), following="fc")
    fc = LinearSpec("fc", 5, 3)
    graph = LayerGraph({"l1": spec1, "fc": fc})
    k = jax.random.PRNGKey(0)
    params = {
        "l1": init_conv_params(k, spec1),
        "fc": {"w": jnp.zeros((5, 3)), "alpha": jnp.asarray(8.0)},
    }
    state = {
        "l1": init_conv_state(CFG, spec1),
        "fc": {"input_fl_ema": jnp.full((1,), 6.0)},
    }
    state["l1"]["bn_mean"] = jnp.full((5,), 0.3)
    state["l1"]["bn_var"] = jnp.full((5,), 2.0)
    state["l1"]["input_fl_ema"] = jnp.full((1,), 4.6)  # rounds to 5

    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 3, 4))
    got, updates = conv_bn_apply(graph, CFG, "l1", params, state, x, "eval")
    assert updates == {}  # eval mutates nothing

    # input quantized at fl=round(4.6)=5: all values land on the 1/32 grid
    xq = np.asarray(x) * 32
    got2, _ = conv_bn_apply(graph, CFG, "l1", params, state, jnp.round(jnp.asarray(xq)) / 32, "eval")
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(got2.x), atol=1e-6)
