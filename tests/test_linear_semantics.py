"""Independent numpy oracle for the quantized Linear layer (train + eval).

Pins the reference's order-of-operations quirks (fix_quant_ops.py:759-932):
quantize the raw weight first, THEN standardize; during training the clip
scale multiplies the quantized input while at eval it divides the bias."""

import numpy as np
import jax
import jax.numpy as jnp

from f8net_tpu.nn.quant_layers import linear_apply, init_linear_state
from f8net_tpu.nn.spec import LayerGraph, LinearSpec
from f8net_tpu.utils import QuantConfig

CFG = QuantConfig(format_from_metric=True, metric="std", momentum_for_metric=0.1)


def _np_quant(x, fl, wl=8, signed=True):
    s = 2.0**fl
    r = np.round(x * s)
    bound = 2 ** (wl - 1) - 1 if signed else 2**wl - 1
    return np.clip(r, -bound if signed else 0, bound) / s


def _np_fl(metric, signed, hi):
    coeff = 40.0 if signed else 70.0
    return float(np.clip(np.floor(np.log2(coeff / metric)), 0, hi))


def _setup():
    spec = LinearSpec("fc", 32, 10, bias=True)
    graph = LayerGraph({"fc": spec})
    rng = np.random.RandomState(0)
    params = {
        "fc": {
            "w": jnp.asarray(rng.randn(32, 10).astype(np.float32) * 0.05),
            "bias": jnp.asarray(rng.randn(10).astype(np.float32) * 0.1),
            "alpha": jnp.asarray(6.0),
        }
    }
    state = {"fc": init_linear_state(CFG, spec)}
    state["fc"]["input_fl_ema"] = jnp.full((1,), 4.4)
    x = rng.rand(4, 32).astype(np.float32) * 2.0
    return graph, params, state, x


def test_linear_train_matches_oracle():
    graph, params, state, x = _setup()
    got, updates = linear_apply(graph, CFG, "fc", params, state, jnp.asarray(x), "train")

    in_fl = _np_fl(np.std(x, ddof=1), signed=False, hi=8)
    x_q = _np_quant(x, in_fl, signed=False)
    ema = 0.1 * in_fl + 0.9 * 4.4
    fs = 2.0 ** np.clip(np.round(ema), 0, 8) * 6.0 / 255.0

    w = np.asarray(params["fc"]["w"])
    w_fl = _np_fl(np.std(w, ddof=1), signed=True, hi=7)
    w_q = _np_quant(w, w_fl, signed=True)
    ws = (1.0 / np.sqrt(10)) / np.std(w_q, ddof=1)

    want = (x_q * fs) @ (w_q * ws) + np.asarray(params["fc"]["bias"])
    np.testing.assert_allclose(np.asarray(got.x), want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(updates["fc"]["input_fl_ema"][0]), ema, rtol=1e-6)


def test_linear_eval_folds_scale_into_bias():
    graph, params, state, x = _setup()
    got, updates = linear_apply(graph, CFG, "fc", params, state, jnp.asarray(x), "eval")
    assert updates == {}

    in_fl = np.clip(np.round(4.4), 0, 8)
    x_q = _np_quant(x, in_fl, signed=False)
    fs = 2.0**in_fl * 6.0 / 255.0
    w = np.asarray(params["fc"]["w"])
    w_fl = _np_fl(np.std(w, ddof=1), signed=True, hi=7)
    w_q = _np_quant(w, w_fl, signed=True)
    ws = (1.0 / np.sqrt(10)) / np.std(w_q, ddof=1)
    # eval: weight unscaled, bias divided by fs and ws (argmax-invariant scale)
    want = x_q @ w_q + np.asarray(params["fc"]["bias"]) / fs / ws
    np.testing.assert_allclose(np.asarray(got.x), want, rtol=2e-5, atol=2e-5)


def test_linear_quant_bias_grid():
    graph, params, state, x = _setup()
    cfg = CFG.replace(quant_bias=True)
    got, _ = linear_apply(graph, cfg, "fc", params, state, jnp.asarray(x), "eval")
    # with quant_bias the folded bias lands on the 2^-(in_fl+w_fl) grid:
    # recompute and check the effective bias is on-grid
    in_fl = np.clip(np.round(4.4), 0, 8)
    w = np.asarray(params["fc"]["w"])
    w_fl = _np_fl(np.std(w, ddof=1), signed=True, hi=7)
    x_q = _np_quant(x, in_fl, signed=False)
    w_q = _np_quant(w, w_fl, signed=True)
    resid = np.asarray(got.x) - x_q @ w_q  # rows identical = the bias vector
    bias_eff = resid[0]
    np.testing.assert_allclose(resid, np.tile(bias_eff, (4, 1)), atol=1e-5)
    scale = 2.0 ** (in_fl + w_fl)
    np.testing.assert_allclose(
        bias_eff * scale, np.round(bias_eff * scale), atol=1e-2
    )
