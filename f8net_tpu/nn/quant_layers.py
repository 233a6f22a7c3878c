"""Quantized layer semantics: fused ConvBN and Linear with fixed-point formats.

Functional re-design of the reference's central modules
(ReLUClipFXQConvBN: /root/reference/models/fix_quant_ops.py:160-714,
ReLUClipFXQLinear: :717-1195, FXQAvgPool2d/FXQMaxPool2d: :117-157).
Parameters and mutable buffers (BN running stats, input-fraclen EMA) live in
plain pytrees; cross-layer coupling (PACT clipping scale of the *next* layer
divided into this layer's folded weights, alpha sharing across residual
chains) is resolved through the static LayerGraph.

The quantization scheme in one line: activations/weights are quantized to
8-bit fixed point with per-tensor fractional length fl; the PACT clipping
level alpha is reformulated into the scale
    fix_scaling = 2^fl * |alpha| / (2^(8 - signed) - 1)
(fix_quant_ops.py:501-519) which is folded into the BN-folded weights, so the
inference graph needs no explicit clipping or FP scaling at all.

Layouts are TPU-native: activations NHWC, conv weights HWIO, linear weights
(in, out).  All functions are pure and jittable; `mode` is a static string in
{'train', 'eval', 'calib'}.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fxp import (
    fix_quant,
    fraclen_gridsearch,
    metric2fraclen,
    metric_fn,
    ste_quant,
)
from .spec import ConvBNSpec, LayerGraph, LinearSpec

INT32_BOUND = float((1 << 31) - 1)

# Global average pool as a power-of-two shift: shift = round(log2(k^2)),
# derived from the actual pooled extent (fix_quant_ops.py:117-124).  The
# residual factor 2^shift/k^2 is folded into the preceding conv's weights when
# pool_fusing is on (fix_quant_ops.py:117-138).


def avgpool_shift_for(kernel: int) -> int:
    """shiftnum = round(log2(k*k)) of the reference's FXQAvgPool2d."""
    return max(int(round(math.log2(float(kernel * kernel)))), 0)


def avgpool_scale_for(kernel: int) -> float:
    """Pool-fusing residue 2^shift / k^2 folded into the preceding conv."""
    return 2.0 ** avgpool_shift_for(kernel) / float(kernel * kernel)


# Legacy constants for the ImageNet 224 -> 7x7 case.
AVGPOOL_SHIFT = avgpool_shift_for(7)
AVGPOOL_SCALE = avgpool_scale_for(7)


class Act(NamedTuple):
    """Activation value plus its (optional) fixed-point output fraclen.

    Replaces the reference's `output_fraclen` attribute monkey-patched onto
    tensors; `fl` is None outside the integer-simulation eval modes.
    """

    x: jnp.ndarray
    fl: Optional[jnp.ndarray] = None


def as_act(v) -> Act:
    return v if isinstance(v, Act) else Act(v, None)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_conv_params(rng, spec: ConvBNSpec) -> Dict[str, jnp.ndarray]:
    """He-normal conv weight (std = sqrt(2/(kh*kw*out_ch)), the reference's
    reset_parameters, fix_resnet.py:509-524), BN gamma=1/beta=0, PACT alpha=8."""
    kh, kw = spec.kernel
    n = kh * kw * spec.out_ch
    w = jax.random.normal(rng, spec.weight_shape(), jnp.float32) * math.sqrt(2.0 / n)
    return {
        "w": w,
        "alpha": jnp.asarray(8.0, jnp.float32),
        "gamma": jnp.ones((spec.out_ch,), jnp.float32),
        "beta": jnp.zeros((spec.out_ch,), jnp.float32),
    }


def init_linear_params(rng, spec: LinearSpec) -> Dict[str, jnp.ndarray]:
    w = jax.random.normal(rng, spec.weight_shape(), jnp.float32) * 0.01
    p = {"w": w, "alpha": jnp.asarray(8.0, jnp.float32)}
    if spec.bias:
        p["bias"] = jnp.zeros((spec.out_features,), jnp.float32)
    return p


def _ema_shape(cfg, in_ch: int):
    return (in_ch,) if cfg.format_type == "per_channel" else (1,)


def init_conv_state(cfg, spec: ConvBNSpec) -> Dict[str, jnp.ndarray]:
    _, x_fl = cfg.input_format
    return {
        "bn_mean": jnp.zeros((spec.out_ch,), jnp.float32),
        "bn_var": jnp.ones((spec.out_ch,), jnp.float32),
        "bn_count": jnp.zeros((), jnp.float32),
        "input_fl_ema": jnp.full(_ema_shape(cfg, spec.in_ch), float(x_fl), jnp.float32),
    }


def init_linear_state(cfg, spec: LinearSpec) -> Dict[str, jnp.ndarray]:
    _, x_fl = cfg.input_format
    # per-channel input format is not supported for linear layers (the
    # reference warns and falls back to a scalar, fix_quant_ops.py:1129-1145)
    return {"input_fl_ema": jnp.full((1,), float(x_fl), jnp.float32)}


# ---------------------------------------------------------------------------
# fix_scaling: the PACT clipping level as a fixed-point scale
# ---------------------------------------------------------------------------


def _alpha_of(graph: LayerGraph, name: str, params) -> jnp.ndarray:
    """get_alpha with master delegation (fix_quant_ops.py:478-484): master
    first, then weight_only layers degrade to 1."""
    spec = graph[name]
    if spec.master is not None:
        return _alpha_of(graph, spec.master, params)
    if spec.weight_only:
        return jnp.ones_like(params[name]["alpha"])
    return params[name]["alpha"]


def ema_owner(graph: LayerGraph, cfg, name: str) -> str:
    """Which layer's input_fl_ema buffer this layer reads/writes
    (fix_quant_ops.py:486-496)."""
    spec = graph[name]
    if (not spec.weight_only) and cfg.input_fraclen_sharing and spec.master is not None:
        return spec.master
    return name


def input_fraclen(graph: LayerGraph, cfg, name: str, state) -> jnp.ndarray:
    """get_input_fraclen: 8 for weight-only layers, else the EMA buffer
    (possibly the master's when input_fraclen_sharing)."""
    spec = graph[name]
    if spec.weight_only:
        return jnp.full((1,), 8.0, jnp.float32)
    return state[ema_owner(graph, cfg, name)]["input_fl_ema"]


def fix_scaling(graph: LayerGraph, cfg, name: str, params, state) -> jnp.ndarray:
    """2^fl * |alpha| / (2^(wl - signed) - 1), with the EMA-rounded fraclen
    (fix_quant_ops.py:501-519).  Shape (1,) or (in_ch,) for per-channel."""
    spec = graph[name]
    alpha = jnp.abs(_alpha_of(graph, name, params))
    if cfg.no_clipping:
        return jnp.ones_like(alpha).reshape(-1)
    if spec.weight_only:
        return alpha.reshape(-1)
    x_wl, x_fl = graph.input_format(name, cfg)
    denom = float(2 ** (x_wl - int(spec.double_side)) - 1)
    if cfg.floating_model and not cfg.floating_wo_clip:
        return (jnp.exp2(float(x_fl)) * alpha / denom).reshape(-1)
    fl = input_fraclen(graph, cfg, name, state)
    fl = jnp.clip(jnp.round(fl), 0.0, float(x_wl - int(spec.double_side)))
    return jnp.exp2(fl) * alpha / denom


def all_fix_scalings(graph: LayerGraph, cfg, params, state) -> Dict[str, jnp.ndarray]:
    return {name: fix_scaling(graph, cfg, name, params, state) for name in graph.names()}


# ---------------------------------------------------------------------------
# Input quantization (shared by conv/linear)
# ---------------------------------------------------------------------------


def _input_metric_axes(cfg, ndim: int):
    if cfg.format_type == "per_channel":
        return tuple(range(ndim - 1))  # all but the channel axis
    return tuple(range(ndim))


def _quantize_input(graph, cfg, name, state, x, training: bool):
    """Returns (x_val, input_fl, updates).  input_fl is the fraclen actually
    used for quantization this step (fresh metric during training, rounded EMA
    at eval) -- fix_quant_ops.py:218-317."""
    spec = graph[name]
    ds = spec.double_side
    updates = {}
    caxis = x.ndim - 1

    if spec.weight_only:
        x_val = x if ds else jax.nn.relu(x)
        return x_val, jnp.full((1,), 8.0, jnp.float32), updates
    if cfg.floating_wo_clip:
        x_val = x if ds else jax.nn.relu(x)
        return x_val, None, updates

    x_wl, x_fl_default = graph.input_format(name, cfg)
    if cfg.floating_model:
        fl = jnp.full((1,), float(x_fl_default), jnp.float32)
        return ste_quant(x, fl, x_wl, caxis, ds, True), fl, updates

    if not (cfg.format_grid_search or cfg.format_from_metric):
        raise NotImplementedError("need format_from_metric or format_grid_search")

    owner = ema_owner(graph, cfg, name)
    if training:
        if cfg.format_grid_search:
            fl = fraclen_gridsearch(x, x_wl, caxis, ds).reshape(1)
        else:
            assert x_wl == 8, "word lengths other than 8 bit are not implemented"
            m = metric_fn(cfg.metric, _input_metric_axes(cfg, x.ndim))(x)
            fl = metric2fraclen(m, cfg.metric, 1.0, ds)
            fl = jnp.clip(fl, 0.0, float(x_wl - int(ds))).reshape(-1)
        x_val = ste_quant(x, fl, x_wl, caxis, ds, False)
        mom = cfg.momentum_for_metric
        ema = state[owner]["input_fl_ema"]
        updates[owner] = {"input_fl_ema": mom * fl + (1.0 - mom) * ema}
        return x_val, fl, updates
    else:
        ema = state[owner]["input_fl_ema"]
        fl = jnp.clip(jnp.round(ema), 0.0, float(x_wl - int(ds)))
        return ste_quant(x, fl, x_wl, caxis, ds, False), fl, updates


# ---------------------------------------------------------------------------
# ConvBN
# ---------------------------------------------------------------------------


def _conv2d(x, w, spec: ConvBNSpec):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=spec.stride,
        padding=[(spec.padding[0],) * 2, (spec.padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv2d_bf16(x, w, spec: ConvBNSpec):
    """f32-equivalent training conv with bf16 operands (one MXU pass instead
    of XLA's multi-pass f32 conv decomposition; bf16 runs at the chip's full
    matmul rate, docs/BENCHMARKS.md).

    Exact when both operands lie on <= 8-bit quantization grids: values are
    k * 2^-fl with |k| <= 255, and bf16's 8-bit significand holds those
    integers exactly, so the f32 accumulation matches the f32 conv up to
    reduction order (the same class of noise QAT already carries).  The stat
    conv's raw weights are NOT on a grid -- they round at ~2^-9 relative,
    perturbing only the BN statistics (opt-in via cfg.train_conv_bf16).
    Backward runs in f32: cotangents are arbitrary floats."""
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=spec.stride,
        padding=[(spec.padding[0],) * 2, (spec.padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        preferred_element_type=jnp.float32,
    )


def _conv2d_bf16_fwd(x, w, spec):
    return _conv2d_bf16(x, w, spec), (x, w)


def _conv2d_bf16_bwd(spec, res, g):
    # f32 backward convs; the f32 forward below is dead code under jit (the
    # VJP of a bilinear op needs only the residual operands), so XLA DCEs it
    x, w = res
    _, vjp = jax.vjp(lambda a, b: _conv2d(a, b, spec), x, w)
    return vjp(g)


_conv2d_bf16.defvjp(_conv2d_bf16_fwd, _conv2d_bf16_bwd)


def _weight_metric_axes(cfg):
    # HWIO: per-channel statistics are per output channel (all but axis 3)
    return (0, 1, 2) if cfg.format_type == "per_channel" else (0, 1, 2, 3)


def _conv_weight_rescale(cfg, spec: ConvBNSpec, w):
    """Forward weight standardization (fix_quant_ops.py:321-331): scale the
    raw weight to std 1/sqrt(out_ch*kh*kw) ('constant') before BN folding.
    The std factors are detached (no gradient through the statistics)."""
    if not cfg.rescale_forward_conv:
        return w
    kh, kw = spec.kernel
    sd = jnp.std(lax.stop_gradient(w), ddof=1)
    if cfg.rescale_type == "stddev":
        scale = jnp.std(lax.stop_gradient(w), ddof=1) / sd
    elif cfg.rescale_type == "constant":
        scale = (1.0 / math.sqrt(spec.out_ch * kh * kw)) / sd
    else:
        raise NotImplementedError(cfg.rescale_type)
    return w * scale


def _fold_scales(spec: ConvBNSpec, w, bn_scale, fs_self, fs_next):
    """BN-fold + cross-layer PACT scaling (fix_quant_ops.py:373-390).

    w is HWIO.  bn_scale = gamma/bn_std aligns to O; fs_self (len 1 or in_ch)
    aligns to I for dense convs and to the channel axis for depthwise;
    fs_next (len 1 or out_ch) aligns to O.
    """
    if spec.groups == 1:
        w = w * bn_scale * fs_self[None, None, :, None] / fs_next
    elif spec.is_depthwise:
        w = w * bn_scale * fs_self / fs_next
    else:
        raise NotImplementedError("grouped conv with 1 < groups < in_ch")
    return w


def _merged_view(state, updates):
    """State with per-layer updates overlaid (intra-batch visibility: a layer
    evaluating fix_scaling sees EMA buffers already advanced this step, like
    the reference's lazily-evaluated property)."""
    if not updates:
        return state
    merged = dict(state)
    for k, upd in updates.items():
        d = dict(merged[k])
        d.update(upd)
        merged[k] = d
    return merged


def conv_bn_apply(
    graph: LayerGraph,
    cfg,
    name: str,
    params,
    state,
    x_act,
    mode: str = "eval",
):
    """One fused quantized ConvBN forward (fix_quant_ops.py:218-440).

    Returns (Act, state_updates).  In training the BN running statistics are
    estimated with an extra convolution on the clip-scaled input (the
    reference's double-conv, :334-356) while the output conv uses this batch's
    statistics folded into the quantized weights.  The PACT scales fix_scaling
    (own and the following layer's) are evaluated against the state *after*
    this layer's EMA update, matching the reference's evaluation order.
    """
    spec = graph[name]
    assert isinstance(spec, ConvBNSpec)
    training = mode in ("train", "calib")
    x = as_act(x_act).x
    p, eps = params[name], cfg.bn_eps
    gamma, beta = p["gamma"], p["beta"]

    x_val, in_fl, updates = _quantize_input(graph, cfg, name, state, x, training)
    live = _merged_view(state, updates)
    fs_self = fix_scaling(graph, cfg, name, params, live)
    fs_next = (
        None
        if graph.following_of(name) is None
        else fix_scaling(graph, cfg, graph.following_of(name), params, live)
    )

    w = _conv_weight_rescale(cfg, spec, p["w"]) * spec.avgpool_scale

    # --- BatchNorm statistics -------------------------------------------------
    # (train_conv_bf16 never applies to the plain-FP32 baseline: its
    # operands are not on quantization grids, and the baseline's contract
    # is full f32)
    conv = (
        _conv2d_bf16
        if (training and cfg.train_conv_bf16 and not cfg.floating_wo_clip)
        else _conv2d
    )
    if training:
        if cfg.floating_wo_clip:
            y0 = conv(x_val, w, spec)
        else:
            y0 = conv(fs_self * x_val, w, spec)
        bn_mean = jnp.mean(y0, (0, 1, 2))
        var_b = jnp.var(y0, (0, 1, 2))
        bn_std = jnp.sqrt(var_b + eps)
        n = y0.size / spec.out_ch
        var_u = var_b * (n / max(n - 1.0, 1.0))
        st = state[name]
        if mode == "calib":
            cnt = st["bn_count"] + 1.0
            upd = {
                "bn_mean": st["bn_mean"] + (bn_mean - st["bn_mean"]) / cnt,
                "bn_var": st["bn_var"] + (var_u - st["bn_var"]) / cnt,
                "bn_count": cnt,
            }
        else:
            m = cfg.bn_momentum
            upd = {
                "bn_mean": (1 - m) * st["bn_mean"] + m * bn_mean,
                "bn_var": (1 - m) * st["bn_var"] + m * var_u,
            }
        updates.setdefault(name, {}).update(upd)
    else:
        bn_mean = state[name]["bn_mean"]
        bn_std = jnp.sqrt(state[name]["bn_var"] + eps)

    bn_scale = gamma / bn_std

    if cfg.floating_wo_clip:
        if training:
            # vanilla baseline: ONE conv, batch-stat normalization of its
            # output -- the graph a user trains without this framework.
            # (Re-running the conv with folded weights, as the QAT path
            # must, would silently double the baseline's conv cost and
            # corrupt the QAT/baseline overhead ratio.)
            y = bn_scale * (y0 - bn_mean) + beta
        else:
            y = _conv2d(x_val, w * bn_scale, spec) + (beta - bn_scale * bn_mean)
        return Act(y, None), updates

    # --- fold, quantize weight, bias -----------------------------------------
    w_eff = _fold_scales(spec, w, bn_scale, fs_self, fs_next)
    w_wl, w_fl_default = graph.weight_format(name, cfg)
    if cfg.floating_model:
        w_fl = jnp.full((1,), float(w_fl_default), jnp.float32)
    elif cfg.format_grid_search:
        w_fl = fraclen_gridsearch(w_eff, w_wl, 3, True).reshape(1)
    elif cfg.format_from_metric:
        assert w_wl == 8, "word lengths other than 8 bit are not implemented"
        m = metric_fn(cfg.metric, _weight_metric_axes(cfg))(w_eff)
        w_fl = jnp.clip(
            metric2fraclen(m, cfg.metric, 1.0, True), 0.0, float(w_wl - 1)
        ).reshape(-1)
    else:
        raise NotImplementedError
    w_q = ste_quant(w_eff, w_fl, w_wl, 3, True, cfg.floating_model)

    bias = (beta - bn_scale * bn_mean) / fs_next
    if (not training) and cfg.quant_bias:
        bias, _ = fix_quant(bias, 32, in_fl + w_fl, 0, True)

    # --- conv ----------------------------------------------------------------
    if cfg.int_infer and not training:
        # integer-valued float simulation (fix_quant_ops.py:418-431)
        if cfg.format_type == "per_channel":
            # A per-channel output fraclen has no consumer contract (residual
            # adds and pooling align scalar fls); the reference's own
            # per-channel int_infer path fails at the same division
            # (fix_quant_ops.py:430 broadcasts (O,1,1,1) against (N,O,H,W)).
            raise NotImplementedError(
                "int_infer requires format_type='per_layer'; per-channel "
                "fraclens have no integer-inference scale contract"
            )
        int_w = jnp.round(w_q * jnp.exp2(w_fl))
        int_x = jnp.round(x_val * jnp.exp2(in_fl))
        int_b = jnp.round(bias * jnp.exp2(in_fl + w_fl))
        y = _conv2d(int_x, int_w, spec) + int_b
        y = jnp.clip(y, -INT32_BOUND, INT32_BOUND)
        out_fl = (w_fl + in_fl).reshape(-1)[:1]
        y = y / jnp.exp2(out_fl)
        return Act(y, out_fl), updates

    y = conv(x_val, w_q, spec) + bias
    return Act(y, None), updates


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_apply(
    graph: LayerGraph,
    cfg,
    name: str,
    params,
    state,
    x_act,
    mode: str = "eval",
):
    """Quantized fully-connected forward (fix_quant_ops.py:759-932).

    Order differs from conv: the raw weight is quantized first, then the
    standardization scale is applied (training) or divided into the bias
    (eval).  During training the clip scale multiplies the quantized input;
    at eval it is folded into the bias instead (logits scale by a positive
    constant, argmax-invariant).
    """
    spec = graph[name]
    assert isinstance(spec, LinearSpec)
    training = mode == "train"  # BN calibration leaves linear layers in eval
    x = as_act(x_act).x
    p = params[name]

    x_val, in_fl, updates = _quantize_input(graph, cfg, name, state, x, training)
    fs_self = fix_scaling(graph, cfg, name, params, _merged_view(state, updates))

    rescale = cfg.rescale_forward
    if cfg.floating_wo_clip:
        w = p["w"]
        if rescale:
            sd = jnp.std(lax.stop_gradient(w), ddof=1)
            if cfg.rescale_type == "stddev":
                ws = jnp.std(lax.stop_gradient(w), ddof=1) / sd
            else:
                ws = (1.0 / math.sqrt(spec.out_features)) / sd
            w = w * ws
        y = x_val @ w
        if "bias" in p:
            y = y + p["bias"]
        return Act(y, None), updates

    w = p["w"]
    w_wl, w_fl_default = graph.weight_format(name, cfg)
    if cfg.floating_model:
        w_fl = jnp.full((1,), float(w_fl_default), jnp.float32)
    elif cfg.format_grid_search:
        w_fl = fraclen_gridsearch(w, w_wl, 1, True).reshape(1)
    elif cfg.format_from_metric:
        assert w_wl == 8
        axes = (0,) if cfg.format_type == "per_channel" else (0, 1)
        m = metric_fn(cfg.metric, axes)(w)
        w_fl = jnp.clip(
            metric2fraclen(m, cfg.metric, 1.0, True), 0.0, float(w_wl - 1)
        ).reshape(-1)
    else:
        raise NotImplementedError
    w_q = ste_quant(w, w_fl, w_wl, 1, True, cfg.floating_model)

    if rescale:
        sd = jnp.std(lax.stop_gradient(w_q), ddof=1)
        if cfg.rescale_type == "stddev":
            ws = jnp.std(lax.stop_gradient(p["w"]), ddof=1) / sd
        elif cfg.rescale_type == "constant":
            ws = (1.0 / math.sqrt(spec.out_features)) / sd
        else:
            raise NotImplementedError(cfg.rescale_type)
    else:
        ws = jnp.asarray(1.0, jnp.float32)

    has_bias = "bias" in p
    if training:
        y = (x_val * fs_self) @ (w_q * ws)
        if has_bias:
            y = y + p["bias"]
        return Act(y, None), updates

    if has_bias:
        bias = p["bias"] / fs_self / ws
        if cfg.quant_bias:
            bias, _ = fix_quant(bias, 32, in_fl + w_fl, 0, True)
    else:
        bias = None

    if cfg.int_infer:
        int_w = jnp.round(w_q * jnp.exp2(w_fl))
        int_x = jnp.round(x_val * jnp.exp2(in_fl))
        y = int_x @ int_w
        if bias is not None:
            y = y + jnp.round(bias * jnp.exp2(in_fl + w_fl))
        y = jnp.clip(y, -INT32_BOUND, INT32_BOUND)
        # w_fl is (1,) per-layer or (out,) per-channel; either broadcasts
        # correctly over the (N, out) logits, and logits have no downstream
        # fraclen consumer, so per-channel is well-defined here.
        y = y / jnp.exp2(w_fl + in_fl)
        return Act(y, None), updates

    y = x_val @ w_q
    if bias is not None:
        y = y + bias
    return Act(y, None), updates


# ---------------------------------------------------------------------------
# Pools and residual adds
# ---------------------------------------------------------------------------


def adaptive_avgpool(act) -> Act:
    a = as_act(act)
    return Act(jnp.mean(a.x, (1, 2)), a.fl)


def fxq_avgpool(act, kernel: int = 7) -> Act:
    """Quantized global average pool: sum / 2^round(log2(k^2)) -- the exact
    divisor's residue is pool-fused into the previous conv
    (fix_quant_ops.py:117-138).  Float-simulation path; the integer engine
    has its own int32 variant."""
    a = as_act(act)
    if a.x.shape[1] != kernel or a.x.shape[2] != kernel:
        raise ValueError(
            f"fxq_avgpool built for a {kernel}x{kernel} extent got "
            f"{a.x.shape[1]}x{a.x.shape[2]}; build the model with the matching "
            f"image_size so the pool shift/fusing scale are consistent"
        )
    shift = avgpool_shift_for(kernel)
    y = jnp.sum(a.x, (1, 2)) / (2.0**shift)
    fl = None if a.fl is None else a.fl + shift
    return Act(y, fl)


def maxpool(act, kernel: int, stride: int, padding: int) -> Act:
    """Stock max pool (pads with -inf)."""
    a = as_act(act)
    y = lax.reduce_window(
        a.x,
        -jnp.inf,
        lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return Act(y, a.fl)


def fxq_maxpool(act, kernel: int, stride: int, padding: int) -> Act:
    """Fraclen-preserving max pool that pads with zeros (the reference's
    pad+unfold formulation, fix_quant_ops.py:141-157); identical to stock
    maxpool on non-negative (post-ReLU) inputs and int-dtype safe."""
    a = as_act(act)
    x = jnp.pad(a.x, [(0, 0), (padding, padding), (padding, padding), (0, 0)])
    y = lax.reduce_window(
        x,
        jnp.asarray(jnp.iinfo(jnp.int32).min, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer)
        else jnp.asarray(-jnp.inf, x.dtype),
        lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0)] * 4,
    )
    return Act(y, a.fl)


def residual_add_int_sim(res: Act, x: Act) -> Act:
    """Integer-simulated residual add: align both operands on the max fraclen
    grid, add, saturate to int32 range, return to real scale
    (fix_resnet.py:158-186)."""
    out_fl = jnp.maximum(res.fl, x.fl)
    scale = jnp.exp2(out_fl)
    s = res.x * scale + x.x * scale
    s = jnp.clip(s, -INT32_BOUND, INT32_BOUND)
    return Act(s / scale, out_fl)
