"""QuantPlan: freeze a trained model into compile-time integer constants.

The reference threads `output_fraclen` dynamically through tensors and
rebuilds the module tree (`int_model()`, int_conv/int_fc exporters --
fix_quant_ops.py:680-714, 1165-1195; fix_resnet.py:526-544).  The TPU-native
design instead bakes a static QuantPlan: per-layer
(input_fl, weight_fl, symmetric) as Python ints plus an int8/int32 parameter
pytree.  Fraclens become compile-time constants inside jit/Pallas kernels,
which is exactly what "no 32-bit scaling on the hot path" requires -- every
requantization is a constant-amount bit shift.

Baking runs outside jit (concrete numpy), once, after training/calibration.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.quant_layers import (
    avgpool_scale_for,
    avgpool_shift_for,
    fix_scaling,
    input_fraclen,
)
from ..nn.spec import ConvBNSpec, LinearSpec
from ..ops.fxp import fix_quant, fraclen_gridsearch, metric2fraclen, metric_fn


@dataclasses.dataclass(frozen=True)
class LayerPlan:
    """Static quantization facts for one conv/linear layer."""

    name: str
    input_fl: int
    weight_fl: int
    input_symmetric: bool  # double_side: signed (two's-complement) input

    @property
    def out_fl(self) -> int:
        return self.input_fl + self.weight_fl


@dataclasses.dataclass(frozen=True)
class QuantPlan:
    layers: Tuple[LayerPlan, ...]

    def __getitem__(self, name: str) -> LayerPlan:
        return self._index()[name]

    def _index(self) -> Dict[str, LayerPlan]:
        if not hasattr(self, "_idx"):
            object.__setattr__(self, "_idx", {p.name: p for p in self.layers})
        return self._idx


def _weight_metric_axes_conv(cfg):
    return (0, 1, 2) if cfg.format_type == "per_channel" else (0, 1, 2, 3)


def folded_weight_bias(graph, cfg, name, params, state):
    """Eval-time effective float weight/bias of a ConvBN layer, before
    quantization and before any pool-fusing scale (the reference's
    float_weight/float_bias properties, fix_quant_ops.py:533-581)."""
    spec = graph[name]
    p = params[name]
    w = p["w"]
    if cfg.rescale_forward_conv:
        kh, kw = spec.kernel
        sd = jnp.std(lax.stop_gradient(w), ddof=1)
        if cfg.rescale_type == "constant":
            w = w * ((1.0 / math.sqrt(spec.out_ch * kh * kw)) / sd)
        elif cfg.rescale_type == "stddev":
            w = w * (jnp.std(lax.stop_gradient(w), ddof=1) / sd)
        else:
            raise NotImplementedError
    bn_mean = state[name]["bn_mean"]
    bn_std = jnp.sqrt(state[name]["bn_var"] + cfg.bn_eps)
    bn_scale = p["gamma"] / bn_std
    fs_self = fix_scaling(graph, cfg, name, params, state)
    fs_next = fix_scaling(graph, cfg, spec.following, params, state)
    if spec.groups == 1:
        w_eff = w * bn_scale * fs_self[None, None, :, None] / fs_next
    elif spec.is_depthwise:
        w_eff = w * bn_scale * fs_self / fs_next
    else:
        raise NotImplementedError
    bias = (p["beta"] - bn_scale * bn_mean) / fs_next
    return w_eff, bias


def _rounded_input_fl(graph, cfg, name, state) -> np.ndarray:
    spec = graph[name]
    x_wl, _ = graph.input_format(name, cfg)
    fl = input_fraclen(graph, cfg, name, state)
    return np.clip(np.round(np.asarray(fl)), 0, x_wl - int(spec.double_side))


def _weight_fl_of(cfg, w_eff, wl, axes) -> np.ndarray:
    if cfg.format_grid_search:
        return np.asarray(fraclen_gridsearch(w_eff, wl, w_eff.ndim - 1, True)).reshape(
            1
        )
    m = metric_fn(cfg.metric, axes)(w_eff)
    return np.clip(
        np.asarray(metric2fraclen(m, cfg.metric, 1.0, True)), 0, wl - 1
    ).reshape(-1)


def bake_plan(model, params, state, cfg=None):
    """Convert trained (params, state) into (QuantPlan, int_params).

    int_params[name] = {'w': int8 HWIO (conv) / (in,out) (linear),
                        'b': int32} at the scale 2^(input_fl + weight_fl).
    Pool fusing: the conversion-time scale 2^shift/k^2 is folded into
    model.pool_fuse_layer's weights and bias (reference int_conv's
    avgpool_scale argument, fix_quant_ops.py:680-714).
    """
    cfg = cfg or model.cfg
    graph = model.graph
    pool_k = getattr(model, "pool_kernel", 7)
    plans = []
    int_params = {}
    for name in graph.names():
        spec = graph[name]
        conv_scale = (
            avgpool_scale_for(pool_k) if name == model.pool_fuse_layer else 1.0
        )
        if isinstance(spec, ConvBNSpec):
            w_eff, bias = folded_weight_bias(graph, cfg, name, params, state)
            w_eff = np.asarray(w_eff) * conv_scale
            bias = np.asarray(bias) * conv_scale
            w_wl, _ = graph.weight_format(name, cfg)
            w_fl = _weight_fl_of(cfg, w_eff, w_wl, _weight_metric_axes_conv(cfg))
            in_fl = _rounded_input_fl(graph, cfg, name, state)
            assert w_fl.size == 1 and in_fl.size == 1, (
                "integer conversion requires per_layer formats"
            )
            w_q, _ = fix_quant(jnp.asarray(w_eff), w_wl, float(w_fl[0]), 3, True)
            int_w = np.rint(np.asarray(w_q) * 2.0 ** float(w_fl[0])).astype(np.int8)
            b_q, _ = fix_quant(
                jnp.asarray(bias), 32, float(in_fl[0] + w_fl[0]), 0, True
            )
            int_b = np.rint(np.asarray(b_q) * 2.0 ** float(in_fl[0] + w_fl[0])).astype(
                np.int32
            )
        elif isinstance(spec, LinearSpec):
            p = params[name]
            w = np.asarray(p["w"])
            w_wl, _ = graph.weight_format(name, cfg)
            axes = (0,) if cfg.format_type == "per_channel" else (0, 1)
            w_fl = _weight_fl_of(cfg, jnp.asarray(w), w_wl, axes)
            in_fl = _rounded_input_fl(graph, cfg, name, state)
            assert w_fl.size == 1 and in_fl.size == 1
            w_q, _ = fix_quant(jnp.asarray(w), w_wl, float(w_fl[0]), 1, True)
            int_w = np.rint(np.asarray(w_q) * 2.0 ** float(w_fl[0])).astype(np.int8)
            if spec.bias:
                fs = np.asarray(fix_scaling(graph, cfg, name, params, state))
                if cfg.rescale_forward:
                    sd = float(np.std(np.asarray(w_q), ddof=1))
                    if cfg.rescale_type == "stddev":
                        ws = float(np.std(w, ddof=1)) / sd
                    else:
                        ws = (1.0 / math.sqrt(spec.out_features)) / sd
                else:
                    ws = 1.0
                fb = np.asarray(p["bias"]) / fs / ws
                b_q, _ = fix_quant(
                    jnp.asarray(fb), 32, float(in_fl[0] + w_fl[0]), 0, True
                )
                int_b = np.rint(
                    np.asarray(b_q) * 2.0 ** float(in_fl[0] + w_fl[0])
                ).astype(np.int32)
            else:
                int_b = None
        else:
            continue
        plans.append(
            LayerPlan(
                name=name,
                input_fl=int(in_fl[0]),
                weight_fl=int(w_fl[0]),
                input_symmetric=bool(spec.double_side),
            )
        )
        entry = {"w": jnp.asarray(int_w)}
        if int_b is not None:
            entry["b"] = jnp.asarray(int_b)
        int_params[name] = entry

    if cfg.quant_avgpool:
        # Static mirror of the reference's runtime int-avgpool overflow assert
        # (fix_quant_ops.py:126-133: int64-promoted sum checked against 2^32,
        # output_fraclen checked against 32).  The pool input is an int32
        # activation whose fraclen is at most the largest conv out_fl in the
        # graph (residual adds align on the max), so both bounds are checkable
        # once, here, with compile-time constants.
        shift = avgpool_shift_for(pool_k)
        max_out_fl = max(p.out_fl for p in plans)
        assert max_out_fl + shift <= 32, (
            f"avgpool output_fraclen {max_out_fl + shift} > 32 "
            f"(pool {pool_k}x{pool_k}, shift {shift})"
        )
        # Accumulator headroom: a pooled sum that does not saturate the
        # classifier's 8-bit input grid after the requant satisfies
        # |sum| <= 256 * 2^(fl_pool - cls_in_fl); demand that every such
        # meaningful sum is representable in int32.  (The reference asserts
        # the same property dynamically on int64-promoted sums,
        # fix_quant_ops.py:129-133; sums past this bound clamp downstream.)
        cls_in_fl = plans[-1].input_fl
        sum_bound = 256 * 2 ** max(max_out_fl + shift - cls_in_fl, 0)
        assert sum_bound < (1 << 31), (
            f"avgpool over {pool_k}x{pool_k} can overflow the int32 accumulator "
            f"(meaningful-sum bound {sum_bound} >= 2^31)"
        )
    return QuantPlan(tuple(plans)), int_params
