"""Integer-only inference engine.

The product of the framework: a jitted forward where every conv/matmul is an
int8 x int8 multiply accumulating in int32, and every requantization is a
compile-time-constant power-of-two shift (round-half-to-even) -- no FP32 and
no 32-bit integer scale factors anywhere on the hot path.

Two execution paths share one graph walk:
  * int_op_only (the real engine): int8/int32 tensors end to end; parity
    target is the reference's converted IntModel on CPU int tensors
    (fix_resnet.py:26-77, fix_mobilenet_v1.py:25-38, fix_mobilenet_v2.py:20-48).
  * float-sim ("integize"): identical integer values carried in float32,
    mirroring the reference's GPU integize mode (fix_resnet.py:78-119).
    Used as a cross-check oracle; must agree bit-for-bit with int_op_only
    while accumulators stay within the f32-exact range.

All fraclens come from the static QuantPlan, so residual-add alignment shifts
and requant amounts are Python ints resolved at trace time.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.quant_layers import AVGPOOL_SHIFT
from ..nn.spec import ConvBNSpec
from ..ops.fxp import fix_quant, shift_requant

INT32_MAX = (1 << 31) - 1


def _conv_int(x, w, spec: ConvBNSpec, accum_dtype=jnp.int32, pad_value: int = 0):
    """int8 conv with int32 accumulation (maps onto the MXU on TPU).

    pad_value != 0 pre-pads explicitly: with the zero-point repack
    (s8 = u8 - 128) an unsigned zero is -128, not 0, so border taps must pad
    with -128 for the folded compensation 128*colsum(w) to stay exact.
    """
    ph, pw = spec.padding
    if pad_value != 0 and (ph or pw):
        x = jnp.pad(
            x,
            [(0, 0), (ph, ph), (pw, pw), (0, 0)],
            constant_values=x.dtype.type(pad_value),
        )
        padding = [(0, 0), (0, 0)]
    else:
        padding = [(ph, ph), (pw, pw)]
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=spec.stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        preferred_element_type=accum_dtype,
    )


def _conv_float(x, w, spec: ConvBNSpec):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=spec.stride,
        padding=[(spec.padding[0],) * 2, (spec.padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
    )


def _maxpool(x, kernel, stride, padding):
    init = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
    return lax.reduce_window(
        x,
        jnp.asarray(init, x.dtype),
        lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


class _Walker:
    """Shared graph walk for both engine dtypes."""

    def __init__(self, model, plan, int_params, cfg, int_only: bool, int8_operands: bool = True):
        self.model = model
        self.graph = model.graph
        self.plan = plan
        self.params = int_params
        self.cfg = cfg
        self.int_only = int_only
        self.int8_operands = int8_operands

    # -- integer path -------------------------------------------------------

    def conv_int(self, name, x, cur_fl):
        """Requantize to the layer's 8-bit input format, then int8 conv.

        With int8_operands (the MXU path) unsigned activations in [0, 255]
        are repacked as s8 = u8 - 128 and the compensation 128 * colsum(w) is
        pre-folded into the bias ('b_zp') -- values and accumulation are
        bit-identical to the int32 reference path.
        """
        pl = self.plan[name]
        spec = self.graph[name]
        if cur_fl != pl.input_fl:
            x = shift_requant(x, 8, pl.input_fl, cur_fl, pl.input_symmetric)
        p = self.params[name]
        if self.int8_operands:
            if pl.input_symmetric:
                y = _conv_int(x.astype(jnp.int8), p["w"], spec) + p["b"]
            else:
                x8 = (x - 128).astype(jnp.int8)
                b = p.get("b_zp")
                if b is None:
                    b = p["b"] + 128 * jnp.sum(
                        p["w"].astype(jnp.int32), axis=(0, 1, 2)
                    )
                y = _conv_int(x8, p["w"], spec, pad_value=-128) + b
        else:
            y = _conv_int(x, p["w"].astype(jnp.int32), spec) + p["b"]
        return y, pl.out_fl

    # -- float-simulation path ---------------------------------------------

    def conv_sim(self, name, x):
        """Quantize the real-valued input to the 8-bit grid, conv with
        integer-valued float weights, rescale back (fix_resnet.py:78-90)."""
        pl = self.plan[name]
        spec = self.graph[name]
        q, _ = fix_quant(x, 8, float(pl.input_fl), x.ndim - 1, pl.input_symmetric)
        xi = jnp.round(q * 2.0**pl.input_fl)
        w = self.params[name]["w"].astype(jnp.float32)
        y = _conv_float(xi, w, spec) + self.params[name]["b"].astype(jnp.float32)
        y = jnp.clip(y, -float(INT32_MAX), float(INT32_MAX))
        return y / 2.0**pl.out_fl

    # -- residual adds ------------------------------------------------------

    def add_int(self, res, res_fl, x, x_fl):
        """Left-shift the lower-fraclen operand onto the common grid, add,
        saturate to int32 (fix_resnet.py:40-76)."""
        if res_fl >= x_fl:
            x = x << (res_fl - x_fl)
            out_fl = res_fl
        else:
            res = res << (x_fl - res_fl)
            out_fl = x_fl
        s = jnp.clip(res + x, -INT32_MAX, INT32_MAX)
        return s, out_fl

    def add_sim(self, res, res_fl, x, x_fl):
        out_fl = max(res_fl, x_fl)
        scale = 2.0**out_fl
        s = jnp.clip(res * scale + x * scale, -float(INT32_MAX), float(INT32_MAX))
        return s / scale, out_fl


def _block_resnet(w: _Walker, meta, x, fl):
    x_in, fl_in = x, fl
    if w.int_only:
        for i, cname in enumerate(meta.body):
            if i > 0:
                x = jnp.maximum(x, 0)
            x, fl = w.conv_int(cname, x, fl)
        if meta.shortcut is None:
            s, s_fl = x_in, fl_in
        else:
            s, s_fl = w.conv_int(meta.shortcut, x_in, fl_in)
        x, fl = w.add_int(x, fl, s, s_fl)
        x = jnp.maximum(x, 0)
    else:
        for i, cname in enumerate(meta.body):
            if i > 0:
                x = jnp.maximum(x, 0.0)
            x = w.conv_sim(cname, x)
        fl = w.plan[meta.body[-1]].out_fl
        if meta.shortcut is None:
            s, s_fl = x_in, fl_in
        else:
            s = w.conv_sim(meta.shortcut, x_in)
            s_fl = w.plan[meta.shortcut].out_fl
        x, fl = w.add_sim(x, fl, s, s_fl)
        x = jnp.maximum(x, 0.0)
    return x, fl


def _block_mbv1(w: _Walker, meta, x, fl):
    if w.int_only:
        for i, cname in enumerate(meta.body):
            if i > 0:
                x = jnp.maximum(x, 0)
            x, fl = w.conv_int(cname, x, fl)
        x = jnp.maximum(x, 0)  # trailing ReLU (fix_mobilenet_v1.py:85-91)
    else:
        for i, cname in enumerate(meta.body):
            if i > 0:
                x = jnp.maximum(x, 0.0)
            x = w.conv_sim(cname, x)
        fl = w.plan[meta.body[-1]].out_fl
        x = jnp.maximum(x, 0.0)
    return x, fl


def _block_mbv2(w: _Walker, meta, x, fl):
    x_in, fl_in = x, fl
    if w.int_only:
        for i, cname in enumerate(meta.body):
            if i > 0:
                x = jnp.maximum(x, 0)
            x, fl = w.conv_int(cname, x, fl)
        if meta.residual:
            x, fl = w.add_int(x, fl, x_in, fl_in)
    else:
        for i, cname in enumerate(meta.body):
            if i > 0:
                x = jnp.maximum(x, 0.0)
            x = w.conv_sim(cname, x)
        fl = w.plan[meta.body[-1]].out_fl
        if meta.residual:
            x, fl = w.add_sim(x, fl, x_in, fl_in)
    return x, fl


def _classifier(w: _Walker, x, fl):
    pl = w.plan["classifier"]
    if w.int_only:
        if fl != pl.input_fl:
            x = shift_requant(x, 8, pl.input_fl, fl, pl.input_symmetric)
        p = w.params["classifier"]
        if w.int8_operands:
            if pl.input_symmetric:
                x8, b = x.astype(jnp.int8), p.get("b")
            else:
                x8 = (x - 128).astype(jnp.int8)
                comp = 128 * jnp.sum(p["w"].astype(jnp.int32), axis=0)
                b = p.get("b_zp", p.get("b", 0) + comp)
            y = jnp.matmul(x8, p["w"], preferred_element_type=jnp.int32)
        else:
            y = jnp.matmul(
                x.astype(jnp.int32),
                p["w"].astype(jnp.int32),
                preferred_element_type=jnp.int32,
            )
            b = p.get("b")
        if b is not None:
            y = y + b
        return y.astype(jnp.float32)
    q, _ = fix_quant(x, 8, float(pl.input_fl), 1, pl.input_symmetric)
    xi = jnp.round(q * 2.0**pl.input_fl)
    y = xi @ w.params["classifier"]["w"].astype(jnp.float32)
    if "b" in w.params["classifier"]:
        y = y + w.params["classifier"]["b"].astype(jnp.float32)
    # like the reference's integize mode, logits stay on the 2^out_fl integer
    # grid (IntModel.forward applies no final rescale) -- argmax-invariant
    return jnp.clip(y, -float(INT32_MAX), float(INT32_MAX))


def int_forward(model, plan, int_params, x, cfg=None, int8_operands: bool = True):
    """Integer-only forward.  `x` is the conditioned uint8-range input:
    round(255*image) as int32 (unnormalized pipeline, fraclen 8), or the
    head-quantized int for the normalized pipeline (fix_train.py:676-694)."""
    return _forward(model, plan, int_params, x, cfg, int_only=True, int8_operands=int8_operands)


def float_sim_forward(model, plan, int_params, x, cfg=None):
    """Float-dtype simulation of the integer graph ('integize' mode)."""
    return _forward(model, plan, int_params, x, cfg, int_only=False)


def add_zero_point_bias(model, plan, int_params):
    """Pre-fold the unsigned-activation compensation 128*colsum(w) into a
    'b_zp' entry for every layer with an unsigned (single-side) input."""
    from ..nn.spec import LinearSpec

    out = {}
    for name, entry in int_params.items():
        e = dict(entry)
        pl = plan[name]
        if not pl.input_symmetric:
            axes = (0,) if isinstance(model.graph[name], LinearSpec) else (0, 1, 2)
            comp = 128 * jnp.sum(entry["w"].astype(jnp.int32), axis=axes)
            e["b_zp"] = entry.get("b", 0) + comp
        out[name] = e
    return out


def _forward(model, plan, int_params, x, cfg, int_only: bool, int8_operands: bool = True):
    cfg = cfg or model.cfg
    w = _Walker(model, plan, int_params, cfg, int_only, int8_operands)
    fam = model.name
    head_pl = plan["head"]

    if int_only:
        x = x.astype(jnp.int32)
        hx, fl = w.conv_int("head", x, head_pl.input_fl)
    else:
        # real-valued input in [0,1): scale straight onto the fraclen-8 grid
        # (IntModel.forward float path, fix_resnet.py:385-399)
        if cfg.normalize:
            q, _ = fix_quant(x, 8, float(head_pl.input_fl), 3, head_pl.input_symmetric)
            xi = jnp.round(q * 2.0**head_pl.input_fl)
        else:
            xi = jnp.round(x * 2.0**head_pl.input_fl)
        hw = int_params["head"]["w"].astype(jnp.float32)
        hx = _conv_float(xi, hw, model.graph["head"]) + int_params["head"]["b"].astype(
            jnp.float32
        )
        hx = jnp.clip(hx, -float(INT32_MAX), float(INT32_MAX))
        hx = hx / 2.0**head_pl.out_fl
        fl = head_pl.out_fl

    hx = jnp.maximum(hx, hx.dtype.type(0))
    if fam.startswith("resnet"):
        hx = _maxpool(hx, 3, 2, 1)
        block_fn = _block_resnet
    elif fam == "mobilenet_v1":
        block_fn = _block_mbv1
    else:
        block_fn = _block_mbv2

    for meta in model.blocks:
        hx, fl = block_fn(w, meta, hx, fl)

    if fam == "mobilenet_v2":
        if int_only:
            hx, fl = w.conv_int("tail", hx, fl)
            hx = jnp.maximum(hx, 0)
        else:
            hx = w.conv_sim("tail", hx)
            fl = plan["tail"].out_fl
            hx = jnp.maximum(hx, 0.0)

    # global average pool
    if cfg.quant_avgpool:
        if int_only:
            hx = jnp.sum(hx, (1, 2))  # int32 sum; fraclen absorbs the 2^6
            fl = fl + AVGPOOL_SHIFT
        else:
            hx = jnp.sum(hx, (1, 2)) / 2.0**AVGPOOL_SHIFT
    else:
        if int_only:
            # reference falls back to float mean on this path
            # (fix_resnet.py:375-382)
            m = jnp.mean(hx.astype(jnp.float32), (1, 2)) / 2.0**fl
            pl = plan["classifier"]
            q, _ = fix_quant(m, 8, float(pl.input_fl), 1, pl.input_symmetric)
            hx = jnp.round(q * 2.0**pl.input_fl).astype(jnp.int32)
            fl = pl.input_fl
        else:
            hx = jnp.mean(hx, (1, 2))

    return _classifier(w, hx, fl)


class IntEngine:
    """Jitted integer inference engine bound to a baked plan."""

    def __init__(
        self,
        model,
        plan,
        int_params,
        cfg=None,
        int_only: bool = True,
        int8_operands: bool = True,
    ):
        self.model = model
        self.plan = plan
        self.cfg = cfg or model.cfg
        self.int_only = int_only
        self.int8_operands = int8_operands
        if int_only and int8_operands:
            int_params = add_zero_point_bias(model, plan, int_params)
        self.int_params = int_params
        if int_only:
            self._jit = jax.jit(
                lambda p, xx: int_forward(
                    self.model, self.plan, p, xx, self.cfg, int8_operands
                )
            )
        else:
            self._jit = jax.jit(
                lambda p, xx: float_sim_forward(self.model, self.plan, p, xx, self.cfg)
            )

    def __call__(self, x):
        return self._jit(self.int_params, x)

    def condition_input(self, images):
        """Reference input conditioning (fix_train.py:676-694): images in
        [0,1] NHWC float -> engine input."""
        head_pl = self.plan["head"]
        if self.int_only:
            if self.cfg.normalize:
                q, _ = fix_quant(
                    images, 8, float(head_pl.input_fl), 3, head_pl.input_symmetric
                )
                return jnp.round(q * 2.0**head_pl.input_fl).astype(jnp.int32)
            return jnp.round(255.0 * images).astype(jnp.int32)
        if self.cfg.normalize:
            return images  # fix_quant applied inside the forward
        return jnp.round(255.0 * images) / 256.0  # fix_train.py:694 conditioning
