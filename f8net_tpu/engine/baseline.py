"""Plain (unquantized) forward of the same topology, for benchmarking.

The reference publishes no throughput numbers, so the speed baseline is the
same network executed as an ordinary bf16 CNN through XLA -- the thing a user
would deploy without this framework.  vs_baseline > 1 means the int8 engine
beats bf16 on the same chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.spec import ConvBNSpec


def _conv(x, w, spec: ConvBNSpec, dtype):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=spec.stride,
        padding=[(spec.padding[0],) * 2, (spec.padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        preferred_element_type=dtype,
    )


def _maxpool(x, k, s, p):
    return lax.reduce_window(
        x,
        jnp.asarray(-jnp.inf, x.dtype),
        lax.max,
        (1, k, k, 1),
        (1, s, s, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )


def plain_params(model, int_params, dtype=jnp.bfloat16):
    """Dense float weights with the engine's values (magnitudes irrelevant
    for throughput; shapes/layouts identical)."""
    out = {}
    for name, entry in int_params.items():
        e = {"w": entry["w"].astype(dtype)}
        if "b" in entry:
            e["b"] = entry["b"].astype(dtype)
        out[name] = e
    return out


def plain_forward(model, fparams, x, dtype=jnp.bfloat16):
    """Conv+bias+ReLU of the same graph in bf16 (no quant ops anywhere)."""
    x = x.astype(dtype)
    g = model.graph

    def conv(name, v):
        p = fparams[name]
        return _conv(v, p["w"], g[name], dtype) + p["b"]

    v = jax.nn.relu(conv("head", x))
    if model.name.startswith("resnet"):
        v = _maxpool(v, 3, 2, 1)
    for meta in model.blocks:
        v_in = v
        for i, cname in enumerate(meta.body):
            if i > 0:
                v = jax.nn.relu(v)
            v = conv(cname, v)
        residual = getattr(meta, "residual", meta.shortcut is None if hasattr(meta, "shortcut") else False)
        if hasattr(meta, "shortcut"):
            s = v_in if meta.shortcut is None else conv(meta.shortcut, v_in)
            v = jax.nn.relu(v + s)
        elif getattr(meta, "residual", False):
            v = v + v_in
        else:
            v = jax.nn.relu(v)
    if model.name == "mobilenet_v2":
        v = jax.nn.relu(conv("tail", v))
    v = jnp.mean(v, (1, 2))
    p = fparams["classifier"]
    return (v @ p["w"] + p.get("b", 0)).astype(jnp.float32)
