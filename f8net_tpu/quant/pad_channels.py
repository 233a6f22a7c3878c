"""Bake-time channel padding: grow narrow channel dimensions to MXU/VPU
lane multiples with ZERO weights -- bit-exact by construction.

Motivation (docs/BENCHMARKS.md round-2): 1x1 convs with K,N < 128 waste up
to 8x of the MXU's 128 lanes, and XLA materializes lane-padding with
full-tensor copies at runtime.  Padding the *parameters* once at bake time
makes every activation be born lane-aligned: no pad/slice copies on the hot
path, identical MXU occupancy (idle lanes either way), at the cost of more
HBM bytes for the padded activations.  Whether that trades positively is a
model-level A/B question (VERDICT r2 item 3) -- this module provides the
transform + equality guarantee; bench.py --pad-channels runs the A/B.

Why it is bit-exact: a padded output channel has zero weights and zero
bias, so its pre-activation is exactly 0; ReLU/requant map 0 to 0 (and the
unsigned int8 packing maps it to -128 with the b_zp compensation term
derived from the PADDED weights, which contributes 128*0 = 0 for padded
input channels).  A padded input channel multiplies zero weights, adding
exactly 0 to every real accumulator.  Residual adds see both sides padded
to the same width (padding is a function of the channel VALUE, so equal
channel counts pad equally).  The classifier consumes padded rows with
zero weights, leaving logits untouched.

The padded model is an ENGINE artifact (IntEngine/serving): its spec graph
and int_params agree with each other but not with the original float
params/state -- QAT training and the QAT-sim eval modes are never padded.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

from ..nn.spec import ConvBNSpec, LayerGraph, LinearSpec


def _pad_to(c: int, multiple: int, threshold: int) -> int:
    """Channel padding policy: channels below `threshold` round up to the
    next multiple of `multiple`; image inputs (c <= 4) and already-wide
    dims stay."""
    if c <= 4 or c >= threshold:
        return c
    return int(-(-c // multiple) * multiple)


def pad_channels(
    model,
    int_params: Dict[str, Dict[str, jnp.ndarray]],
    multiple: int = 128,
    threshold: int = 128,
) -> Tuple[object, Dict[str, Dict[str, jnp.ndarray]]]:
    """Return (padded_model, padded_int_params) for the integer engine.

    `int_params` is the bake_plan output (int8 weights 'w', int32 bias 'b');
    any precomputed 'b_zp' is dropped and re-derived by the engine from the
    padded weights.  The QuantPlan is unchanged (per_layer formats carry no
    channel dimension).
    """
    pad = lambda c: _pad_to(c, multiple, threshold)

    new_specs = {}
    new_params = {}
    for name in model.graph.names():
        spec = model.graph[name]
        entry = {
            k: np.asarray(v) for k, v in int_params[name].items() if k != "b_zp"
        }
        if isinstance(spec, ConvBNSpec):
            ci, co = spec.in_ch, spec.out_ch
            pci, pco = pad(ci), pad(co)
            if spec.is_depthwise:
                # weight (kh,kw,1,C): the group count IS the channel count
                assert ci == co == spec.groups
                new_specs[name] = dataclasses.replace(
                    spec, in_ch=pci, out_ch=pco, groups=pci
                )
                w = entry["w"]
                entry["w"] = np.pad(w, ((0, 0), (0, 0), (0, 0), (0, pco - co)))
            else:
                assert spec.groups == 1, (name, spec.groups)
                new_specs[name] = dataclasses.replace(
                    spec, in_ch=pci, out_ch=pco
                )
                w = entry["w"]
                entry["w"] = np.pad(
                    w, ((0, 0), (0, 0), (0, pci - ci), (0, pco - co))
                )
            if "b" in entry:
                entry["b"] = np.pad(entry["b"], (0, pco - co))
        elif isinstance(spec, LinearSpec):
            fi = spec.in_features
            pfi = pad(fi)
            new_specs[name] = dataclasses.replace(spec, in_features=pfi)
            entry["w"] = np.pad(entry["w"], ((0, pfi - fi), (0, 0)))
        else:  # pragma: no cover
            raise TypeError(type(spec))
        new_params[name] = {k: jnp.asarray(v) for k, v in entry.items()}

    padded_model = dataclasses.replace(model, graph=LayerGraph(new_specs))
    return padded_model, new_params
