"""Self-contained deployment bundle for the integer model.

The analog of the reference's exported artifacts (integized_model.pt /
int_op_only_model.onnx, fix_train.py:895-957): everything an external
runtime needs to execute the int-only model -- int8 weights, int32 biases,
the static shift plan, and the graph topology -- in one npz + JSON pair
with no framework-specific opcodes.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from ..nn.spec import ConvBNSpec, LinearSpec
from ..quant.plan import LayerPlan, QuantPlan


def save_deploy_bundle(path: str, model, plan: QuantPlan, int_params) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    layers = []
    for p in plan.layers:
        spec = model.graph[p.name]
        entry = {
            "name": p.name,
            "input_fl": p.input_fl,
            "weight_fl": p.weight_fl,
            "input_symmetric": p.input_symmetric,
            "kind": "linear" if isinstance(spec, LinearSpec) else "conv",
        }
        if isinstance(spec, ConvBNSpec):
            entry.update(
                stride=list(spec.stride),
                padding=list(spec.padding),
                groups=spec.groups,
            )
        layers.append(entry)
        arrays[f"{p.name}/w"] = np.asarray(int_params[p.name]["w"])
        if "b" in int_params[p.name]:
            arrays[f"{p.name}/b"] = np.asarray(int_params[p.name]["b"])
    topo = {
        "model": model.name,
        "num_classes": model.num_classes,
        "block_setting": model.block_setting,
        "blocks": [
            {
                "body": list(m.body),
                "shortcut": getattr(m, "shortcut", None),
                "residual": bool(getattr(m, "residual", getattr(m, "shortcut", 1) is None)),
            }
            for m in model.blocks
        ],
        "layers": layers,
        "cfg": {
            "normalize": model.cfg.normalize,
            "quant_avgpool": model.cfg.quant_avgpool,
            "pool_fusing": model.cfg.pool_fusing,
        },
    }
    npz = path if path.endswith(".npz") else path + ".npz"
    np.savez(npz, **arrays)
    with open(npz + ".json", "w") as f:
        json.dump(topo, f, indent=1)
    return npz


def load_deploy_bundle(path: str) -> Tuple[dict, QuantPlan, dict]:
    npz = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz) as z:
        flat = {k: z[k] for k in z.files}
    with open(npz + ".json") as f:
        topo = json.load(f)
    import jax.numpy as jnp

    int_params = {}
    for entry in topo["layers"]:
        name = entry["name"]
        d = {"w": jnp.asarray(flat[f"{name}/w"])}
        if f"{name}/b" in flat:
            d["b"] = jnp.asarray(flat[f"{name}/b"])
        int_params[name] = d
    plan = QuantPlan(
        tuple(
            LayerPlan(
                name=e["name"],
                input_fl=int(e["input_fl"]),
                weight_fl=int(e["weight_fl"]),
                input_symmetric=bool(e["input_symmetric"]),
            )
            for e in topo["layers"]
        )
    )
    return topo, plan, int_params
