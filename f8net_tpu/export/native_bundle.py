"""Flat binary bundle for the native (C++) inference runtime.

A dependency-free format the C++ runtime (csrc/infer_main.cc) can read with
plain fread: header, topology (family, blocks, conv indices), then per-layer
records with raw int8/int32 tensors.  All integers little-endian int32.

Layout:
  magic 'F8NB' | version | family(0=resnet,1=mbv1,2=mbv2) | num_classes
  | quant_avgpool | n_layers | n_blocks
  per block: n_body | body layer indices... | shortcut idx or -1 | residual
  per layer: kind(0=conv,1=linear) | input_fl | weight_fl | symmetric
    conv:  kh kw cin cout stride pad groups | w int8[kh*kw*(cin/groups)*cout]
           (HWIO order) | b int32[cout]
    linear: in out has_bias | w int8[in*out] ((in,out) order) | b int32[out]?
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

from ..nn.spec import ConvBNSpec, LinearSpec

MAGIC = b"F8NB"
VERSION = 1
FAMILY = {"resnet": 0, "mobilenet_v1": 1, "mobilenet_v2": 2}


def save_native_bundle(path: str, model, plan, int_params) -> str:
    fam = 0 if model.name.startswith("resnet") else FAMILY[model.name]
    names: List[str] = [p.name for p in plan.layers]
    index = {n: i for i, n in enumerate(names)}

    out = bytearray()
    out += MAGIC
    out += struct.pack("<iiiiii", VERSION, fam, model.num_classes,
                       int(model.cfg.quant_avgpool), len(names), len(model.blocks))
    for meta in model.blocks:
        body = [index[n] for n in meta.body]
        shortcut = getattr(meta, "shortcut", None)
        residual = getattr(meta, "residual", shortcut is None)
        out += struct.pack("<i", len(body))
        for b in body:
            out += struct.pack("<i", b)
        out += struct.pack("<ii", index[shortcut] if shortcut else -1, int(residual))

    for p in plan.layers:
        spec = model.graph[p.name]
        entry = int_params[p.name]
        if isinstance(spec, ConvBNSpec):
            kh, kw = spec.kernel
            out += struct.pack("<iiii", 0, p.input_fl, p.weight_fl, int(p.input_symmetric))
            out += struct.pack("<iiiiiii", kh, kw, spec.in_ch, spec.out_ch,
                               spec.stride[0], spec.padding[0], spec.groups)
            out += np.ascontiguousarray(entry["w"], np.int8).tobytes()
            out += np.ascontiguousarray(entry["b"], np.int32).tobytes()
        else:
            out += struct.pack("<iiii", 1, p.input_fl, p.weight_fl, int(p.input_symmetric))
            has_b = int("b" in entry)
            out += struct.pack("<iii", spec.in_features, spec.out_features, has_b)
            out += np.ascontiguousarray(entry["w"], np.int8).tobytes()
            if has_b:
                out += np.ascontiguousarray(entry["b"], np.int32).tobytes()

    with open(path, "wb") as f:
        f.write(bytes(out))
    return path


def load_native_bundle(path: str) -> dict:
    """Parse an F8NB bundle back into Python (inspection / round-trip checks
    without the C++ runtime).  Returns {family, num_classes, quant_avgpool,
    blocks: [{body, shortcut, residual}], layers: [conv/linear dicts]}."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise ValueError("not an F8NB bundle")
    off = 4

    def ints(n):
        nonlocal off
        vals = struct.unpack_from(f"<{n}i", raw, off)
        off += 4 * n
        return vals

    version, family, num_classes, quant_avgpool, n_layers, n_blocks = ints(6)
    if version != VERSION:
        raise ValueError(f"unsupported F8NB version {version}")
    blocks = []
    for _ in range(n_blocks):
        (n_body,) = ints(1)
        body = list(ints(n_body))
        shortcut, residual = ints(2)
        blocks.append({"body": body, "shortcut": shortcut if shortcut >= 0 else None,
                       "residual": bool(residual)})
    layers = []
    for _ in range(n_layers):
        kind, input_fl, weight_fl, symmetric = ints(4)
        rec = {"input_fl": input_fl, "weight_fl": weight_fl, "symmetric": bool(symmetric)}
        if kind == 0:
            kh, kw, cin, cout, stride, pad, groups = ints(7)
            wn = kh * kw * (cin // groups) * cout
            w = np.frombuffer(raw, np.int8, wn, off).reshape(kh, kw, cin // groups, cout)
            off += wn
            b = np.frombuffer(raw, np.int32, cout, off)
            off += 4 * cout
            rec.update(kind="conv", kernel=(kh, kw), in_ch=cin, out_ch=cout,
                       stride=stride, padding=pad, groups=groups, w=w, b=b)
        else:
            fin, fout, has_b = ints(3)
            w = np.frombuffer(raw, np.int8, fin * fout, off).reshape(fin, fout)
            off += fin * fout
            b = None
            if has_b:
                b = np.frombuffer(raw, np.int32, fout, off)
                off += 4 * fout
            rec.update(kind="linear", in_features=fin, out_features=fout, w=w, b=b)
        layers.append(rec)
    if off != len(raw):
        raise ValueError(f"trailing bytes in bundle ({len(raw) - off})")
    return {"family": family, "num_classes": num_classes,
            "quant_avgpool": bool(quant_avgpool), "blocks": blocks, "layers": layers}
