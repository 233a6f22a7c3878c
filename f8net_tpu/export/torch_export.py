"""TorchScript export of the integer-only model.

The reference ships its converted models as ONNX (myutils/export.py); this
image has no onnx, so the external-runtime artifact here is a traced
TorchScript module executing the identical int32 graph on CPU (torch
supports integer conv2d).  Input contract matches the reference's exported
int model: int32 NCHW at the head's input fraclen.

Bit-parity with the JAX engine is asserted in tests (a third independent
execution of the same plan, after XLA and the C++ golden kernels).
"""

from __future__ import annotations

import numpy as np

from ..nn.spec import ConvBNSpec


def _requant_torch(torch, x, wl: int, fl: int, input_fl: int, signed: bool):
    net = input_fl - fl
    if net > 0:
        half = 1 << (net - 1)
        res = x + half
        tie = (x % (1 << net)) == half
        res = torch.where(tie, (res >> (net + 1)) << 1, res >> net)
    else:
        res = x << (-net)
    bound = (1 << (wl - 1)) - 1 if signed else (1 << wl) - 1
    lo = -bound if signed else 0
    return torch.clamp(res, lo, bound)


def build_torch_int_model(model, plan, int_params, cfg=None):
    """nn.Module running the int_op_only graph on int32 NCHW tensors."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    cfg = cfg or model.cfg
    graph = model.graph
    from ..nn.quant_layers import avgpool_shift_for

    _POOL_SHIFT = avgpool_shift_for(getattr(model, "pool_kernel", 7))

    class TorchIntModel(nn.Module):
        def __init__(self):
            super().__init__()
            for p in plan.layers:
                w = np.asarray(int_params[p.name]["w"])
                key = p.name.replace(".", "__")
                if isinstance(graph[p.name], ConvBNSpec):
                    w = np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW
                else:
                    w = np.transpose(w, (1, 0))  # (in,out) -> (out,in)
                self.register_buffer(key + "_w", torch.from_numpy(np.ascontiguousarray(w, np.int32)))
                if "b" in int_params[p.name]:
                    self.register_buffer(
                        key + "_b",
                        torch.from_numpy(np.array(int_params[p.name]["b"], np.int32, copy=True)),
                    )

        def _conv(self, name: str, x, cur_fl: int):
            p = plan[name]
            spec = graph[name]
            x = _requant_torch(torch, x, 8, p.input_fl, cur_fl, p.input_symmetric)
            key = name.replace(".", "__")
            w = getattr(self, key + "_w")
            y = F.conv2d(
                x, w, stride=spec.stride, padding=spec.padding, groups=spec.groups
            )
            y = y + getattr(self, key + "_b").view(1, -1, 1, 1)
            return y, p.out_fl

        def forward(self, x):
            x = x.int()  # accept uint8/int8 wire dtypes
            fl = plan["head"].input_fl
            x, fl = self._conv_head(x, fl)
            x = self._body(x, fl)
            return x

        def _conv_head(self, x, fl):
            # head requant is a no-op clamp (input conditioned to its grid)
            return self._conv("head", x, fl)

        def _body(self, x, fl):
            fam = model.name
            if fam.startswith("resnet"):
                x = torch.relu(x)
                x = F.max_pool2d(x.float(), 3, 2, 1).int()
                for meta in model.blocks:
                    x, fl = self._resnet_block(meta, x, fl)
            elif fam == "mobilenet_v1":
                for meta in model.blocks:
                    x = torch.relu(x)
                    x, fl = self._conv(meta.body[0], x, fl)
                    x = torch.relu(x)
                    x, fl = self._conv(meta.body[1], x, fl)
                x = torch.relu(x)
            else:
                x = torch.relu(x)  # head ReLU (absorbed-equivalent, kept faithful)
                for meta in model.blocks:
                    x, fl = self._mbv2_block(meta, x, fl)
                x, fl = self._conv("tail", x, fl)
                x = torch.relu(x)

            if cfg.quant_avgpool:
                # torch promotes the int32 sum to int64; back to int32 like
                # the reference (fix_quant_ops.py:130-133)
                x = x.sum(dim=(2, 3)).int()
                fl = fl + _POOL_SHIFT
            else:
                m = x.float().mean(dim=(2, 3)) / (2.0**fl)
                p = plan["classifier"]
                s = 2.0**p.input_fl
                q = torch.round(m * s)
                bound = 127.0 if p.input_symmetric else 255.0
                lo = -127.0 if p.input_symmetric else 0.0
                x = torch.clamp(q, lo, bound).int()
                fl = p.input_fl
            p = plan["classifier"]
            x = _requant_torch(torch, x, 8, p.input_fl, fl, p.input_symmetric)
            key = "classifier"
            y = x @ getattr(self, key + "_w").t()
            if hasattr(self, key + "_b"):
                y = y + getattr(self, key + "_b")
            return y.float()

        def _resnet_block(self, meta, x, fl):
            x_in, fl_in = x, fl
            v, vf = x, fl
            for i, cname in enumerate(meta.body):
                if i > 0:
                    v = torch.relu(v)
                v, vf = self._conv(cname, v, vf)
            if meta.shortcut is None:
                s, sf = x_in, fl_in
            else:
                s, sf = self._conv(meta.shortcut, x_in, fl_in)
            v, vf = self._add(v, vf, s, sf)
            return torch.relu(v), vf

        def _mbv2_block(self, meta, x, fl):
            x_in, fl_in = x, fl
            v, vf = x, fl
            for i, cname in enumerate(meta.body):
                if i > 0:
                    v = torch.relu(v)
                v, vf = self._conv(cname, v, vf)
            if meta.residual:
                v, vf = self._add(v, vf, x_in, fl_in)
            return v, vf

        def _add(self, r, rf: int, v, vf: int):
            if rf >= vf:
                v = v << (rf - vf)
                out_fl = rf
            else:
                r = r << (vf - rf)
                out_fl = vf
            s = torch.clamp(r + v, -(2**31 - 1), 2**31 - 1)
            return s, out_fl

    m = TorchIntModel()
    m.eval()
    return m


def condition_input_torch(images_nchw, plan, cfg):
    """float [0,1] NCHW -> int32 engine input (fix_train.py:676-694)."""
    import torch

    if cfg.normalize:
        fl = plan["head"].input_fl
        s = 2.0**fl
        q = torch.round(images_nchw * s)
        q = torch.clamp(q, -127.0, 127.0)
        return q.int()
    return torch.round(255.0 * images_nchw).int()


def export_torchscript(model, plan, int_params, path: str, cfg=None, image_size: int = 224):
    """Trace and save a TorchScript artifact; returns the path."""
    import torch

    cfg = cfg or model.cfg
    m = build_torch_int_model(model, plan, int_params, cfg)
    example = torch.zeros((1, 3, image_size, image_size), dtype=torch.int32)
    with torch.no_grad():
        traced = torch.jit.trace(m, example)
    traced.save(path)
    return path
