"""Static layer specifications and the cross-layer quantization graph.

The reference threads cross-layer coupling through live module pointers
(`set_master_layer` / `set_following_layer`,
/root/reference/models/fix_quant_ops.py:521-531): a layer's folded weights are
divided by the *next* layer's clipping scale, and residual chains share one
PACT alpha through a "master" layer.  In a functional JAX design those
pointers become *names* in an immutable LayerGraph resolved once at model
construction; the forward pass then closes over plain string keys, so
everything stays a static pytree-of-arrays under jit.

Conventions: activations are NHWC, conv weights are HWIO (TPU-native layouts;
the reference's NCHW/OIHW only appear in checkpoint importers).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ConvBNSpec:
    """A fused Conv2d(bias=False)+BatchNorm quantized layer.

    Mirrors the constructor surface of the reference's central module
    (ReLUClipFXQConvBN, fix_quant_ops.py:160-216).
    """

    name: str
    in_ch: int
    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    groups: int = 1
    weight_only: bool = False
    double_side: bool = False
    bita_min: Optional[int] = None
    bitw_min: Optional[int] = None
    master: Optional[str] = None  # layer sharing alpha/input format with us
    following: Optional[str] = None  # next layer (fold divides by its scale)
    avgpool_scale: float = 1.0  # pool-fusing factor folded into weights

    @property
    def is_depthwise(self) -> bool:
        return self.groups > 1 and self.groups == self.in_ch

    def weight_shape(self) -> Tuple[int, int, int, int]:
        kh, kw = self.kernel
        return (kh, kw, self.in_ch // self.groups, self.out_ch)


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    """Quantized fully-connected classifier layer (ReLUClipFXQLinear,
    fix_quant_ops.py:717-758)."""

    name: str
    in_features: int
    out_features: int
    bias: bool = True
    weight_only: bool = False
    double_side: bool = False
    bita_min: Optional[int] = None
    bitw_min: Optional[int] = None
    master: Optional[str] = None
    following: Optional[str] = None  # classifiers have none

    def weight_shape(self) -> Tuple[int, int]:
        return (self.in_features, self.out_features)


LayerSpec = object  # ConvBNSpec | LinearSpec


class LayerGraph:
    """Ordered collection of layer specs with master/following resolution."""

    def __init__(self, specs: Dict[str, LayerSpec]):
        self.specs = dict(specs)

    def __getitem__(self, name: str):
        return self.specs[name]

    def __iter__(self):
        return iter(self.specs.values())

    def names(self):
        return list(self.specs.keys())

    def master_of(self, name: str) -> Optional[str]:
        return self.specs[name].master

    def following_of(self, name: str) -> Optional[str]:
        return self.specs[name].following

    def input_format(self, name: str, cfg) -> Tuple[int, int]:
        """(wl, fl) for the layer's input, honoring bita_min and master
        delegation (fix_quant_ops.py:452-463)."""
        spec = self.specs[name]
        if spec.master is not None:
            return self.input_format(spec.master, cfg)
        wl, fl = cfg.input_format
        if spec.bita_min is not None:
            wl = max(wl, spec.bita_min)
        return (wl, fl)

    def weight_format(self, name: str, cfg) -> Tuple[int, int]:
        spec = self.specs[name]
        wl, fl = cfg.weight_format
        if spec.bitw_min is not None:
            wl = max(wl, spec.bitw_min)
        return (wl, fl)
