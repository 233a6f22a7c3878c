"""Model container: a static layer graph plus pure init/forward functions."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import jax

from ..nn.spec import ConvBNSpec, LayerGraph, LinearSpec
from ..nn.quant_layers import (
    init_conv_params,
    init_conv_state,
    init_linear_params,
    init_linear_state,
)


@dataclasses.dataclass
class Model:
    """A built model: immutable graph + forward closure.

    forward(params, state, x, mode='eval', cfg=None) -> (logits, new_state)
      mode in {'train','eval','calib'}; cfg defaults to the build config and
      may be overridden per call (e.g. toggling int_infer for the
      cross-checking eval modes) as long as the structural knobs (normalize,
      format_type, pool_fusing) match the build.
    """

    name: str
    graph: LayerGraph
    cfg: Any
    forward: Callable
    block_setting: Any
    conv_order: List[str]  # layer names in the reference's named_modules order
    num_classes: int = 1000
    blocks: Any = None  # per-block metadata (body conv names, shortcut)
    pool_fuse_layer: Optional[str] = None  # conv that absorbs 2^s/k^2 at int conversion
    pool_kernel: int = 7  # global-avgpool extent (image_size // 32)

    def init(self, rng):
        """Init params/state pytrees with the reference's reset_parameters
        distributions (fix_resnet.py:509-524)."""
        params, state = {}, {}
        names = self.graph.names()
        keys = jax.random.split(rng, len(names))
        for key, lname in zip(keys, names):
            spec = self.graph[lname]
            if isinstance(spec, ConvBNSpec):
                params[lname] = init_conv_params(key, spec)
                state[lname] = init_conv_state(self.cfg, spec)
            elif isinstance(spec, LinearSpec):
                params[lname] = init_linear_params(key, spec)
                state[lname] = init_linear_state(self.cfg, spec)
        return params, state

    def apply(self, params, state, x, mode: str = "eval", cfg=None):
        return self.forward(params, state, x, mode, cfg or self.cfg)
