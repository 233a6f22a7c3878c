"""Forward-pass runner: threads mutable-buffer updates through a model.

The reference mutates module buffers in place as the forward walks the network
(EMA fraclens, BN running stats).  Functionally, each layer application
returns an updates dict; the Runner overlays them onto its state view so later
layers observe earlier layers' intra-batch updates (e.g. a residual chain's
master EMA), and `finalize()` yields the new state pytree.
"""

from __future__ import annotations

from typing import Dict

import jax

from .quant_layers import Act, as_act, conv_bn_apply, linear_apply


class Runner:
    def __init__(self, graph, cfg, params, state, mode: str = "eval"):
        self.graph = graph
        self.cfg = cfg
        self.params = params
        self.mode = mode
        self.state = {k: dict(v) for k, v in state.items()}

    def _merge(self, updates: Dict[str, Dict]):
        for lname, upd in updates.items():
            d = dict(self.state[lname])
            d.update(upd)
            self.state[lname] = d

    def conv(self, name: str, act) -> Act:
        y, upd = conv_bn_apply(
            self.graph, self.cfg, name, self.params, self.state, act, self.mode
        )
        self._merge(upd)
        return y

    def linear(self, name: str, act) -> Act:
        y, upd = linear_apply(
            self.graph, self.cfg, name, self.params, self.state, act, self.mode
        )
        self._merge(upd)
        return y

    def relu(self, act) -> Act:
        a = as_act(act)
        return Act(jax.nn.relu(a.x), a.fl)

    def boundary_quant(self, name: str, act) -> Act:
        """Deployment-aware QAT boundary (cfg.qat_boundary == 'int8'):
        quantize a residual-block input onto conv `name`'s 8-bit input grid
        with STE -- the int8-boundary engine's 1-byte carry semantics
        simulated during training, so QAT adapts to the deployment rung.
        Uses the conv's own fraclen rule (live metric in training, rounded
        EMA at eval) but discards the EMA update: the conv itself performs
        it when it consumes this tensor."""
        from .quant_layers import _quantize_input

        a = as_act(act)
        x_val, _fl, _upd = _quantize_input(
            self.graph, self.cfg, name, self.state, a.x,
            self.mode in ("train", "calib"),
        )
        return Act(x_val, None)

    @property
    def int_sim(self) -> bool:
        """Integer-simulation eval (the reference's int_infer flag gating
        fraclen-aligned residual adds, fix_resnet.py:158-186)."""
        return self.cfg.int_infer and self.mode == "eval"

    def finalize(self):
        return self.state
