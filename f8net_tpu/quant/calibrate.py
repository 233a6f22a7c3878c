"""BN calibration helpers (the reference's bn_calib phase,
fix_quant_ops.py:8-14 + fix_train.py:1044-1074): reset running statistics,
then run 'calib'-mode epochs which use cumulative (momentum=None) averaging.
"""

from __future__ import annotations

import jax.numpy as jnp


def reset_bn_for_calib(state):
    """Zero the BN running stats and the cumulative batch counter."""
    out = {}
    for lname, st in state.items():
        d = dict(st)
        if "bn_mean" in d:
            d["bn_mean"] = jnp.zeros_like(d["bn_mean"])
            d["bn_var"] = jnp.ones_like(d["bn_var"])
            d["bn_count"] = jnp.zeros_like(d["bn_count"])
        out[lname] = d
    return out
