"""SGD with momentum/nesterov and F8Net's per-parameter weight-decay schemes.

The reference builds one param-group per tensor with a decay chosen by tensor
rank (depthwise convs detected by a singleton input-channel dim, BN/1-D params
by rank) -- fix_train.py:519-572.  Here the same classification happens once
over the pytree structure, producing a static decay mask.

Update rule matches torch.optim.SGD (dampening 0):
    g   <- g + wd * p
    buf <- mu * buf + g
    d   <- g + mu * buf   (nesterov)   |   buf   (plain momentum)
    p   <- p - lr * d
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..nn.spec import ConvBNSpec


class SGDState(NamedTuple):
    momentum: Any  # pytree of buffers matching params


def weight_decay_mask(graph, params, scheme: str, weight_decay: float):
    """Per-leaf weight decay honoring the reference's four schemes
    (all / only_no_depthwise / only_no_bn / no_depthwise_no_bn).

    Rank mapping to the reference's tensors: conv w -> 4D (depthwise iff the
    layer is grouped), linear w -> 2D, BN gamma/beta and biases -> 1D, PACT
    alpha -> 0D.
    """

    def decay_for(lname: str, pname: str, leaf) -> float:
        ndim = jnp.ndim(leaf)
        spec = graph[lname]
        depthwise = (
            isinstance(spec, ConvBNSpec) and spec.groups > 1 and pname == "w"
        )
        if scheme == "all":
            return weight_decay
        if scheme == "only_no_depthwise":
            if ndim == 4 and not depthwise:
                return weight_decay
            if ndim in (1, 2):
                return weight_decay
            return 0.0
        if scheme == "only_no_bn":
            return weight_decay if ndim in (2, 4) else 0.0
        if scheme == "no_depthwise_no_bn":
            if ndim == 4 and not depthwise:
                return weight_decay
            if ndim == 2:
                return weight_decay
            return 0.0
        raise NotImplementedError(scheme)

    return {
        lname: {pname: decay_for(lname, pname, leaf) for pname, leaf in sub.items()}
        for lname, sub in params.items()
    }


def sgd_init(params) -> SGDState:
    return SGDState(momentum=jax.tree_util.tree_map(jnp.zeros_like, params))


def sgd_update(
    params,
    grads,
    state: SGDState,
    lr,
    decay_mask,
    momentum: float = 0.9,
    nesterov: bool = True,
):
    def upd(p, g, buf, wd):
        g = g + wd * p
        buf = momentum * buf + g
        d = g + momentum * buf if nesterov else buf
        return p - lr * d, buf

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_b = jax.tree_util.tree_leaves(state.momentum)
    flat_w = jax.tree_util.tree_leaves(decay_mask)
    new_p, new_b = [], []
    for p, g, b, wd in zip(flat_p, flat_g, flat_b, flat_w):
        np_, nb = upd(p, g, b, wd)
        new_p.append(np_)
        new_b.append(nb)
    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        SGDState(momentum=jax.tree_util.tree_unflatten(treedef, new_b)),
    )
