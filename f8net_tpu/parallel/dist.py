"""Multi-host runtime helpers.

The analog of the reference's myutils/distributed.py: process-group init,
master-only gating, and metric reduction -- expressed TPU-natively.
Gradient synchronization needs no code here at all: the jitted train step
over a Mesh('data') emits the all-reduce (GSPMD), replacing the explicit
post-backward allreduce_grads (distributed.py:90-122).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def init_dist(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Per-host initialization (init_dist analog, distributed.py:16-26).
    With no arguments, uses the TPU environment's auto-detection; call once
    before any jax computation on every host."""
    if jax.distributed.is_initialized():
        # the distributed runtime is already up (e.g. TPU pod auto-init, or a
        # second init_dist call); re-initializing raises in jax.  NOTE: the
        # check must not touch the backend -- jax.process_count() would
        # initialize XLA and make a subsequent initialize() impossible.
        return jax.process_index()
    if coordinator_address is None:
        # single-process / auto mode: nothing to set up
        return jax.process_index()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def master_only(fn):
    """Run only on process 0 (distributed.py:45-64)."""

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        if is_master():
            return fn(*a, **kw)
        return None

    return wrapped


master_only_print = master_only(print)


def all_reduce_metrics(metrics: dict, reduction: str = "mean") -> dict:
    """Reduce host-local scalar metrics across processes (the analog of
    dist_all_reduce_tensor, distributed.py:79-87; mean like the reference by
    default).  Under a jitted step over a global mesh this is unnecessary --
    reductions already span all devices -- but per-host accumulators (e.g.
    data-loader counts) need it."""
    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    out = {}
    for k, v in metrics.items():
        g = multihost_utils.process_allgather(jnp.asarray(v))
        s = jnp.sum(g, axis=0)
        out[k] = s / jax.process_count() if reduction == "mean" else s
    return out
