"""Device mesh and sharding layout.

The reference's only parallelism is NCCL data-parallel with an explicit
post-backward gradient all-reduce (myutils/distributed.py:90-164).  The
TPU-native equivalent is declarative: one Mesh('data','model') spans the
slice, the batch is sharded over 'data' (hosts/DCN), conv out-channels and the
classifier over 'model' (ICI), and XLA GSPMD inserts the all-reduce /
all-gather / reduce-scatter collectives -- there is no hand-written gradient
sync to port.

Multi-host entry: call jax.distributed.initialize() once per host before
building the mesh (the analog of init_dist, distributed.py:16-26).
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.spec import ConvBNSpec


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Mesh over all (or given) devices; data=-1 means 'the rest'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model == n, (data, model, n)
    # Auto axis types: let GSPMD propagate shardings and insert collectives
    # (explicit-sharding mode would demand out_sharding on every conv).
    auto = (jax.sharding.AxisType.Auto,) * 2
    return jax.make_mesh(
        (data, model), ("data", "model"), devices=devices, axis_types=auto
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def _tp_spec_for(spec, pname: str, shape, model_axis_size: int):
    """Tensor-parallel spec: conv HWIO and linear (in,out) weights shard the
    out-channel (last) axis over 'model'; BN/bias vectors follow their channel
    axis; scalars replicate."""
    if len(shape) == 0:
        return P()
    out_ch = shape[-1]
    if out_ch % model_axis_size != 0:
        return P()
    if pname in ("w",):
        return P(*([None] * (len(shape) - 1) + ["model"]))
    if pname in ("gamma", "beta", "bias", "b", "bn_mean", "bn_var"):
        return P("model")
    return P()


def param_shardings(graph, params, mesh: Mesh, tensor_parallel: bool = False):
    """NamedSharding pytree for QAT params: replicated for pure DP, or
    out-channel sharded over 'model' when tensor_parallel."""
    msize = mesh.shape["model"]

    def one(lname, pname, leaf):
        if not tensor_parallel or msize == 1:
            return NamedSharding(mesh, P())
        spec = graph[lname]
        if isinstance(spec, ConvBNSpec) and spec.is_depthwise:
            return NamedSharding(mesh, P())  # depthwise: keep whole on-chip
        return NamedSharding(
            mesh, _tp_spec_for(spec, pname, np.shape(leaf), msize)
        )

    return {
        lname: {pname: one(lname, pname, leaf) for pname, leaf in sub.items()}
        for lname, sub in params.items()
    }


def int_param_shardings(graph, int_params, mesh: Mesh, tensor_parallel: bool = True):
    """Shardings for the integer engine's {w:int8, b:int32} pytree."""
    return param_shardings(graph, int_params, mesh, tensor_parallel)
