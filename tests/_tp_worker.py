"""Worker for the 2-process tensor-parallel engine test.

The model axis spans two OS processes (2 procs x 2 devices = model=4), so
every psum in the explicit-collective TP engine (engine/tp_engine.py)
crosses a process boundary -- the loopback analog of TP over DCN.  Each
process bakes the same deterministic plan from init state, runs the
Megatron-paired engine over the global mesh, and asserts bitwise equality
with its local single-device engine."""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nprocs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from f8net_tpu.engine import IntEngine
    from f8net_tpu.engine.tp_engine import int_forward_tp, tp_modes, tp_param_specs
    from f8net_tpu.models import get_model
    from f8net_tpu.parallel import make_mesh
    from f8net_tpu.parallel.dist import init_dist
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    init_dist(f"127.0.0.1:{port}", nprocs, pid)
    n_dev = len(jax.devices())
    mesh = make_mesh(data=1, model=n_dev)

    cfg = QuantConfig(
        format_from_metric=True, metric="std", quant_bias=True,
        quant_avgpool=True, pool_fusing=True,
    )
    # bake from init state: fully deterministic across processes (no float
    # training noise near quantization thresholds)
    model = get_model("mobilenet_v2", cfg, num_classes=16, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    plan, ip = bake_plan(model, params, state)

    eng = IntEngine(model, plan, ip)
    x = jnp.round(
        255 * jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ) / 256
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi))

    # place the global arrays: every process holds the full host copy and
    # contributes its addressable shards
    specs = tp_param_specs(model, tp_modes(model))

    def put(a, spec):
        a = np.asarray(a)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sh, lambda idx, a=a: a[idx])

    ipg = {
        name: {
            "w": put(entry["w"], specs[name]["w"]),
            "b": put(entry["b"], specs[name]["b"]),
        }
        for name, entry in ip.items()
    }
    xg = put(np.asarray(xi), P("data"))

    # bounds from the process-LOCAL baked params (the global arrays' shards
    # span processes, so they cannot be read back on any single host)
    from f8net_tpu.engine.tp_engine import tp_requant_bounds

    bounds = tp_requant_bounds(model, plan, ip)
    out = int_forward_tp(model, plan, ipg, xg, mesh, cfg, requant_bounds=bounds)
    local = np.asarray(out.addressable_shards[0].data)
    assert local.shape == ref.shape, (local.shape, ref.shape)
    np.testing.assert_array_equal(local, ref)
    print(f"tp worker {pid}: ok (psums spanned {nprocs} processes, "
          f"logits bit-equal)")


if __name__ == "__main__":
    main()
