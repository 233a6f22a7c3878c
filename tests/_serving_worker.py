"""Worker for the 2-process cross-host serving test.

Each process ingests its own requests; the engine is one jitted sharded
computation over the global mesh, so every inference round is a collective
spanning both processes (lockstep dispatch with padding on idle ticks)."""

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
    from f8net_tpu.engine.serve import CrossHostServingEngine
    from f8net_tpu.parallel import make_mesh
    from f8net_tpu.parallel.dist import init_dist

    init_dist(f"127.0.0.1:{port}", nprocs, pid)
    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1)

    def engine(gx):
        return jax.jit(
            lambda v: jnp.stack(
                [jnp.sum(v, axis=(1, 2, 3)), jnp.max(v, axis=(1, 2, 3))], axis=1
            ),
            out_shardings=NamedSharding(mesh, P("data")),
        )(gx)

    srv = CrossHostServingEngine(
        engine, mesh, global_batch=2 * n_dev, tick_ms=20,
        image_shape=(4, 4, 3), image_dtype=np.float32,
    ).start()

    # each host submits its own distinctly-valued requests (value = 10*pid+i)
    def img(v):
        return np.full((4, 4, 3), float(v), np.float32)

    futs = [srv.submit(img(10 * pid + i)) for i in range(6)]
    outs = [f.result(60) for f in futs]
    for i, o in enumerate(outs):
        v = 10 * pid + i
        assert o.shape == (1, 2), o.shape
        np.testing.assert_allclose(o[0, 0], v * 4 * 4 * 3, rtol=1e-6)
        np.testing.assert_allclose(o[0, 1], v, rtol=1e-6)
    # keep ticking until the peer is done too (lockstep), then stop
    import time

    time.sleep(1.0)
    srv.stop()

    # ---- bucket ladder: hosts agree on the round's bucket via the psum of
    # queue depths; low load runs the small executable ----------------------
    srv2 = CrossHostServingEngine(
        engine, mesh, tick_ms=20, buckets=(n_dev, 2 * n_dev, 4 * n_dev),
        image_shape=(4, 4, 3), image_dtype=np.float32,
    ).start()
    # low load: one request on host 0 only -> smallest bucket
    if pid == 0:
        o = srv2.infer(img(5.0), timeout=60)
        np.testing.assert_allclose(o[0, 0], 5.0 * 4 * 4 * 3, rtol=1e-6)
    time.sleep(0.6)
    # one largest-shard request per host: max_host pins the largest bucket
    big = np.stack([img(100 + 10 * pid + i) for i in range(2 * n_dev)])
    out = srv2.infer(big, timeout=60)
    for i in range(2 * n_dev):
        v = 100 + 10 * pid + i
        np.testing.assert_allclose(out[i, 0], v * 4 * 4 * 3, rtol=1e-6)
    time.sleep(1.0)
    srv2.stop()
    hits = srv2.stats["bucket_hits"]
    if pid == 0:
        assert min(hits) == n_dev, hits  # the low-load round ran small
    assert max(hits) == 4 * n_dev, hits  # the big request ran the largest

    # tick-collective overhead (VERDICT r2 item 6): the DCN coordination
    # reduce must be cheap relative to the tick budget
    for s in (srv.stats, srv2.stats):
        assert s["coord_ticks"] > 0, s
        s["coord_ms_per_tick"] = round(1e3 * s["coord_s"] / s["coord_ticks"], 3)
        if s.get("coord_ticks_steady"):
            s["coord_ms_steady"] = round(
                1e3 * s["coord_s_steady"] / s["coord_ticks_steady"], 3
            )

    print(f"serving worker {pid}: ok ({srv.stats} | ladder {srv2.stats})")


if __name__ == "__main__":
    main()
