"""Continuous-batching serving: coalescing, padding, demux, mesh dispatch."""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from f8net_tpu.engine.serve import ServingEngine
from f8net_tpu.parallel import make_mesh


class _EchoEngine:
    """Deterministic fake engine: logits[i] = (sum of image i, batch tag)."""

    def __init__(self):
        self.calls = 0

    def __call__(self, x):
        self.calls += 1
        s = jnp.sum(x, axis=(1, 2, 3), keepdims=False)
        return jnp.stack([s, jnp.full_like(s, self.calls)], axis=1)


def _img(v, hw=8):
    return np.full((hw, hw, 3), v, np.float32)


def test_single_requests_coalesce_and_demux():
    eng = _EchoEngine()
    srv = ServingEngine(eng, batch_size=4, max_wait_ms=50).start()
    futs = [srv.submit(_img(i)) for i in range(4)]
    outs = [f.result(10) for f in futs]
    srv.stop()
    # all four go in one device batch
    assert eng.calls == 1
    for i, o in enumerate(outs):
        assert o.shape == (1, 2)
        np.testing.assert_allclose(o[0, 0], i * 8 * 8 * 3, rtol=1e-6)


def test_padding_partial_batch():
    eng = _EchoEngine()
    srv = ServingEngine(eng, batch_size=8, max_wait_ms=5).start()
    out = srv.infer(_img(2.0))
    srv.stop()
    assert out.shape == (1, 2)
    assert srv.stats["padded"] >= 7  # 1 real + 7 pad


def test_multi_image_request_split_across_batches():
    eng = _EchoEngine()
    srv = ServingEngine(eng, batch_size=4, max_wait_ms=5).start()
    big = np.stack([_img(i) for i in range(10)])  # > 2 device batches
    out = srv.infer(big)
    srv.stop()
    assert out.shape == (10, 2)
    np.testing.assert_allclose(out[:, 0], np.arange(10) * 8 * 8 * 3, rtol=1e-6)


def test_error_routing():
    class Boom:
        def __call__(self, x):
            raise RuntimeError("kernel exploded")

    srv = ServingEngine(Boom(), batch_size=2, max_wait_ms=5).start()
    fut = srv.submit(_img(1.0))
    try:
        fut.result(10)
        assert False, "expected exception"
    except RuntimeError as e:
        assert "kernel exploded" in str(e)
    srv.stop()


def test_mesh_sharded_dispatch():
    mesh = make_mesh(data=8, model=1)
    eng = _EchoEngine()
    srv = ServingEngine(eng, batch_size=8, max_wait_ms=20, mesh=mesh).start()
    futs = [srv.submit(_img(i)) for i in range(8)]
    outs = [f.result(10) for f in futs]
    srv.stop()
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o[0, 0], i * 8 * 8 * 3, rtol=1e-6)


def test_throughput_many_concurrent_clients():
    eng = _EchoEngine()
    srv = ServingEngine(eng, batch_size=16, max_wait_ms=10).start()
    results = {}

    def client(i):
        results[i] = srv.infer(_img(i % 7))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(20)
    srv.stop()
    assert len(results) == 64
    # far fewer device batches than requests (real coalescing)
    assert srv.stats["batches"] <= 24, srv.stats


def test_crosshost_engine_single_process_degenerate():
    """CrossHostServingEngine at process_count == 1: per-host shard == global
    batch; requests coalesce into sharded lockstep rounds on the virtual
    mesh and route back exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f8net_tpu.engine.serve import CrossHostServingEngine

    mesh = make_mesh(data=8, model=1)
    calls = {"n": 0}

    def engine(gx):
        calls["n"] += 1
        return jax.jit(
            lambda v: jnp.stack(
                [jnp.sum(v, axis=(1, 2, 3)), jnp.max(v, axis=(1, 2, 3))], axis=1
            ),
            out_shardings=NamedSharding(mesh, P("data")),
        )(gx)

    srv = CrossHostServingEngine(engine, mesh, global_batch=8, tick_ms=40).start()
    futs = [srv.submit(_img(i)) for i in range(8)]
    outs = [f.result(20) for f in futs]
    srv.stop()
    for i, o in enumerate(outs):
        assert o.shape == (1, 2)
        np.testing.assert_allclose(o[0, 0], i * 8 * 8 * 3, rtol=1e-6)
        np.testing.assert_allclose(o[0, 1], i, rtol=1e-6)
    # multi-image request + padding round
    srv2 = CrossHostServingEngine(engine, mesh, global_batch=8, tick_ms=5).start()
    out = srv2.infer(np.stack([_img(3), _img(5)]))
    srv2.stop()
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[:, 1], [3, 5], rtol=1e-6)
    assert srv2.stats["padded"] >= 6


def test_bucketed_batch_sizes():
    """Low load pads only to the smallest bucket; full load uses the largest."""
    eng = _EchoEngine()
    srv = ServingEngine(eng, max_wait_ms=5, buckets=(2, 4, 16)).start()
    assert srv.batch_size == 16
    out = srv.infer(_img(3.0))  # 1 image -> bucket 2 (1 pad row)
    assert out.shape == (1, 2)
    np.testing.assert_allclose(out[0, 0], 3.0 * 8 * 8 * 3, rtol=1e-6)
    big = np.stack([_img(i) for i in range(7)])  # 7 images -> bucket 16
    out = srv.infer(big)
    srv.stop()
    np.testing.assert_allclose(out[:, 0], np.arange(7) * 8 * 8 * 3, rtol=1e-6)
    hits = srv.stats["bucket_hits"]
    assert hits.get(2) == 1 and hits.get(16) == 1, hits
    assert srv.stats["padded"] == 1 + 9


def test_crosshost_prewarm_buckets():
    """prewarm runs every bucket once before serving (no first-hit compile
    latency mid-traffic); results still route correctly afterwards."""
    from f8net_tpu.engine.serve import CrossHostServingEngine

    eng = _EchoEngine()
    mesh = make_mesh(data=8, model=1)
    srv = CrossHostServingEngine(
        eng, mesh, buckets=(8, 16), tick_ms=5,
        image_shape=(8, 8, 3), image_dtype=np.float32, prewarm=True,
    ).start()
    out = srv.infer(_img(4.0), timeout=30)
    srv.stop()
    assert srv.stats.get("prewarmed") == [8, 16]
    np.testing.assert_allclose(out[0, 0], 4.0 * 8 * 8 * 3, rtol=1e-6)
    # both buckets ran before the first real round
    assert eng.calls >= 3


def test_ring_ingestion_zero_copy_path():
    """Zero-copy ring: contiguous single-image requests dispatch as a slice
    view of the shared ring (no dispatcher copies), results route exactly."""
    eng = _EchoEngine()
    srv = ServingEngine(
        eng, batch_size=4, max_wait_ms=50, ring_capacity=16,
        image_shape=(8, 8, 3), image_dtype=np.float32,
    ).start()
    futs = [srv.submit(_img(i)) for i in range(4)]
    outs = [f.result(10) for f in futs]
    srv.stop()
    assert eng.calls == 1
    assert srv.stats["ring_batches"] == 1
    assert srv.stats["copy_batches"] == 0
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o[0, 0], i * 8 * 8 * 3, rtol=1e-6)


def test_ring_wraparound_many_batches():
    """A small ring forces wrap skips; correctness holds across many cycles
    and slots are recycled (no stall)."""
    eng = _EchoEngine()
    srv = ServingEngine(
        eng, batch_size=4, max_wait_ms=2, ring_capacity=8,
        image_shape=(8, 8, 3), image_dtype=np.float32,
    ).start()
    futs = [srv.submit(_img(i)) for i in range(64)]
    outs = [f.result(20) for f in futs]
    srv.stop()
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o[0, 0], i * 8 * 8 * 3, rtol=1e-6)
    assert srv.stats["ring_batches"] >= 1


def test_ring_fallback_on_shape_mismatch():
    """Requests whose rows don't match the ring go through the copy path,
    mixed with ring traffic, without corrupting routing."""
    eng = _EchoEngine()
    srv = ServingEngine(
        eng, batch_size=4, max_wait_ms=20, ring_capacity=16,
        image_shape=(8, 8, 3), image_dtype=np.float32,
    ).start()
    f1 = srv.submit(_img(1))
    f2 = srv.submit(np.full((4, 4, 3), 2.0, np.float32))  # wrong shape
    o1, o2 = f1.result(10), f2.result(10)
    srv.stop()
    np.testing.assert_allclose(o1[0, 0], 8 * 8 * 3, rtol=1e-6)
    np.testing.assert_allclose(o2[0, 0], 2.0 * 4 * 4 * 3, rtol=1e-6)
    assert srv.stats["copy_batches"] >= 1


def test_ring_concurrent_clients_hammer():
    """Many client threads writing into the ring concurrently: every future
    gets exactly its own logits."""
    eng = _EchoEngine()
    srv = ServingEngine(
        eng, batch_size=8, max_wait_ms=2, ring_capacity=32,
        image_shape=(8, 8, 3), image_dtype=np.float32,
    ).start()
    results = {}
    lock = threading.Lock()

    def client(k):
        out = srv.infer(_img(100 + k), timeout=30)
        with lock:
            results[k] = out

    threads = [threading.Thread(target=client, args=(k,)) for k in range(48)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.stop()
    assert len(results) == 48
    for k, o in results.items():
        np.testing.assert_allclose(o[0, 0], (100 + k) * 8 * 8 * 3, rtol=1e-6)
