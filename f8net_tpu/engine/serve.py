"""Continuous-batching inference server around the integer engine.

The reference has no serving path (its int model is an offline ONNX export);
the north star asks for continuous image batching across hosts.  Design:

  * requests (single images or small batches) enter a queue;
  * a dispatcher thread coalesces them into fixed-size device batches
    (padding the tail to keep shapes static -- one compiled executable),
    optionally sharding the batch over a Mesh 'data' axis;
  * results are demuxed back to per-request futures.

Throughput scales with the device batch; latency is bounded by
max_wait_ms.  Works with any callable engine (IntEngine, or a bf16 baseline).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class _ImageRing:
    """Shared-memory ingestion ring: clients copy their images directly into
    a preallocated (capacity, H, W, C) buffer at submit time, so the
    dispatcher's hot loop does ZERO per-image copies -- a batch is a
    contiguous slice view of the ring (dispatcher_bench.py measured the
    per-image memcpy as the front-end ceiling, VERDICT r2 item 6).

    Positions are absolute monotonically-increasing integers; slot =
    pos % capacity.  `alloc` never returns a wrapping range (it skips the
    tail slots instead; the skipped positions are reclaimed when the next
    batch frees past them).  A slot is "ready" once its writer finished
    (`ready[slot] == pos`); the dispatcher waits on exactly the rows it
    routes, so stale/garbage pad rows cost nothing.  Slots are freed after
    the batch's logits are routed -- long after jnp.array copied them out.
    """

    def __init__(self, capacity: int, shape, dtype):
        self.R = int(capacity)
        self.buf = np.zeros((self.R,) + tuple(shape), dtype)
        self.ready = np.full(self.R, -1, np.int64)
        self.head = 0  # next abs position to allocate
        self.tail = 0  # abs position before which every slot is free
        self.cond = threading.Condition()
        self.waiters = 0  # notify only when someone actually waits

    def alloc(self, n: int, timeout: float = 10.0) -> Optional[int]:
        """Reserve n contiguous slots; returns the abs start position, or
        None on timeout (caller falls back to the copy path)."""
        assert 0 < n <= self.R
        deadline = time.perf_counter() + timeout
        with self.cond:
            if (self.head % self.R) + n > self.R:
                # skip the wrap tail; those positions are never written and
                # are reclaimed when free() passes them
                self.head += self.R - (self.head % self.R)
            while self.head + n - self.tail > self.R:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    return None
                self.waiters += 1
                try:
                    self.cond.wait(remaining)
                finally:
                    self.waiters -= 1
            start = self.head
            self.head += n
            return start

    def write(self, start: int, images: np.ndarray):
        s = start % self.R
        self.buf[s : s + images.shape[0]] = images
        with self.cond:
            self.ready[s : s + images.shape[0]] = np.arange(
                start, start + images.shape[0]
            )
            if self.waiters:
                self.cond.notify_all()

    def wait_ready(self, start: int, n: int, timeout: float = 10.0) -> bool:
        s = start % self.R
        want = np.arange(start, start + n)
        deadline = time.perf_counter() + timeout
        with self.cond:
            while not (self.ready[s : s + n] == want).all():
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    return False
                self.waiters += 1
                try:
                    self.cond.wait(remaining)
                finally:
                    self.waiters -= 1
        return True

    def view(self, start: int, n: int) -> np.ndarray:
        s = start % self.R
        assert s + n <= self.R
        return self.buf[s : s + n]

    def free_upto(self, pos: int):
        with self.cond:
            if pos > self.tail:
                self.tail = pos
                if self.waiters:
                    self.cond.notify_all()


class _RingRef:
    """Queue payload standing in for images living in the ring."""

    __slots__ = ("ring", "start", "shape")

    def __init__(self, ring: _ImageRing, start: int, n: int):
        self.ring = ring
        self.start = start
        self.shape = (n,) + ring.buf.shape[1:]

    @property
    def end(self) -> int:
        return self.start + self.shape[0]

    def materialize(self) -> np.ndarray:
        return self.ring.view(self.start, self.shape[0])


class ServingEngine:
    def __init__(
        self,
        engine,
        batch_size: Optional[int] = None,
        max_wait_ms: float = 5.0,
        mesh=None,
        buckets=None,
        ring_capacity: int = 0,
        image_shape=None,
        image_dtype=np.uint8,
        name: str = "f8net-serving",
    ):
        """buckets: optional ascending batch-size buckets, e.g. (8, 16, 64).
        The dispatcher pads a tail batch only up to the smallest bucket that
        holds it, so low load runs a small compiled executable (less padding
        waste, lower latency) instead of always paying the full batch.  Each
        bucket is one more compiled program; the largest bucket is the
        device batch size."""
        self.engine = engine
        if buckets:
            buckets = tuple(sorted(set(int(b) for b in buckets)))
            assert batch_size is None or batch_size == buckets[-1], (
                "pass the batch via buckets (largest bucket) or keep them equal"
            )
            batch_size = buckets[-1]
        batch_size = batch_size or 64
        self.buckets = buckets or (batch_size,)
        self.batch_size = batch_size
        if mesh is not None:
            d = dict(mesh.shape)["data"]
            assert all(b % d == 0 for b in self.buckets), (
                "every bucket must shard evenly over the mesh data axis",
                self.buckets, d,
            )
        self.max_wait_ms = max_wait_ms
        self.mesh = mesh
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name=name)
        self._started = False
        # reusable batch buffers, 2 per bucket (round-robin matching the
        # one-deep pipeline): tail rows keep stale data instead of paying a
        # pad memcpy -- their outputs are never routed (dispatcher_bench.py:
        # the pad copy was the dominant front-end cost at low fill)
        self._bufs = {}
        # zero-copy ingestion ring: clients write images straight into the
        # shared buffer at submit time; the dispatcher slices views
        # (ring_capacity in images; >= 4x the batch keeps it off the
        # allocator's critical path)
        self._ring = None
        self._submit_lock = threading.Lock()
        if ring_capacity:
            assert image_shape is not None, "ring ingestion needs image_shape"
            assert ring_capacity >= 2 * batch_size, (ring_capacity, batch_size)
            self._ring = _ImageRing(ring_capacity, image_shape, image_dtype)
        self.stats = {
            "batches": 0, "images": 0, "padded": 0, "bucket_hits": {},
            "ring_batches": 0, "copy_batches": 0,
        }

    # -- public API ---------------------------------------------------------

    def start(self):
        if not self._started:
            self._thread.start()
            self._started = True
        return self

    def stop(self):
        self._stop.set()
        if self._started:
            self._thread.join(timeout=5.0)

    def submit(self, images: np.ndarray) -> Future:
        """images: (H,W,C) or (n,H,W,C) conditioned engine input.  Returns a
        Future resolving to the logits for those images."""
        if images.ndim == 3:
            images = images[None]
        fut: Future = Future()
        ring = self._ring
        if (
            ring is not None
            and images.shape[1:] == ring.buf.shape[1:]
            and images.dtype == ring.buf.dtype
            and images.shape[0] <= self.batch_size
        ):
            # alloc + enqueue under one lock so queue order matches slot
            # order (contiguous slices stay the common case); the copy runs
            # in the CLIENT thread, off the dispatcher's critical path
            with self._submit_lock:
                start = ring.alloc(images.shape[0], timeout=0.0)
                if start is not None:
                    self._q.put((_RingRef(ring, start, images.shape[0]), fut))
            if start is not None:
                ring.write(start, images)
                return fut
            # ring full right now: block for space OUTSIDE the order lock
            # (order breaks -> the dispatcher's contiguity check catches it)
            start = ring.alloc(images.shape[0], timeout=5.0)
            if start is not None:
                self._q.put((_RingRef(ring, start, images.shape[0]), fut))
                ring.write(start, images)
                return fut
        self._q.put((images, fut))
        return fut

    def infer(self, images: np.ndarray, timeout: Optional[float] = 60.0):
        return self.submit(images).result(timeout)

    # -- dispatcher ---------------------------------------------------------

    def _collect(self) -> List[Tuple[np.ndarray, Future]]:
        """Block for the first request, then fill the batch within the
        latency budget."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        n = first[0].shape[0]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while n < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            items.append(item)
            n += item[0].shape[0]
        return items

    def _loop(self):
        """One-deep pipeline: while batch k's results are fetched (the only
        blocking step), batch k+1 is already collected, transferred, and
        enqueued on the device -- JAX dispatch is asynchronous, so the
        device computes k+1 during the host-side routing of k."""
        pending = []  # list of (device_logits, items, valid)
        while not self._stop.is_set():
            items = self._collect()
            launched = []
            if items:
                try:
                    launched = self._launch(items)
                except Exception as e:  # route errors to the waiting futures
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)
            for logits_dev, its, valid, free_pos in pending:
                try:
                    self._route(np.asarray(logits_dev), its, valid)
                except Exception as e:
                    for _, fut in its:
                        if not fut.done():
                            fut.set_exception(e)
                finally:
                    if free_pos is not None:
                        self._ring.free_upto(free_pos)
            pending = launched
        for logits_dev, its, valid, free_pos in pending:  # drain on shutdown
            try:
                self._route(np.asarray(logits_dev), its, valid)
            except Exception:
                pass
            finally:
                if free_pos is not None:
                    self._ring.free_upto(free_pos)

    def _launch(self, items):
        """Enqueue device work for the collected requests; non-blocking.

        Zero-copy fast path: when every collected item lives in the
        ingestion ring in one contiguous slot run and the padded bucket fits
        before the ring's wrap point, the device batch is a SLICE VIEW of
        the ring -- the dispatcher performs no per-image copies at all
        (pad rows are whatever the ring holds; never routed)."""
        ring = self._ring
        free_pos = None
        if ring is not None:
            ring_items = [a for a, _ in items if isinstance(a, _RingRef)]
            if ring_items:
                free_pos = max(r.end for r in ring_items)
            n = sum(a.shape[0] for a, _ in items)
            if (
                len(ring_items) == len(items)
                and n <= self.batch_size
                and all(
                    items[i + 1][0].start == items[i][0].end
                    for i in range(len(items) - 1)
                )
            ):
                start = items[0][0].start
                bucket = next(b for b in self.buckets if b >= n)
                if (start % ring.R) + bucket <= ring.R:
                    ok = ring.wait_ready(start, n)
                    if ok:
                        self.stats["padded"] += bucket - n
                        self.stats["bucket_hits"][bucket] = (
                            self.stats["bucket_hits"].get(bucket, 0) + 1
                        )
                        self.stats["ring_batches"] += 1
                        return [
                            (self._run(ring.view(start, bucket)), items, n, free_pos)
                        ]
            # slow path below: materialize ring views into the copy path
            # (each ref waits for its writer first -- a view of unwritten
            # slots would read garbage)
            for a, _ in items:
                if isinstance(a, _RingRef) and not ring.wait_ready(
                    a.start, a.shape[0]
                ):
                    raise TimeoutError("ring writer never completed")
            items = [
                (np.asarray(a.materialize()) if isinstance(a, _RingRef) else a, f)
                for a, f in items
            ]
        # a collected set may mix row shapes (e.g. ring traffic plus an
        # odd-shaped request): launch one copy-path batch per shape group
        shapes = {a.shape[1:] for a, _ in items}
        if len(shapes) > 1:
            out = []
            for shp in shapes:
                grp = [(a, f) for a, f in items if a.shape[1:] == shp]
                out.extend(self._launch_copy(grp, free_pos))
                free_pos = None  # attach the ring free point once
            return out
        return self._launch_copy(items, free_pos)

    def _launch_copy(self, items, free_pos):
        self.stats["copy_batches"] += 1
        arrays = [a for a, _ in items]
        batch = np.concatenate(arrays, axis=0)
        n = batch.shape[0]
        out = []
        # oversized multi-image requests split across full device batches
        while n > self.batch_size:
            head, batch = batch[: self.batch_size], batch[self.batch_size :]
            n = batch.shape[0]
            out.append((self._run(head), items, None, None))
        # pad the tail only to the smallest bucket that holds it: low load
        # dispatches a small compiled program instead of the full batch
        bucket = next(b for b in self.buckets if b >= n)
        pad = bucket - n
        if pad:
            key = (bucket,) + tuple(batch.shape[1:]) + (batch.dtype.str,)
            ring = self._bufs.setdefault(
                key,
                [np.zeros((bucket,) + batch.shape[1:], batch.dtype) for _ in range(2)],
            )
            ring.append(buf := ring.pop(0))
            buf[:n] = batch  # stale tail rows are never routed
            padded = buf
        else:
            padded = batch
        self.stats["padded"] += pad
        self.stats["bucket_hits"][bucket] = self.stats["bucket_hits"].get(bucket, 0) + 1
        out.append((self._run(padded), items, n, free_pos))
        return out

    def _run(self, device_batch):
        # jnp.array (copy=True contract): the reusable host buffer must never
        # be aliased by the device array (we overwrite it two batches later)
        x = jnp.array(device_batch)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(x, NamedSharding(self.mesh, P("data")))
        return self.engine(x)  # async dispatch; np.asarray blocks later

    _offset_key = "_serving_offset"

    def _route(self, logits, items, valid: Optional[int] = None):
        return _route_rows(self.stats, logits, items, valid)


def _route_rows(stats, logits, items, valid: Optional[int] = None):
    stats["batches"] += 1
    stats["images"] += valid if valid is not None else logits.shape[0]
    # route rows back to futures in arrival order
    row = 0
    for arr, fut in items:
        k = arr.shape[0]
        done_rows = getattr(fut, "_serving_offset", 0)
        take = min(k - done_rows, logits.shape[0] - row)
        if take <= 0:
            continue
        part = logits[row : row + take]
        row += take
        prev = getattr(fut, "_serving_parts", [])
        prev.append(part)
        setattr(fut, "_serving_parts", prev)
        setattr(fut, "_serving_offset", done_rows + take)
        if done_rows + take == k and not fut.done():
            fut.set_result(np.concatenate(prev, axis=0))


class CrossHostServingEngine:
    """Cross-host continuous batching over a multi-process mesh (the
    north-star serving story, SURVEY.md section 5).

    Each process (host) runs its own ingestion queue and front-end; the model
    executes as ONE jitted computation over a global mesh spanning every
    host's devices, so dispatch must be collective.  The dispatcher therefore
    runs in lockstep rounds: every `tick_ms`, each host coalesces up to
    `global_batch / process_count` locally-ingested images, pads to that
    static per-host shard, assembles the global batch with
    `jax.make_array_from_process_local_data` (its shard lands on its own
    devices -- ingestion traffic never crosses hosts), and all hosts enter
    the same jitted call together.  Idle hosts contribute padding rows, which
    keeps the round collective without any cross-host control traffic; the
    only host-to-host bytes are XLA's own collectives inside the model.
    Each host routes exactly its local shard's logits back to its futures.

    Degenerates to single-host continuous batching at process_count == 1
    (tested on the virtual 8-device mesh); the 2-process loopback test
    drives the real multi-process lockstep (tests/test_serving_multihost.py).
    """

    def __init__(
        self,
        engine,
        mesh,
        global_batch: Optional[int] = None,
        tick_ms: float = 5.0,
        image_shape=None,
        image_dtype=np.uint8,
        buckets=None,
        prewarm: bool = False,
        name: str = "f8net-xhost-serving",
    ):
        """buckets: optional ascending GLOBAL batch-size ladder (each
        divisible by process_count and by the mesh data axis).  Every round
        the hosts agree on one bucket via a tiny collective (the psum of
        per-host queue depths -- the DCN coordination layer): the smallest
        bucket holding the global demand runs, so idle/low-load ticks cost
        the smallest executable instead of the full batch.  Lockstep is
        preserved: the coordination sum and the chosen bucket are identical
        on every host by construction."""
        nproc = jax.process_count()
        if buckets:
            buckets = tuple(sorted(set(int(b) for b in buckets)))
            assert global_batch is None or global_batch == buckets[-1]
            global_batch = buckets[-1]
        global_batch = global_batch or 64
        self.buckets = buckets or (global_batch,)
        assert all(b % nproc == 0 for b in self.buckets), (self.buckets, nproc)
        d = dict(mesh.shape)["data"]
        assert all(b % d == 0 for b in self.buckets), (self.buckets, d)
        assert global_batch % nproc == 0, (global_batch, nproc)
        # Lockstep invariant: every process must dispatch the same sequence
        # of collective rounds.  A host that has never seen a request cannot
        # infer the row shape, so multi-process deployments must declare it.
        assert nproc == 1 or image_shape is not None, (
            "multi-process serving requires image_shape up front"
        )
        self.image_shape = tuple(image_shape) if image_shape is not None else None
        self.image_dtype = image_dtype
        self.engine = engine
        self.mesh = mesh
        self.global_batch = global_batch
        self.per_host = global_batch // nproc
        self.tick_ms = tick_ms
        # prewarm: compile/run every bucket once with padding before serving
        # (needs image_shape) so a load spike never pays first-hit compile
        # latency; collective-safe -- every host prewarms the same sequence
        self.prewarm = prewarm
        assert not prewarm or image_shape is not None, (
            "prewarm requires image_shape"
        )
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name=name)
        self._started = False
        self.stats = {
            "batches": 0, "images": 0, "padded": 0, "idle_rounds": 0,
            "bucket_hits": {}, "coord_ticks": 0, "coord_s": 0.0,
        }

    def start(self):
        if not self._started:
            self._thread.start()
            self._started = True
        return self

    def stop(self):
        self._stop.set()
        if self._started:
            self._thread.join(timeout=10.0)

    def submit(self, images: np.ndarray) -> Future:
        if images.ndim == 3:
            images = images[None]
        assert images.shape[0] <= self.per_host, "request exceeds per-host shard"
        if self.image_shape is not None:
            assert tuple(images.shape[1:]) == self.image_shape, (
                "row shape must match the declared image_shape (one compiled "
                "executable keeps the cross-host rounds collective)"
            )
        fut: Future = Future()
        self._q.put((images, fut))
        return fut

    def infer(self, images: np.ndarray, timeout: Optional[float] = 60.0):
        return self.submit(images).result(timeout)

    def _collect(self):
        items, n = [], 0
        deadline = time.perf_counter() + self.tick_ms / 1e3
        while n < self.per_host:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if n + item[0].shape[0] > self.per_host:
                # keep shapes static: defer to the next round
                self._q.put(item)
                break
            items.append(item)
            n += item[0].shape[0]
        return items, n

    def _coord_fns(self):
        """The DCN coordination collective: a tiny sharded reduce of
        per-host (queue depth, stop flag) rows.  Every host computes the
        same (total, max_per_host, all_stopped), so bucket choice AND
        shutdown are lockstep -- a host that called stop() keeps ticking
        padding rounds until every peer has also requested stop, which
        keeps the collectives matched (no one-sided program at teardown)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        csh = NamedSharding(self.mesh, P("data", None))
        repl = NamedSharding(self.mesh, P())
        ndev_local = len(jax.local_devices())
        nproc = jax.process_count()
        reduce_fn = jax.jit(
            lambda v: (jnp.sum(v, axis=0), jnp.max(v[:, 0])),
            out_shardings=(repl, repl),
        )

        def coord(n_local: int, stopping: bool):
            row = np.tile(
                np.asarray([[n_local, int(stopping)]], np.int32), (ndev_local, 1)
            )
            garr = jax.make_array_from_process_local_data(csh, row)
            s, m = reduce_fn(garr)
            s = np.asarray(s)
            total = int(s[0]) // ndev_local
            stops = int(s[1]) // ndev_local
            return total, int(m), stops == nproc

        return coord

    def _pick_bucket(self, total: int, max_host: int, nproc: int) -> int:
        for b in self.buckets:
            if b >= total and b // nproc >= max_host:
                return b
        return self.buckets[-1]

    def _loop(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(self.mesh, P("data"))
        shape = self.image_shape
        dtype = self.image_dtype
        nproc = jax.process_count()
        # multi-process always coordinates (bucket agreement + collective
        # shutdown); single-process skips the collective entirely
        coord = self._coord_fns() if (nproc > 1 or len(self.buckets) > 1) else None
        if self.prewarm:
            for b in self.buckets:
                z = np.zeros((b // nproc,) + tuple(shape), dtype)
                jax.block_until_ready(
                    self.engine(jax.make_array_from_process_local_data(bsh, z))
                )
            self.stats["prewarmed"] = list(self.buckets)
        pending = []  # (logits_dev, items, valid) one-deep pipeline
        while True:
            stopping = self._stop.is_set()
            if stopping and (nproc == 1 or coord is None):
                break
            items, n = ([], 0) if stopping else self._collect()
            launched = []
            if shape is None and not items:
                # single-process mode may lazily learn the shape from the
                # first request; skip empty rounds until then
                self._drain(pending)
                pending = []
                continue
            if items:
                shape = items[0][0].shape[1:]
                dtype = items[0][0].dtype
            if coord is not None:
                # bucket ladder + shutdown agreement: the smallest executable
                # that holds the global demand (max_host bounds per-host
                # shards, so no host ever defers items it already collected)
                t0 = time.perf_counter()
                total, max_host, all_stopped = coord(n, stopping)
                dt = time.perf_counter() - t0
                self.stats["coord_s"] += dt
                self.stats["coord_ticks"] += 1
                # steady-state view: the first ticks pay the reduce_fn jit
                if self.stats["coord_ticks"] > 3:
                    self.stats["coord_s_steady"] = (
                        self.stats.get("coord_s_steady", 0.0) + dt
                    )
                    self.stats["coord_ticks_steady"] = (
                        self.stats.get("coord_ticks_steady", 0) + 1
                    )
                if all_stopped:
                    break
                bucket = self._pick_bucket(total, max_host, nproc)
            else:
                bucket = self.buckets[-1]
            per = bucket // nproc
            local = np.zeros((per,) + tuple(shape), dtype)
            row = 0
            for arr, _ in items:
                local[row : row + arr.shape[0]] = arr
                row += arr.shape[0]
            self.stats["padded"] += per - n
            if not items:
                self.stats["idle_rounds"] += 1
            else:
                self.stats["bucket_hits"][bucket] = (
                    self.stats["bucket_hits"].get(bucket, 0) + 1
                )
            try:
                gx = jax.make_array_from_process_local_data(bsh, local)
                logits = self.engine(gx)  # collective across hosts
                launched = [(logits, items, n)] if items else []
            except Exception as e:
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
            self._drain(pending)
            pending = launched
        self._drain(pending)

    def _drain(self, pending):
        for logits_dev, its, valid in pending:
            try:
                local = _local_rows(logits_dev)
                _route_rows(self.stats, local, its, valid)
            except Exception as e:
                for _, fut in its:
                    if not fut.done():
                        fut.set_exception(e)


def _local_rows(garr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in batch order."""
    shards = sorted(garr.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
