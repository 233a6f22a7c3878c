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


class ServingEngine:
    def __init__(
        self,
        engine,
        batch_size: int = 64,
        max_wait_ms: float = 5.0,
        mesh=None,
        name: str = "f8net-serving",
    ):
        self.engine = engine
        self.batch_size = batch_size
        self.max_wait_ms = max_wait_ms
        self.mesh = mesh
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name=name)
        self._started = False
        self.stats = {"batches": 0, "images": 0, "padded": 0}

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
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            try:
                self._dispatch(items)
            except Exception as e:  # route errors to the waiting futures
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _dispatch(self, items):
        arrays = [a for a, _ in items]
        batch = np.concatenate(arrays, axis=0)
        n = batch.shape[0]
        # pad to the fixed device batch (static shape -> single executable);
        # oversized multi-image requests are split across dispatches
        while n > self.batch_size:
            head, batch = batch[: self.batch_size], batch[self.batch_size :]
            n = batch.shape[0]
            self._run_and_route(head, items, full=True)
        pad = self.batch_size - n
        padded = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)]) if pad else batch
        self.stats["padded"] += pad
        self._run_and_route(padded, items, full=False, valid=n)

    _offset_key = "_serving_offset"

    def _run_and_route(self, device_batch, items, full: bool, valid: Optional[int] = None):
        x = jnp.asarray(device_batch)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(x, NamedSharding(self.mesh, P("data")))
        logits = np.asarray(self.engine(x))
        self.stats["batches"] += 1
        self.stats["images"] += valid if valid is not None else device_batch.shape[0]
        # route rows back to futures in arrival order
        row = 0
        for arr, fut in items:
            k = arr.shape[0]
            done_rows = getattr(fut, self._offset_key, 0)
            take = min(k - done_rows, logits.shape[0] - row)
            if take <= 0:
                continue
            part = logits[row : row + take]
            row += take
            prev = getattr(fut, "_serving_parts", [])
            prev.append(part)
            setattr(fut, "_serving_parts", prev)
            setattr(fut, self._offset_key, done_rows + take)
            if done_rows + take == k and not fut.done():
                fut.set_result(np.concatenate(prev, axis=0))
