"""Checkpoint save/resume.

Same contract as the reference (fix_train.py:994-1034, 1110-1127):
`latest_checkpoint` holds model params+state, optimizer buffers, last epoch,
best val error and meters; `best_model` holds the model only; auto-resume
restores scheduler position from the stored epoch.  Format is a single .npz
(flattened '/'-joined keys) plus a JSON sidecar -- dependency-free and
portable across hosts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(prefix: str, tree, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}" if prefix else k, v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return root


def save_checkpoint(path: str, trees: Dict[str, Any], meta: Optional[dict] = None):
    """trees: named pytrees, e.g. {'params': ..., 'state': ..., 'opt': ...}."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        _flatten(name, jax.device_get(tree), flat)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")
    final = path if path.endswith(".npz") else path + ".npz"
    with open(final + ".json", "w") as f:
        json.dump(meta or {}, f)
    return final


class AsyncCheckpointer:
    """Non-blocking checkpoint writes (the TPU-idiomatic upgrade over the
    reference's synchronous `torch.save`, fix_train.py:1120-1127).

    `save()` fetches device arrays to host (cheap, overlapped with XLA's
    async dispatch) and hands serialization + atomic rename to a worker
    thread, so the train loop never stalls on disk.  A new save for the
    same path supersedes any queued-but-unstarted one.  `wait()` blocks
    until all pending writes are durable (call before exit / eval-of-file).
    """

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._pending: Dict[str, int] = {}
        self._lock = threading.Lock()
        self._err: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            path, flat, meta, ticket = item
            try:
                with self._lock:
                    stale = self._pending.get(path, 0) > ticket
                if not stale:
                    tmp = path + ".tmp.npz"
                    np.savez(tmp, **flat)
                    os.replace(tmp, path)
                    with open(path + ".json", "w") as f:
                        json.dump(meta, f)
            except BaseException as e:  # surfaced on next save()/wait()
                with self._lock:
                    self._err = e
            finally:
                self._q.task_done()

    def save(self, path: str, trees: Dict[str, Any], meta: Optional[dict] = None) -> str:
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        if not path.endswith(".npz"):
            path = path + ".npz"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat: Dict[str, np.ndarray] = {}
        for name, tree in trees.items():
            _flatten(name, jax.device_get(tree), flat)
        with self._lock:
            ticket = self._pending.get(path, 0) + 1
            self._pending[path] = ticket
        self._q.put((path, flat, meta or {}, ticket))
        return path

    def wait(self):
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self):
        self.wait()
        self._q.put(None)
        self._worker.join()


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], dict]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return _unflatten(flat), meta
