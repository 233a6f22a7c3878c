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
