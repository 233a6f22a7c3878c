"""Timing + MXU speed-of-light accounting.

The reference's only profiling is a wall-time decorator (fix_train.py:41-53).
Here: steady-state timers and per-model FLOP accounting so kernel efficiency
can be reported as a fraction of the chip's int8/bf16 peak (the north-star's
speed-of-light hooks).
"""

from __future__ import annotations

import time
from typing import Dict

import jax

# published dense peaks per chip (approximate, for SoL fractions)
PEAK_TOPS = {
    ("tpu v5 lite", "int8"): 394.0,  # v5e
    ("tpu v5 lite", "bf16"): 197.0,
    ("tpu v5", "int8"): 918.0,  # v5p
    ("tpu v5", "bf16"): 459.0,
    ("cpu", "int8"): 1.0,
    ("cpu", "bf16"): 1.0,
}


def chip_kind() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", d.platform).lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "tpu v5 lite"
    if "v5" in kind:
        return "tpu v5"
    return d.platform


def steady_state_time(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv_flops(spec, h_out: int, w_out: int, batch: int) -> float:
    kh, kw = spec.kernel
    return 2.0 * batch * h_out * w_out * spec.out_ch * kh * kw * (spec.in_ch // spec.groups)


def model_flops(model, image_size: int, batch: int) -> float:
    """MAC-based FLOP count of the conv/linear stack (2*MACs)."""
    total = 0.0
    hw: Dict[str, int] = {}
    size = image_size

    # walk in conv_order, tracking spatial size per stage via strides
    size_map = {}
    cur = image_size
    g = model.graph
    # head
    head = g["head"]
    cur = (cur + 2 * head.padding[0] - head.kernel[0]) // head.stride[0] + 1
    total += conv_flops(head, cur, cur, batch)
    if model.name.startswith("resnet"):
        cur = (cur + 2 * 1 - 3) // 2 + 1  # maxpool
    for meta in model.blocks:
        for cname in meta.body:
            spec = g[cname]
            cur_in = cur
            cur = (cur + 2 * spec.padding[0] - spec.kernel[0]) // spec.stride[0] + 1
            total += conv_flops(spec, cur, cur, batch)
        sc = getattr(meta, "shortcut", None)
        if sc:
            spec = g[sc]
            total += conv_flops(spec, cur, cur, batch)
    if model.name == "mobilenet_v2":
        total += conv_flops(g["tail"], cur, cur, batch)
    cls = g["classifier"]
    total += 2.0 * batch * cls.in_features * cls.out_features
    return total


def speed_of_light(model, image_size: int, batch: int, seconds_per_batch: float, dtype: str = "int8"):
    """(achieved TOPS, fraction of peak) for a timed forward."""
    flops = model_flops(model, image_size, batch)
    achieved = flops / seconds_per_batch / 1e12
    peak = PEAK_TOPS.get((chip_kind(), dtype), float("nan"))
    return achieved, achieved / peak


import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/f8net_trace"):
    """jax.profiler trace scope; open the result with xprof/tensorboard.
    (The reference's only tracing is a wall-time decorator; this exposes the
    full XLA op-level timeline.)"""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
