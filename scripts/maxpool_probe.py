"""Maxpool formulation probe: 3x3 s2 p1 over (b,112,112,64).

reduce_window on int32 costs ~9 ms at b1024 (head_stage_probe) -- more than
the head conv itself.  Candidates: separable two-pass (3x1 then 1x3, max is
separable), f32/bf16 domains, strided-slice max (9 shifted strided slices).

python scripts/maxpool_probe.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def rw(x, window, strides):
    init = (
        jnp.iinfo(x.dtype).min
        if jnp.issubdtype(x.dtype, jnp.integer)
        else -jnp.inf
    )
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    if window == (1, 3):
        pad = [(0, 0), (0, 0), (1, 1), (0, 0)]
    if window == (3, 1):
        pad = [(0, 0), (1, 1), (0, 0), (0, 0)]
    return lax.reduce_window(
        x, jnp.asarray(init, x.dtype), lax.max,
        (1,) + window + (1,), (1,) + strides + (1,), pad,
    )


def single(x):
    return rw(x, (3, 3), (2, 2))


def separable(x):
    return rw(rw(x, (3, 1), (2, 1)), (1, 3), (1, 2))


def sliced(x):
    # 9 shifted strided slices, max-reduced; all static slices of the padded
    # tensor, no reduce_window at all
    init = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=init)
    n, hp, wp, c = xp.shape
    oh = (hp - 3) // 2 + 1
    ow = (wp - 3) // 2 + 1
    out = None
    for dy in range(3):
        for dx in range(3):
            v = lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + (oh - 1) * 2 + 1, dx + (ow - 1) * 2 + 1, c),
                (1, 2, 2, 1),
            )
            out = v if out is None else jnp.maximum(out, v)
    return out


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    x32 = jax.random.randint(jax.random.PRNGKey(0), (b, 112, 112, 64), 0, 1 << 22)
    xf = x32.astype(jnp.float32)

    for name, fn, x in [
        ("int32 single", single, x32),
        ("int32 separable", separable, x32),
        ("int32 sliced", sliced, x32),
        ("f32 single", single, xf),
        ("f32 separable", separable, xf),
        ("f32 sliced", sliced, xf),
    ]:
        f = jax.jit(lambda v, _fn=fn: jnp.sum(_fn(v).astype(jnp.int32)))
        t = timeit(f, x)
        print(f"  {name:18s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
