"""On-chip bit-exactness check of the Pallas VPU depthwise kernel at real
MobileNet shapes (compiled Mosaic, not interpret).  Run with nothing else
on the host (relay timing discipline, docs/BENCHMARKS.md)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from f8net_tpu.ops import shift_requant
from f8net_tpu.ops.pallas_dw import pallas_depthwise_int8

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

# Realistic batch slices: at tiny n XLA promotes the (lane-padded) output
# buffer into scoped VMEM and OOMs -- production batches stay in HBM.
SHAPES = [
    # n, h, c, stride   (MBv2 b-small slices + MBv1 tail; stride-1 only --
    # Mosaic rejects strided vector extracts, stride-2 dw stays on XLA)
    (64, 112, 32, 1),
    (64, 56, 144, 1),
    (64, 28, 192, 1),
    (64, 14, 384, 1),
    (64, 14, 576, 1),
    (64, 7, 960, 1),
    (64, 7, 1024, 1),
]


def ref_dw(x, w, b, stride, padding, pad_value):
    c = x.shape[-1]
    xp = jnp.pad(
        x.astype(jnp.int32),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
        constant_values=pad_value,
    )
    y = lax.conv_general_dilated(
        xp, w.astype(jnp.int32), (stride, stride), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.int32,
    )
    return y + b


def main():
    print("backend:", jax.default_backend(), flush=True)
    net, out_signed = 6, False
    for n, h, c, s in SHAPES:
        rng = np.random.RandomState(c + s)
        x = jnp.asarray(rng.randint(-128, 128, (n, h, h, c)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, c)), jnp.int8)
        b = jnp.asarray(rng.randint(-(1 << 14), 1 << 14, (c,)), jnp.int32)
        y = pallas_depthwise_int8(
            x, w, b, stride=s, padding=1, pad_value=-128,
            epilogue="requant8", net=net, out_signed=out_signed,
            compute=os.environ.get("DW_COMPUTE", "f32"),
        )
        acc = ref_dw(x, w, b, s, 1, -128)
        want = shift_requant(acc, 8, 0, net, out_signed)
        if not out_signed:
            want = want - 128
        ok = bool(jnp.array_equal(y, want.astype(jnp.int8)))
        print(f"{n}x{h}x{h}x{c} s{s}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            d = np.asarray(y).astype(np.int32) - np.asarray(want)
            print("  max |diff|:", np.abs(d).max(), "at", np.unravel_index(np.abs(d).argmax(), d.shape))
            sys.exit(1)
    print("all shapes bit-exact on", jax.default_backend())


if __name__ == "__main__":
    main()
