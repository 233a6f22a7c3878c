"""Native (C++) golden kernels vs the JAX implementations: triangulated
bit-exactness of the integer algebra."""

import numpy as np
import jax.numpy as jnp
import pytest

from f8net_tpu.native import (
    build_native,
    c_avgpool_sum_int,
    c_conv2d_int,
    c_eval_preprocess_batch,
    c_gemm_int8,
    c_residual_add_int,
    c_shift_requant,
    fxpref_available,
    imageops_available,
)
from f8net_tpu.ops import shift_requant

pytestmark = pytest.mark.skipif(
    not (build_native() and fxpref_available()), reason="native toolchain unavailable"
)


def test_c_shift_requant_matches_jax():
    rng = np.random.RandomState(0)
    x = rng.randint(-(2**20), 2**20, 4096).astype(np.int32)
    for signed in (True, False):
        for net in (1, 3, 8, -2):
            fl = 4
            got = c_shift_requant(x, 8, fl, fl + net, signed)
            want = np.asarray(shift_requant(jnp.asarray(x), 8, fl, fl + net, signed))
            np.testing.assert_array_equal(got, want)


def test_c_conv2d_matches_lax():
    from jax import lax

    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (2, 9, 9, 8)).astype(np.int32)
    w = rng.randint(-127, 128, (3, 3, 8, 16)).astype(np.int8)
    b = rng.randint(-100, 100, 16).astype(np.int32)
    got = c_conv2d_int(x, w, b, stride=(2, 2), padding=(1, 1))
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w, jnp.int32), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32,
    ) + jnp.asarray(b)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_c_depthwise_conv():
    from jax import lax

    rng = np.random.RandomState(2)
    C = 8
    x = rng.randint(-127, 128, (1, 7, 7, C)).astype(np.int32)
    w = rng.randint(-127, 128, (3, 3, 1, C)).astype(np.int8)
    got = c_conv2d_int(x, w, None, padding=(1, 1), groups=C)
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w, jnp.int32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, preferred_element_type=jnp.int32,
    )
    np.testing.assert_array_equal(got, np.asarray(want))


def test_c_residual_and_avgpool_and_gemm():
    rng = np.random.RandomState(3)
    a = rng.randint(-(2**28), 2**28, (2, 4, 4, 8)).astype(np.int32)
    b = rng.randint(-(2**28), 2**28, (2, 4, 4, 8)).astype(np.int32)
    got = c_residual_add_int(a, 12, b, 10)
    want = np.clip(a.astype(np.int64) + (b.astype(np.int64) << 2), -(2**31 - 1), 2**31 - 1)
    np.testing.assert_array_equal(got, want.astype(np.int32))

    np.testing.assert_array_equal(c_avgpool_sum_int(a), a.sum((1, 2)))

    x8 = rng.randint(-127, 128, (16, 64)).astype(np.int8)
    w8 = rng.randint(-127, 128, (64, 32)).astype(np.int8)
    bias = rng.randint(-5, 5, 32).astype(np.int32)
    np.testing.assert_array_equal(
        c_gemm_int8(x8, w8, bias),
        x8.astype(np.int32) @ w8.astype(np.int32) + bias,
    )


def test_c_engine_block_vs_jax_engine():
    """One full IntBlock through the C++ kernels == the XLA integer engine."""
    import jax

    from f8net_tpu.engine import IntEngine
    from f8net_tpu.models import get_model
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    cfg = QuantConfig(format_from_metric=True, metric="std", quant_bias=True, quant_avgpool=True)
    model = get_model("resnet18", cfg, num_classes=10, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))) / 256
    _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)

    # head conv via C++ (weight-only, fraclen-8 input)
    xi = np.asarray(jnp.round(255 * x)).astype(np.int32)
    head = model.graph["head"]
    y_c = c_conv2d_int(xi, np.asarray(ip["head"]["w"]), np.asarray(ip["head"]["b"]),
                       stride=head.stride, padding=head.padding)
    from jax import lax

    y_j = lax.conv_general_dilated(
        jnp.asarray(xi), jnp.asarray(ip["head"]["w"], jnp.int32), head.stride,
        [(head.padding[0],) * 2, (head.padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32,
    ) + ip["head"]["b"]
    np.testing.assert_array_equal(y_c, np.asarray(y_j))


@pytest.mark.skipif(not imageops_available(), reason="libimageops not built")
def test_c_image_preprocess_close_to_pil():
    from PIL import Image

    from f8net_tpu.data import eval_transform

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (300, 400, 3)).astype(np.uint8)
    out = c_eval_preprocess_batch([img], resize=96, size=64, num_threads=2)
    ref = eval_transform(Image.fromarray(img), size=64, resize=96)
    assert out.shape == (1, 64, 64, 3)
    # both bilinear with half-pixel centers; small rounding differences allowed
    diff = np.abs(out[0] - ref)
    assert float(np.mean(diff)) < 0.02 and float(np.max(diff)) < 0.25


def test_standalone_cpp_runtime_bit_equal(tmp_path):
    """csrc/infer_main executes F8NB bundles bit-identically to the engine."""
    import os
    import subprocess

    import jax
    import jax.numpy as jnp

    from f8net_tpu.engine import IntEngine
    from f8net_tpu.export.native_bundle import save_native_bundle
    from f8net_tpu.models import get_model
    from f8net_tpu.quant import bake_plan
    from f8net_tpu.utils import QuantConfig

    binary = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc", "infer_main")
    if not os.path.exists(binary):
        subprocess.run(["make", "-C", os.path.dirname(binary), "infer_main"], check=False, capture_output=True)
    if not os.path.exists(binary):
        pytest.skip("infer_main not built")

    cfg = QuantConfig(format_from_metric=True, metric="std", quant_bias=True,
                      quant_avgpool=True, pool_fusing=True)
    model = get_model("resnet18", cfg, num_classes=10, image_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.round(255 * jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))) / 256
    _, state = model.apply(params, state, x, mode="train")
    plan, ip = bake_plan(model, params, state)
    eng = IntEngine(model, plan, ip)
    xi = eng.condition_input(x)
    ref = np.asarray(eng(xi)).astype(np.int64)

    bundle = os.path.join(tmp_path, "m.f8nb")
    raw = os.path.join(tmp_path, "in.raw")
    save_native_bundle(bundle, model, plan, ip)
    np.asarray(xi, np.int32).tofile(raw)
    out = subprocess.run([binary, bundle, raw, "2", "32", "32"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[:300]
    got = np.array([[int(v) for v in ln.split()] for ln in out.stdout.strip().splitlines()])
    np.testing.assert_array_equal(got, ref)
