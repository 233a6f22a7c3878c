"""Differential execution test against the UPSTREAM reference itself.

The strongest independent numerics receipt available in this container: the
reference's own PyTorch stack (models/fix_quant_ops.py, fix_resnet.py,
fix_mobilenet_v{1,2}.py) is executed on CPU via tests/_refdiff_driver.py --
QAT train-mode forwards populate EMA fraclens + BN stats from the reference's
own random init, then the reference's own `int_model()` + `int_op_only`
conversion (fix_train.py:930-957) produces integer weights and int logits.
The identical checkpoint is imported through f8net_tpu.importers and run
through our integer engine.

Contract asserted per family:
  1. every baked fraclen (weight + input) == the reference's, exactly;
  2. every int8 weight == the reference's, bitwise;
  3. int32 biases == bitwise up to a tiny f32-tie budget (folded BN bias is
     computed in float by both frameworks; at exact .5-ulp ties torch-f32 and
     jax-f32 reductions may land on opposite sides -- observed 2/4800 values
     off by 1 on ResNet18, 0 on both MobileNets);
  4. with the reference's own integer weights substituted, our engine's int
     logits == the reference's int_op_only logits BITWISE (the dataflow --
     convs, requants, residual adds, maxpool, avgpool, classifier -- is
     exactly the reference's executed semantics);
  5. when the bias tie budget is unused (bdiff == 0), the direct conversion
     is bitwise end-to-end too;
  6. our QAT eval logits match the reference's eval forward to 5e-2 (the
     documented float-mode tolerance, same as the internal cross-mode gate).

Four configurations: ResNet18 / MobileNetV1 / MobileNetV2 conventional, plus
ResNet50 tiny_finetuning (normalize=True signed head input, no_clipping,
format_grid_search weight fraclens -- the Model-Zoo evaluation paths).

Runs only when /root/reference is mounted (skip otherwise) -- no reference
code is vendored; the driver calls it as a library in a subprocess.
"""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from f8net_tpu.engine import IntEngine
from f8net_tpu.importers.torch_ckpt import load_reference_checkpoint
from f8net_tpu.models import get_model
from f8net_tpu.quant import bake_plan
from f8net_tpu.utils import QuantConfig

REF = os.environ.get("F8NET_REFERENCE", "/root/reference")
DRIVER = os.path.join(os.path.dirname(__file__), "_refdiff_driver.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not mounted",
)

FAMILIES = ["resnet18", "mobilenet_v1", "mobilenet_v2", "resnet50_tf"]

_BASE = QuantConfig(
    format_from_metric=True,
    metric="std",
    quant_bias=True,
    quant_avgpool=True,
    pool_fusing=True,
    quant_maxpool=False,
)
# resnet50_tf = the reference's tiny_finetuning configuration: signed
# normalized head input, PACT clipping off, weight fraclens by grid search
CFGS = {
    "resnet18": _BASE,
    "mobilenet_v1": _BASE,
    "mobilenet_v2": _BASE,
    "resnet50_tf": _BASE.replace(
        normalize=True, no_clipping=True, format_grid_search=True
    ),
}
MODEL_OF = {f: f.removesuffix("_tf") for f in FAMILIES}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)


def _ref2ours(rn: str) -> str:
    """Reference IntModel module name -> our LayerGraph name.

    The reference's int_block interleaves nn.ReLU modules into the body
    Sequential (fix_resnet.py:300-320), so its convs sit at body.{0,2,4};
    ours keep the QAT indices body.{0,1,2}.  head/tail/classifier drop the
    Sequential '.0' on our side.
    """
    if rn in ("head.0", "tail.0", "classifier.0"):
        return rn[:-2]
    p = rn.split(".")
    if len(p) == 3 and p[1] == "body":
        return f"{p[0]}.body.{int(p[2]) // 2}"
    return rn


@pytest.fixture(scope="module", params=FAMILIES)
def ref_run(request, tmp_path_factory):
    fam = request.param
    work = tmp_path_factory.mktemp(f"refdiff_{fam}")
    env = dict(os.environ, PYTHONDONTWRITEBYTECODE="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the subprocess off the TPU tunnel
    for phase in ("qat", "int"):
        r = subprocess.run(
            [sys.executable, DRIVER, phase, str(work), "--family", fam],
            capture_output=True, text=True, timeout=900, env=env,
        )
        assert r.returncode == 0, f"{fam} {phase} driver failed:\n{r.stdout}\n{r.stderr}"
    return fam, work


@pytest.fixture(scope="module")
def ours(ref_run):
    fam, work = ref_run
    model = get_model(MODEL_OF[fam], CFGS[fam], num_classes=1000, image_size=224)
    params, state = load_reference_checkpoint(model, str(work / "ckpt.pt"))
    plan, int_params = bake_plan(model, params, state)
    return fam, work, model, params, state, plan, int_params


def _is_normalize(work) -> bool:
    return bool(json.loads((work / "meta.json").read_text()).get("normalize"))


def _engine_input(work):
    """NHWC input for IntEngine.condition_input: raw [0,1) images for the
    conventional configs, mean/std-normalized floats for normalize=True."""
    x0 = np.load(work / "input.npy")
    if _is_normalize(work):
        x0 = ((x0 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
    return jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))


def test_fraclens_match_reference(ours):
    fam, work, model, params, state, plan, int_params = ours
    ref_fr = json.loads((work / "fraclens.json").read_text())
    assert ref_fr, "reference dumped no fraclens"
    for rn, d in ref_fr.items():
        pl = plan[_ref2ours(rn)]
        assert [int(v) for v in np.atleast_1d(pl.weight_fl)] == d["weight_fl"], rn
        assert [pl.input_fl] == d["input_fl"], rn


def _load_ref_ints(work):
    z = np.load(work / "int_weights.npz")
    out = {}
    for key in z.files:
        rn, kind = key.rsplit(".", 1)
        v = z[key]
        if kind == "w" and v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        elif kind == "w":
            v = np.transpose(v, (1, 0))
        out.setdefault(_ref2ours(rn), {})[kind] = v
    return out


def test_int_weights_bitwise_biases_within_tie_budget(ours):
    fam, work, model, params, state, plan, int_params = ours
    ref = _load_ref_ints(work)
    wdiff = bdiff = btotal = 0
    for on, d in ref.items():
        ours_w = np.asarray(int_params[on]["w"]).astype(np.int64)
        assert ours_w.shape == d["w"].shape, on
        wdiff += int((ours_w != d["w"].astype(np.int64)).sum())
        if "b" in d:
            ours_b = np.asarray(int_params[on]["b"]).astype(np.int64)
            delta = np.abs(ours_b - d["b"].astype(np.int64))
            assert delta.max(initial=0) <= 1, f"{on}: bias diff > 1 ulp"
            bdiff += int((delta > 0).sum())
            btotal += delta.size
    assert wdiff == 0, f"{wdiff} int8 weights differ"
    # f32 rounding-tie budget: <=0.1% of biases, each off by exactly 1
    assert bdiff <= max(2, btotal // 1000), f"{bdiff}/{btotal} biases differ"


def _int_logits(model, plan, int_params, work):
    eng = IntEngine(model, plan, int_params, int_only=True)
    return np.asarray(eng(eng.condition_input(_engine_input(work)))).astype(np.int64)


def test_engine_bitwise_equals_reference_int_op_only(ours):
    """Reference integers through our engine == reference int logits, bitwise."""
    fam, work, model, params, state, plan, int_params = ours
    ref = _load_ref_ints(work)
    ip = {k: dict(v) for k, v in int_params.items()}
    for on, d in ref.items():
        ip[on]["w"] = jnp.asarray(d["w"].astype(np.asarray(ip[on]["w"]).dtype))
        if "b" in d:
            ip[on]["b"] = jnp.asarray(d["b"].astype(np.int32))
    y = _int_logits(model, plan, ip, work)
    ref_y = np.load(work / "int_logits.npy").astype(np.int64)
    np.testing.assert_array_equal(y, ref_y)


def test_direct_conversion_bitwise_when_no_bias_ties(ours):
    fam, work, model, params, state, plan, int_params = ours
    ref = _load_ref_ints(work)
    bdiff = sum(
        int((np.asarray(int_params[on]["b"]).astype(np.int64) != d["b"].astype(np.int64)).sum())
        for on, d in ref.items() if "b" in d
    )
    y = _int_logits(model, plan, int_params, work)
    ref_y = np.load(work / "int_logits.npy").astype(np.int64)
    if bdiff == 0:
        np.testing.assert_array_equal(y, ref_y)
    else:
        # each 1-ulp bias tie perturbs downstream logits boundedly; the
        # dataflow itself is pinned bitwise by the substitution test above
        assert np.abs(y - ref_y).max() <= 64 * bdiff


def test_qat_eval_close_to_reference(ours):
    fam, work, model, params, state, plan, int_params = ours
    x = _engine_input(work)
    if not _is_normalize(work):
        x = jnp.round(255.0 * x) / 256.0  # fix_train.py:694 conditioning
    logits, _ = model.apply(params, state, x, mode="eval")
    ref_a = np.load(work / "qat_eval_logits.npy")
    np.testing.assert_allclose(np.asarray(logits), ref_a, rtol=0, atol=5e-2)
