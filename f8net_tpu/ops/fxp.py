"""Fixed-point quantization primitives (the fxp algebra).

This module is the numerical core of the framework: simulated fixed-point
quantization with straight-through-estimator gradients, the semi-empirical
sigma->fraclen formula, brute-force fraclen grid search, and the pure-integer
power-of-two shift requantization used on the inference hot path.

Numerical contract (must match the reference bit-for-bit; see SURVEY.md §2.1):
  * simulated quantize:   behavior of /root/reference/models/fix_quant_ops.py:64-87
  * STE gradient mask:    /root/reference/models/fix_quant_ops.py:40-61
  * integer shift requant (round-half-to-even):
                          /root/reference/models/fix_quant_ops.py:90-114
  * metric->fraclen:      /root/reference/models/fix_quant_ops.py:30-37
  * fraclen grid search:  /root/reference/models/fix_quant_ops.py:17-27

All functions are pure and jittable.  Rounding everywhere is
round-half-to-even (jnp.round == torch.round == IEEE roundTiesToEven), and the
signed clamp is *symmetric*: +/-(2^(wl-1)-1), i.e. -127..127 for 8-bit --
never -128.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Coefficient tables of the semi-empirical sigma->fraclen rule, derived by the
# Monte-Carlo error analysis of quantizing (rectified-)Gaussian tensors
# (reference: error_analysis/fixed_quant_analysis.py:283-316).  The threshold
# rule is sigma_opt(fl) ~ coeff / 2^fl.
SIGNED_COEFF = {"std": 40.0, "mae": 30.0, "rms": 40.0}
UNSIGNED_COEFF = {"std": 70.0, "mae": 30.0, "rms": 50.0}


def _broadcast_fl(fl: jnp.ndarray, ndim: int, axis: int) -> jnp.ndarray:
    """Align a fraclen vector with `axis` of an ndim-array.

    `fl` is either a scalar, a length-1 vector, or a vector of size
    x.shape[axis]; it is expanded with trailing singleton dims so that its last
    real dim lines up with `axis` (the reference's align_dim convention).
    """
    fl = jnp.asarray(fl, jnp.float32)
    if fl.ndim == 0:
        return fl
    expand = ndim - axis - 1
    return fl.reshape(fl.shape + (1,) * expand)


def fix_quant(
    x: jnp.ndarray,
    wl: int = 8,
    fl=0,
    axis: int = 0,
    signed: bool = True,
    floating: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Simulated fixed-point quantization.

    Scales by 2^fl, rounds (half-to-even), clamps to the symmetric signed range
    [-(2^(wl-1)-1), 2^(wl-1)-1] or the unsigned range [0, 2^wl-1], and scales
    back.  Returns (quantized, grad_mask) where grad_mask is True exactly where
    the STE gradient passes (element not clipped; for unsigned also strictly
    positive, which implements the ReLU of the fused ReLU+quant).

    With floating=True the round is skipped (clip-only; used by the FP
    baseline "floating" training mode).
    """
    assert isinstance(wl, int) and wl >= 0
    fl = _broadcast_fl(fl, jnp.ndim(x), axis)
    scale = jnp.exp2(fl)
    res = x * scale
    if not floating:
        res = jnp.round(res)
    if signed:
        bound = float(2 ** (wl - 1) - 1)
        mask = jnp.abs(res) < bound
        res = jnp.clip(res, -bound, bound)
    else:
        bound = float(2**wl - 1)
        mask = (res > 0) & (res < bound)
        res = jnp.clip(res, 0.0, bound)
    return res / scale, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def ste_quant(x, fl, wl=8, axis=0, signed=True, floating=False):
    """fix_quant with a straight-through-estimator gradient.

    Backward multiplies the cotangent by the clip mask: gradient flows only
    through elements that were not clipped (and, unsigned, were > 0).  No
    gradient flows to `fl`.
    """
    res, _ = fix_quant(x, wl, fl, axis, signed, floating)
    return res


def _ste_fwd(x, fl, wl, axis, signed, floating):
    res, mask = fix_quant(x, wl, fl, axis, signed, floating)
    return res, mask


def _ste_bwd(wl, axis, signed, floating, mask, g):
    return g * mask.astype(g.dtype), None


ste_quant.defvjp(_ste_fwd, _ste_bwd)


def shift_requant(
    x: jnp.ndarray,
    wl: int = 8,
    fl: int = 0,
    input_fl: int = 0,
    signed: bool = True,
) -> jnp.ndarray:
    """Pure-integer requantization between fixed-point formats.

    This is the heart of the "8-bit-only multiply" claim: converting an int32
    accumulator at fractional length `input_fl` to an 8-bit operand at
    fractional length `fl` is a single arithmetic shift -- right by
    net = input_fl - fl with explicit round-half-to-even, or left by -net --
    followed by the symmetric clamp.  No multiplies, no FP.

    `fl` and `input_fl` are static Python ints (baked by the QuantPlan), so
    the shift amount is a compile-time constant inside jit/Pallas.

    Round-half-to-even on an arithmetic right shift by n:
        res = x + 2^(n-1)                  # bias for round-half-up
        ties (x mod 2^n == 2^(n-1)) get    ((res >> (n+1)) << 1)  # even-ize
        everything else gets                res >> n
    (jnp.mod with positive divisor is non-negative for negative x, and >> on
    signed ints is arithmetic -- identical semantics to the reference.)
    """
    assert isinstance(fl, int) and isinstance(input_fl, int)
    assert fl >= 0
    assert fl <= (wl - 1 if signed else wl)
    x = x.astype(jnp.int32)
    net = input_fl - fl
    if net > 0:
        half = 1 << (net - 1)
        res = x + half
        tie = jnp.mod(x, 1 << net) == half
        res = jnp.where(tie, (res >> (net + 1)) << 1, res >> net)
    else:
        res = x << (-net)
    if signed:
        bound = (1 << (wl - 1)) - 1
        res = jnp.clip(res, -bound, bound)
    else:
        bound = (1 << wl) - 1
        res = jnp.clip(res, 0, bound)
    return res


F32_EXACT_BOUND = 1 << 24  # int32 values |x| < 2^24 are exact in float32


def requant_f32_eligible(
    abs_bound: int, fl: int, input_fl: int, wl: int = 8, signed: bool = True
) -> bool:
    """True when shift_requant_f32 is bit-identical to shift_requant for
    every input with |x| <= abs_bound.

    Two regimes (both property-tested in tests/test_fxp.py):

    * abs_bound < 2^24: the input casts to f32 exactly, so the whole
      computation is exact.  A left shift (net < 0) must additionally not
      wrap int32 (the integer path wraps on overflow; the float path
      saturates).

    * abs_bound >= 2^24 (saturation regime): inputs below 2^24 are exact
      as above; inputs with |x| >= 2^24 lose low bits in the f32 cast,
      but BOTH paths clamp them to the same saturated output whenever the
      smallest such input already clears the clamp:

        - net > 0 (right shift): r(2^24) = 2^(24-net) exactly in both
          paths (2^24 is f32-exact and divides evenly), and both paths
          are monotone in x, so every |x| >= 2^24 saturates iff
          2^(24-net) > clamp_hi.  Signed wl=8 (clamp 127): net <= 17;
          unsigned (clamp 255): net <= 16.
        - net <= 0: the result magnitude only grows, so every
          |x| >= 2^24 > clamp_hi saturates in both paths -- provided the
          integer left shift cannot wrap.

      This licenses the f32 fast path on the wide accumulators (e.g.
      ResNet50's C_in=2048 1x1s, bound ~2^25) that the exactness-only
      rule excluded.

    In BOTH regimes the integer path's own arithmetic must not wrap
    int32: for net > 0 it adds the rounding bias (x + 2^(net-1)), so
    abs_bound + 2^(net-1) must stay below 2^31 (at x near INT32_MAX the
    integer path wraps negative and clamps LOW while f32 clamps HIGH --
    pinned by the tightness test); for net < 0 the left shift must fit.
    """
    net = input_fl - fl
    if net > 0:
        if abs_bound + (1 << (net - 1)) >= (1 << 31):
            return False
        if abs_bound < F32_EXACT_BOUND:
            return True
        clamp_hi = (1 << (wl - 1)) - 1 if signed else (1 << wl) - 1
        return net <= 24 and (1 << (24 - net)) > clamp_hi
    return (abs_bound << -net) < (1 << 31)


def shift_requant_f32(
    x: jnp.ndarray,
    wl: int = 8,
    fl: int = 0,
    input_fl: int = 0,
    signed: bool = True,
) -> jnp.ndarray:
    """shift_requant computed in float32 -- BIT-IDENTICAL whenever the
    input accumulator satisfies |x| < 2^24 (F32_EXACT_BOUND):

      * x casts to f32 exactly (24-bit significand);
      * multiplying by the power of two 2^-net only moves the exponent, so
        the product is exact;
      * jnp.round is IEEE round-half-to-even == the integer path's explicit
        tie-to-even logic;
      * the clamp bounds are tiny integers, exact in f32.

    Why it exists (docs/BENCHMARKS.md round-3 SoL table): the integer
    requant epilogue costs ~6 VPU int32 ops per element; at 1x1-conv
    arithmetic intensity that epilogue DOMINATES (s8 1x1 classes measured
    3-8x slower than bf16's float epilogues, while 3x3 classes -- where the
    epilogue amortizes -- beat bf16).  The engine switches to this form per
    layer when the static accumulator bound (from the baked weights/bias)
    proves exactness; tests assert bit-equality across the whole int32
    exact range and on every model family."""
    assert isinstance(fl, int) and isinstance(input_fl, int)
    assert fl >= 0
    assert fl <= (wl - 1 if signed else wl)
    net = input_fl - fl
    v = jnp.round(x.astype(jnp.float32) * float(2.0 ** (-net)))
    if signed:
        bound = (1 << (wl - 1)) - 1
        v = jnp.clip(v, -bound, bound)
    else:
        bound = (1 << wl) - 1
        v = jnp.clip(v, 0, bound)
    return v.astype(jnp.int32)


def metric2fraclen(
    metric: jnp.ndarray,
    metric_name: str = "std",
    n: float = 1.0,
    signed: bool = True,
) -> jnp.ndarray:
    """The semi-empirical statistics->fraclen formula.

    fl = floor(log2(coeff * n / metric)), clamped to [0, 8 - int(signed)].
    The coefficient depends on the metric (std/mae/rms) and signedness; see
    SIGNED_COEFF / UNSIGNED_COEFF.
    """
    coeff = (SIGNED_COEFF if signed else UNSIGNED_COEFF)[metric_name]
    fl = jnp.floor(jnp.log2(coeff * n / metric))
    return jnp.clip(fl, 0.0, float(8 - int(signed)))


def fraclen_gridsearch(
    x: jnp.ndarray, wl: int = 8, axis: int = 0, signed: bool = True
) -> jnp.ndarray:
    """Brute-force per-layer fraclen selection.

    Quantizes at every candidate fl in [0, wl - int(signed)] and returns the
    (first) argmin of RMS reconstruction error as a float scalar.  The loop is
    static (wl is a Python int) so everything fuses under jit.
    """
    errs = []
    for fl in range(wl + 1 - int(signed)):
        q, _ = fix_quant(x, wl, float(fl), axis, signed)
        errs.append(jnp.sqrt(jnp.mean((x - q) ** 2)))
    return jnp.argmin(jnp.stack(errs)).astype(jnp.float32)


def metric_fn(name: str, axes) -> callable:
    """Statistic used by metric2fraclen, reduced over `axes`.

    std is the *sample* standard deviation (ddof=1) to match torch.std's
    default, which the reference relies on.
    """
    axes = tuple(axes)
    if name == "std":
        return lambda x: jnp.std(x, axis=axes, ddof=1)
    if name == "mae":
        return lambda x: jnp.mean(jnp.abs(x), axis=axes)
    if name == "rms":
        return lambda x: jnp.sqrt(jnp.mean(x**2, axis=axes))
    raise NotImplementedError(f"metric {name!r}")
