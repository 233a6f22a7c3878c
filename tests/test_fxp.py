"""Unit tests for the fxp primitive algebra.

Hand-computed vectors pin down the exact rounding/clamping contract; property
tests cross-check the integer shift path against the float simulation, and
against an independently-written numpy model of round-half-to-even.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f8net_tpu.ops import (
    fix_quant,
    ste_quant,
    shift_requant,
    metric2fraclen,
    fraclen_gridsearch,
    metric_fn,
)


class TestFixQuant:
    def test_hand_vectors_signed(self):
        # wl=8, fl=0: integer grid, symmetric clamp to +/-127 (never -128)
        x = jnp.array([0.4, 0.5, 1.5, 2.5, -0.5, -1.5, 126.6, 127.4, 200.0, -200.0])
        q, _ = fix_quant(x, 8, 0.0, 0, signed=True)
        # round-half-to-even: 0.5->0, 1.5->2, 2.5->2, -0.5->0, -1.5->-2
        np.testing.assert_array_equal(
            np.asarray(q), [0.0, 0.0, 2.0, 2.0, 0.0, -2.0, 127.0, 127.0, 127.0, -127.0]
        )

    def test_hand_vectors_unsigned(self):
        x = jnp.array([-1.0, 0.0, 0.5, 254.5, 255.5, 300.0])
        q, mask = fix_quant(x, 8, 0.0, 0, signed=False)
        np.testing.assert_array_equal(np.asarray(q), [0.0, 0.0, 0.0, 254.0, 255.0, 255.0])
        # mask passes only strictly-inside (0, 255)
        np.testing.assert_array_equal(np.asarray(mask), [False, False, False, True, False, False])

    def test_fraclen_scaling(self):
        x = jnp.array([0.123, -0.456, 0.789])
        q, _ = fix_quant(x, 8, 7.0, 0, signed=True)
        expected = np.clip(np.round(np.asarray(x) * 128.0), -127, 127) / 128.0
        np.testing.assert_allclose(np.asarray(q), expected, rtol=0, atol=0)

    def test_per_channel_fl(self):
        # fl aligned with axis 1 of an NCHW-like tensor
        x = jnp.ones((2, 3, 4, 4)) * 0.3
        fl = jnp.array([0.0, 4.0, 7.0])
        q, _ = fix_quant(x, 8, fl, 1, signed=True)
        got = np.asarray(q)
        np.testing.assert_allclose(got[:, 0], 0.0)
        np.testing.assert_allclose(got[:, 1], round(0.3 * 16) / 16)
        np.testing.assert_allclose(got[:, 2], round(0.3 * 128) / 128)

    def test_floating_skips_round(self):
        x = jnp.array([0.123, 5.0, -5.0])
        q, _ = fix_quant(x, 8, 5.0, 0, signed=True, floating=True)
        bound = 127 / 32.0
        np.testing.assert_allclose(np.asarray(q), [0.123, bound, -bound], rtol=1e-6)

    def test_matches_numpy_model(self):
        rng = np.random.RandomState(0)
        x = rng.randn(64, 32).astype(np.float32) * 3
        for signed in (True, False):
            for fl in (0.0, 3.0, 7.0 if signed else 8.0):
                q, _ = fix_quant(jnp.asarray(x), 8, fl, 0, signed=signed)
                s = 2.0**fl
                r = np.round(x * s)  # numpy round == half-to-even
                if signed:
                    r = np.clip(r, -127, 127)
                else:
                    r = np.clip(r, 0, 255)
                np.testing.assert_array_equal(np.asarray(q), (r / s).astype(np.float32))


class TestSTE:
    def test_gradient_is_masked(self):
        x = jnp.array([0.1, 0.9, -0.9, 2.0, -2.0])  # fl=7 -> bound at 127/128
        g = jax.grad(lambda v: jnp.sum(ste_quant(v, 7.0, 8, 0, True)))(x)
        np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 1.0, 0.0, 0.0])

    def test_unsigned_grad_zero_for_nonpositive(self):
        x = jnp.array([-0.5, 0.0, 0.5])
        g = jax.grad(lambda v: jnp.sum(ste_quant(v, 4.0, 8, 0, False)))(x)
        np.testing.assert_array_equal(np.asarray(g), [0.0, 0.0, 1.0])

    def test_value_matches_fix_quant(self):
        x = jnp.linspace(-2, 2, 37)
        np.testing.assert_array_equal(
            np.asarray(ste_quant(x, 6.0, 8, 0, True)),
            np.asarray(fix_quant(x, 6.0 and 8, 6.0, 0, True)[0]),
        )


def _np_shift_requant(x, wl, fl, input_fl, signed):
    """Independent numpy model: divide by 2^net and round-half-to-even."""
    net = input_fl - fl
    v = x.astype(np.float64) / (2.0**net)
    r = np.round(v)  # half-to-even
    bound = (1 << (wl - 1)) - 1 if signed else (1 << wl) - 1
    lo = -bound if signed else 0
    return np.clip(r, lo, bound).astype(np.int32)


class TestShiftRequant:
    def test_right_shift_round_half_even(self):
        # net = 1: x/2 with ties to even
        x = jnp.array([1, 2, 3, 5, -1, -2, -3, -5], dtype=jnp.int32)
        got = shift_requant(x, 8, 3, 4, True)
        np.testing.assert_array_equal(np.asarray(got), [0, 1, 2, 2, 0, -1, -2, -2])

    def test_left_shift(self):
        x = jnp.array([1, -3, 60], dtype=jnp.int32)
        got = shift_requant(x, 8, 6, 4, True)
        np.testing.assert_array_equal(np.asarray(got), [4, -12, 127])

    def test_clamp_unsigned(self):
        x = jnp.array([-5, 300, 1000], dtype=jnp.int32)
        got = shift_requant(x, 8, 2, 3, False)
        np.testing.assert_array_equal(np.asarray(got), [0, 150, 255])

    @pytest.mark.parametrize("signed", [True, False])
    @pytest.mark.parametrize("net", [1, 2, 5, 9])
    def test_matches_float_model_random(self, signed, net):
        rng = np.random.RandomState(net)
        x = rng.randint(-(2**20), 2**20, size=1000).astype(np.int32)
        fl = 3
        got = shift_requant(jnp.asarray(x), 8, fl, fl + net, signed)
        want = _np_shift_requant(x, 8, fl, fl + net, signed)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_consistent_with_fix_quant(self):
        # shifting an int32 at input_fl down to wl=8/fl must equal simulating
        # fix_quant on the real values
        rng = np.random.RandomState(7)
        x = rng.randint(-(2**15), 2**15, size=512).astype(np.int32)
        input_fl, fl = 11, 5
        got = shift_requant(jnp.asarray(x), 8, fl, input_fl, True)
        real = x.astype(np.float64) / 2.0**input_fl
        q, _ = fix_quant(jnp.asarray(real.astype(np.float32)), 8, float(fl), 0, True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(q * 2.0**fl).astype(np.int32))


class TestMetric2Fraclen:
    def test_coefficient_table(self):
        # signed std: fl = floor(log2(40/sigma))
        for sigma, want in [(40.0, 0.0), (20.0, 1.0), (1.0, 5.0), (0.01, 7.0), (1e6, 0.0)]:
            got = metric2fraclen(jnp.array(sigma), "std", 1.0, True)
            assert float(got) == want, (sigma, float(got), want)

    def test_unsigned_range(self):
        got = metric2fraclen(jnp.array(1e-9), "std", 1.0, False)
        assert float(got) == 8.0
        got = metric2fraclen(jnp.array(70.0), "std", 1.0, False)
        assert float(got) == 0.0

    def test_vector_input(self):
        got = metric2fraclen(jnp.array([40.0, 10.0, 0.001]), "rms", 1.0, True)
        np.testing.assert_array_equal(np.asarray(got), [0.0, 2.0, 7.0])


class TestGridsearch:
    def test_small_values_pick_max_fl(self):
        x = jnp.array([0.05, -0.03, 0.02])
        assert float(fraclen_gridsearch(x, 8, 0, True)) == 7.0

    def test_large_values_pick_zero(self):
        x = jnp.array([100.0, -90.0, 80.0])
        assert float(fraclen_gridsearch(x, 8, 0, True)) == 0.0

    def test_exhaustive_optimality(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(256).astype(np.float32) * 0.2)
        fl = int(fraclen_gridsearch(x, 8, 0, True))
        errs = []
        for cand in range(8):
            q, _ = fix_quant(x, 8, float(cand), 0, True)
            errs.append(float(jnp.sqrt(jnp.mean((x - q) ** 2))))
        assert errs[fl] == min(errs)


class TestMetricFn:
    def test_std_is_sample_std(self):
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        got = metric_fn("std", (0, 1))(x)
        np.testing.assert_allclose(float(got), np.std([1, 2, 3, 4], ddof=1), rtol=1e-6)

    def test_mae_rms(self):
        x = jnp.array([3.0, -4.0])
        assert float(metric_fn("mae", (0,))(x)) == 3.5
        np.testing.assert_allclose(float(metric_fn("rms", (0,))(x)), np.sqrt(12.5), rtol=1e-6)


def test_shift_requant_f32_bitexact_under_bound():
    """shift_requant_f32 == shift_requant for every input within the
    requant_f32_eligible bound (incl. forced ties); outside (left-shift
    int32 wrap) eligibility must say no."""
    import numpy as np

    from f8net_tpu.ops import (
        requant_f32_eligible, shift_requant, shift_requant_f32,
    )

    rng = np.random.RandomState(7)
    for signed in (True, False):
        for in_fl in range(0, 16, 3):
            for fl in (0, 4, 7):
                net = in_fl - fl
                bound = (1 << 24) - 1
                if net < 0 and (bound << -net) >= (1 << 31):
                    bound = ((1 << 31) - 1) >> (-net)
                assert requant_f32_eligible(bound, fl, in_fl)
                x = rng.randint(-bound, bound + 1, 8192).astype(np.int32)
                if net > 0:
                    ties = (
                        rng.randint(-(bound >> net), (bound >> net) + 1, 1024)
                        << net
                    ) + (1 << (net - 1))
                    x = np.concatenate(
                        [x, np.clip(ties, -bound, bound).astype(np.int32)]
                    )
                a = np.asarray(shift_requant(jnp.asarray(x), 8, fl, in_fl, signed))
                b = np.asarray(
                    shift_requant_f32(jnp.asarray(x), 8, fl, in_fl, signed)
                )
                np.testing.assert_array_equal(a, b, err_msg=str((signed, in_fl, fl)))
    # ineligibility: left-shift wrap
    assert not requant_f32_eligible((1 << 24) - 1, 8, 0)


def test_requant_f32_saturation_regime():
    """abs_bound >= 2^24 (saturation regime, ops/fxp.py): the f32 path
    stays bit-identical because every |x| >= 2^24 saturates the clamp in
    both paths.  Adversaries: a dense band straddling the 2^24 exactness
    edge, rounding-boundary +-2 neighborhoods across [2^24, 2^31) (where
    the f32 cast error could flip the rounded quotient), the clamp-
    crossing region, and a random spray -- all mirrored negative.  Also
    pins the gate's tightness: one step past the net limit a REAL
    mismatch exists, so the limit is load-bearing."""
    import numpy as np

    from f8net_tpu.ops import (
        requant_f32_eligible, shift_requant, shift_requant_f32,
    )

    rng = np.random.RandomState(11)
    imax = (1 << 31) - 1
    for signed, net_max in ((True, 17), (False, 16)):
        hi = 127 if signed else 255
        for net in (1, 7, net_max):
            fl, in_fl = 0, net
            # the integer path's rounding bias (x + 2^(net-1)) must not
            # wrap int32, so the largest licensable bound is:
            bmax = imax - (1 << (net - 1))
            assert requant_f32_eligible(bmax, fl, in_fl, 8, signed)
            assert not requant_f32_eligible(bmax + 1, fl, in_fl, 8, signed)
            band = np.arange(
                (1 << 24) - 4096, (1 << 24) + 4096, dtype=np.int64
            )
            k = rng.randint(
                1 << max(24 - net, 0), (bmax >> net) - 1, 4096
            ).astype(np.int64)
            adv = (k << net) + (1 << (net - 1))
            adv = np.concatenate([adv - 2, adv - 1, adv, adv + 1, adv + 2])
            cross = np.arange(
                (hi - 2) << net, min((hi + 3) << net, bmax), dtype=np.int64
            )[:20000]
            spray = rng.randint(1 << 24, bmax, 8192).astype(np.int64)
            top = np.arange(bmax - 4096, bmax + 1, dtype=np.int64)
            x = np.clip(
                np.concatenate([band, adv, cross, spray, top]), 0, bmax
            )
            x = np.concatenate([x, -x]).astype(np.int32)
            a = np.asarray(shift_requant(jnp.asarray(x), 8, fl, in_fl, signed))
            b = np.asarray(
                shift_requant_f32(jnp.asarray(x), 8, fl, in_fl, signed)
            )
            np.testing.assert_array_equal(a, b, err_msg=str((signed, net)))
        # one past the net limit: the gate must refuse, and a genuine
        # mismatch exists in the no-longer-saturating range
        assert not requant_f32_eligible(1 << 24, 0, net_max + 1, 8, signed)
        x = np.arange(1 << 24, (1 << 24) + (1 << 20), dtype=np.int32)
        a = np.asarray(shift_requant(jnp.asarray(x), 8, 0, net_max + 1, signed))
        b = np.asarray(
            shift_requant_f32(jnp.asarray(x), 8, 0, net_max + 1, signed)
        )
        assert (a != b).any(), ("expected a mismatch past the gate", signed)
        # past the WRAP limit: the integer path wraps negative at the top
        # of int32 and clamps LOW while f32 clamps HIGH
        net = net_max
        xw = np.arange(imax - (1 << (net - 1)) + 1, imax, dtype=np.int64)
        xw = xw.astype(np.int32)
        a = np.asarray(shift_requant(jnp.asarray(xw), 8, 0, net, signed))
        b = np.asarray(shift_requant_f32(jnp.asarray(xw), 8, 0, net, signed))
        assert (a != b).any(), ("expected a wrap mismatch", signed)
    # saturation regime still refuses a wrapping left shift
    assert not requant_f32_eligible(1 << 25, 8, 2, 8, True)
