"""Monte-Carlo fixed-point quantization error analysis.

Re-derivation of the semi-empirical sigma->fraclen rule (the offline study in
the reference's error_analysis/fixed_quant_analysis.py:283-316, which is
where metric2fraclen's 40/70 coefficients come from): for sigma over a log
grid, quantize N (rectified-)Gaussian samples at every fraclen, record the
relative RMS error, take the argmin fraclen, and fit the threshold rule
sigma_th ~ coeff / 2^fl.

Usage:
    python -m f8net_tpu.tools.error_analysis [--signed] [--out results.txt]
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

from ..ops.fxp import fix_quant

import jax.numpy as jnp


def quant_rel_error(sigma: float, fl: int, n: int, signed: bool, seed: int = 0) -> float:
    rng = np.random.RandomState(seed)
    x = rng.randn(n).astype(np.float32) * sigma
    if not signed:
        x = np.maximum(x, 0.0)
    q, _ = fix_quant(jnp.asarray(x), 8, float(fl), 0, signed)
    err = np.sqrt(np.mean((np.asarray(q) - x) ** 2))
    denom = np.sqrt(np.mean(x**2)) + 1e-12
    return float(err / denom)


def sweep(
    n: int = 10000,
    signed: bool = True,
    sigmas: Optional[np.ndarray] = None,
    seed: int = 0,
):
    """Returns (sigmas, opt_fl[], err_table[n_sigma, n_fl])."""
    if sigmas is None:
        sigmas = np.logspace(-3, 3, 121)
    fls = list(range(8 - int(signed) + 1))
    table = np.empty((len(sigmas), len(fls)))
    for i, s in enumerate(sigmas):
        for j, fl in enumerate(fls):
            table[i, j] = quant_rel_error(float(s), fl, n, signed, seed)
    opt = np.argmin(table, axis=1).astype(float)
    return sigmas, opt, table


def fit_threshold_coeff(sigmas: np.ndarray, opt_fl: np.ndarray) -> float:
    """Fit sigma_th(fl) ~ coeff / 2^fl at the fl transition points."""
    coeffs = []
    for fl in range(1, int(opt_fl.max()) + 1):
        idx = np.where(opt_fl >= fl)[0]
        if len(idx) == 0:
            continue
        sigma_th = sigmas[idx[-1]] if opt_fl[0] > opt_fl[-1] else sigmas[idx[0]]
        # transition where opt drops below fl as sigma grows
        above = np.where(opt_fl >= fl)[0]
        sigma_th = sigmas[above[-1]]
        coeffs.append(sigma_th * 2.0**fl)
    return float(np.median(coeffs)) if coeffs else float("nan")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--signed", action="store_true", default=False)
    ap.add_argument("--unsigned", dest="signed", action="store_false")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    sigmas, opt, table = sweep(args.n, args.signed)
    coeff = fit_threshold_coeff(sigmas, opt)
    lines = [f"# 8bit signed={args.signed} fitted threshold coeff ~ {coeff:.1f}"]
    lines += [
        f"{s:.6g}\t{int(o)}\t" + "\t".join(f"{e:.4g}" for e in row)
        for s, o, row in zip(sigmas, opt, table)
    ]
    text = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    else:
        print(text)


if __name__ == "__main__":
    main()
