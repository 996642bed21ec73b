"""Deterministic fixture generator — F1 samples + F2 stats (FIXTURES.md).

Reimplements the reference's data generation
(``/root/reference/dataGeneration/psd.R``) in seeded numpy:

- ``psd.R:4-18``  — 6 correlated asset returns from a **truncated
  multivariate t** (μ, 6×6 Σ, df=4, bounds ±0.1). The R script uses
  Gibbs sampling (``tmvtnorm::rtmvt``); we draw the same distribution
  by the standard construction t = μ + Z·chol(Σ)ᵀ/√(W/df), W ~ χ²(df),
  with rejection on the ±0.1 box — identical target law, simpler and
  vectorized (the sampler is fixture tooling, not engine code).
- ``psd.R:21-24`` — weighted portfolio series (weights from config).
- ``psd.R:29-68`` — the six population statistics per series → the F2
  ``stats`` threshold table, in two variants:
  * ``consistent`` (default): SM2 threshold computed with the *same*
    formula the engine measures (Java form, ΣΣ|xi−xj|/(2n²)) — fixes
    the reference's scale mismatch (SURVEY.md §2.8 #4);
  * ``reference_bug``: SM2 threshold = plain gmd (R's ÷ n(n−1) form,
    ``psd.R:65-67``) — pins bug-compat tests that reproduce the
    near-zero SM2 alert counts of ``postProcessing/countings.txt``.

Population stats are computed with the same sorted-ascending folds as
the engine's measure library, so thresholds and windowed measures
cannot drift.
"""

from __future__ import annotations

import numpy as np

from psd_project_spark.config import DEFAULT_CONFIG

#: Reference model parameters, verbatim (dataGeneration/psd.R:4-15).
MU = np.array([0.002, 0.004, 0.003, 0.002, 0.001, 0.003])
SIGMA = np.array(
    [
        [36, -2, -6, -1, 13, -1],
        [-2, 1, -1, 0, -1, -1],
        [-6, -1, 9, 1, 5, 0],
        [-1, 0, 1, 1, -1, 0],
        [13, -1, 5, -1, 25, -6],
        [-1, -1, 0, 0, -6, 4],
    ],
    dtype=np.float64,
)
DF = 4
BOUND = 0.1

# The marginal sds (1..6) dwarf the ±0.1 box, so the acceptance rate of
# naive rejection is ~0 — like the reference (tmvtnorm 'gibbs'), we
# Gibbs-sample: draw the t's scale mixture w ~ χ²(df)/df per sample,
# then sweep coordinate-wise truncated-normal conditionals of
# N(μ, Σ/w). All chains (one per sample) advance vectorized per sweep.

_SQRT2 = float(np.sqrt(2.0))


def _erf_vec(x: np.ndarray) -> np.ndarray:
    """Abramowitz–Stegun 7.1.26 erf (|err| < 1.5e-7), numpy-only."""
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-x * x))


def _norm_cdf(x: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + _erf_vec(x / _SQRT2))


def _norm_ppf(p: np.ndarray) -> np.ndarray:
    """Acklam's inverse-normal-CDF approximation (|rel err| ~ 1e-9)."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    p = np.clip(p, 1e-15, 1 - 1e-15)
    x = np.empty_like(p)
    lo, hi = p < 0.02425, p > 1 - 0.02425
    mid = ~(lo | hi)
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        x[mid] = (
            (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
            / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
        )
    for mask, sgn in ((lo, 1.0), (hi, -1.0)):
        if mask.any():
            pp = p[mask] if sgn > 0 else 1 - p[mask]
            q = np.sqrt(-2 * np.log(pp))
            x[mask] = sgn * (
                ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
            ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    return x


def _inv6(a: np.ndarray) -> np.ndarray:
    """6×6 inverse via Gauss-Jordan with partial pivoting, in plain
    Python floats — deliberately NOT ``np.linalg.inv``: LAPACK results
    vary in the last ulp with the BLAS thread count (OMP_NUM_THREADS),
    and Spark's Python workers run single-threaded while driver-side
    tools may not. Every user of this generator (the psd_samples
    DataSource golden oracle, fixture writers) depends on the output
    being a pure function of (n, seed) regardless of environment."""
    m = [[float(v) for v in row] for row in a]
    k = len(m)
    inv = [[1.0 if i == j else 0.0 for j in range(k)] for i in range(k)]
    for col in range(k):
        piv = max(range(col, k), key=lambda r: abs(m[r][col]))
        m[col], m[piv] = m[piv], m[col]
        inv[col], inv[piv] = inv[piv], inv[col]
        d = m[col][col]
        for j in range(k):
            m[col][j] /= d
            inv[col][j] /= d
        for r in range(k):
            if r == col:
                continue
            f = m[r][col]
            if f == 0.0:
                continue
            for j in range(k):
                m[r][j] -= f * m[col][j]
                inv[r][j] -= f * inv[col][j]
    return np.array(inv, dtype=np.float64)


def _matvec_cols(mat: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Fixed left-to-right fold of Σₖ mat[:,k]·coeffs[k] — elementwise
    numpy ufuncs only (deterministic under any thread count), replacing
    ``mat @ coeffs`` whose BLAS dgemv fold order is environment-
    dependent."""
    acc = mat[:, 0] * coeffs[0]
    for k in range(1, coeffs.size):
        acc = acc + mat[:, k] * coeffs[k]
    return acc


def sample_returns(n: int, seed: int = 42, sweeps: int = 40) -> np.ndarray:
    """n × 6 truncated multivariate-t draws (vectorized Gibbs)."""
    rng = np.random.default_rng(seed)
    prec = _inv6(SIGMA)
    w = rng.chisquare(DF, size=n) / DF  # t scale mixture, one per chain
    x = np.tile(np.clip(MU, -BOUND, BOUND), (n, 1))
    for _ in range(sweeps):
        for i in range(MU.size):
            dev = x - MU  # (n, 6)
            # conditional mean/sd of coord i given the rest
            m = MU[i] - (_matvec_cols(dev, prec[i]) - prec[i, i] * dev[:, i]) / prec[i, i]
            sd = 1.0 / np.sqrt(prec[i, i] * w)
            lo = _norm_cdf((-BOUND - m) / sd)
            hi = _norm_cdf((BOUND - m) / sd)
            u = lo + (hi - lo) * rng.random(n)
            x[:, i] = np.clip(m + sd * _norm_ppf(u), -BOUND, BOUND)
    return x


def with_portfolio(samples: np.ndarray) -> np.ndarray:
    """Append the weighted portfolio column (psd.R:21-24)."""
    w = np.asarray(DEFAULT_CONFIG.weights)
    return np.hstack([samples, _matvec_cols(samples, w)[:, None]])


def population_measures(xs: np.ndarray) -> dict[str, float]:
    """The six population statistics of one series (psd.R:29-68),
    folded in ascending order like the engine's measure library."""
    s = np.sort(xs.astype(np.float64))
    n = s.size
    mean = float(np.add.reduce(s) / n)  # ascending fold
    median = float((s[n // 2 - 1] + s[n // 2]) / 2) if n % 2 == 0 else float(s[n // 2])
    q10 = float(s[n // 10])
    k = max(n // 10, 1)
    tail_mean = float(np.add.reduce(s[:k]) / k)
    sm1 = mean - float(np.add.reduce(np.abs(s - mean))) / (2 * n)
    i = np.arange(1, n + 1, dtype=np.float64)
    # Σᵢ(2i−n−1)·x₍ᵢ₎ = ΣΣ|xi−xj| / 2 (sorted Gini identity)
    half_gini = float(np.add.reduce((2 * i - n - 1) * s))
    sm2 = mean - half_gini / (n * n)  # = mean − ΣΣ/(2n²), the Java form
    return dict(
        mean=mean, median=median, q10=q10, tail_mean=tail_mean, sm1=sm1, sm2=sm2
    )


def stats_table(
    samples7: np.ndarray, variant: str = "consistent"
) -> list[tuple[str, int, float]]:
    """F2 threshold rows (measure, series 0-6, ref_value)."""
    rows: list[tuple[str, int, float]] = []
    for series in range(samples7.shape[1]):
        m = population_measures(samples7[:, series])
        if variant == "reference_bug":
            # The shipped threshold artifact (dataGeneration/stats.csv
            # row 6 ≈ −0.0666) equals mean − gmd with
            # gmd = ΣΣ|xi−xj| / (n(n−1)) — a different scale from the
            # windowed Java measure mean − ΣΣ/(2n²) ≈ mean − gmd/2, so
            # the measure sits *above* the threshold and SM2 alerts
            # almost never fire (countings.txt rows 36-42). This
            # variant reproduces that artifact for bug-compat tests.
            s = np.sort(samples7[:, series].astype(np.float64))
            n = s.size
            i = np.arange(1, n + 1, dtype=np.float64)
            half_gini = float(np.add.reduce((2 * i - n - 1) * s))
            m["sm2"] = m["mean"] - 2 * half_gini / (n * (n - 1))
        for name, value in m.items():
            rows.append((name, series, float(value)))
    return rows
