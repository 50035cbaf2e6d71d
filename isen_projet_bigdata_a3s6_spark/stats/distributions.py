"""Distribution tail functions for p-values (scipy is not in the image).

Pure-Python implementations of the regularized incomplete gamma/beta
functions from the standard numerical-methods literature (Lentz's continued
fractions + series expansions — public textbook algorithms), giving:

- ``chi2_sf(x, k)``   — chi-square survival function (M3 p-values)
- ``f_sf(x, d1, d2)`` — F-distribution survival function (M5 ANOVA p-values)
- ``t_sf(x, df)``     — Student-t survival function (M4/M6 coefficient tests)

These run driver-side on a handful of aggregate scalars — never inside a
Spark task — so plain Python is the right tool.
"""

from __future__ import annotations

import math

_EPS = 3e-15
_FPMIN = 1e-300


def _gammainc_lower_series(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a,x) by series (x < a+1)."""
    if x <= 0:
        return 0.0
    ap = a
    total = term = 1.0 / a
    for _ in range(500):
        ap += 1.0
        term *= x / ap
        total += term
        if abs(term) < abs(total) * _EPS:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gammainc_upper_cf(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a,x) by continued fraction (x ≥ a+1)."""
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_p domain")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        return _gammainc_lower_series(a, x)
    return 1.0 - _gammainc_upper_cf(a, x)


def chi2_sf(x: float, k: float) -> float:
    """P[Chi2(k) > x]."""
    if x <= 0:
        return 1.0
    if x < k + 1.0:
        return 1.0 - _gammainc_lower_series(k / 2.0, x / 2.0)
    return _gammainc_upper_cf(k / 2.0, x / 2.0)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, 500):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def f_sf(x: float, d1: float, d2: float) -> float:
    """P[F(d1, d2) > x]."""
    if x <= 0:
        return 1.0
    return betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * x))


def t_sf(x: float, df: float) -> float:
    """P[T(df) > x] (one-sided)."""
    p = 0.5 * betainc(df / 2.0, 0.5, df / (df + x * x))
    return p if x >= 0 else 1.0 - p
