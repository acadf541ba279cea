"""LSH (b, r) parameter tuning.

Same objective as the reference's grid search
(``datasketch/lsh.py:21-48``): minimize
``w_fp * ∫₀ᵗ P(s) ds + w_fn * ∫ₜ¹ (1 - P(s)) ds`` with
``P(s) = 1 - (1 - s^r)^b``, over all (b, r) with b*r ≤ num_perm.

The reference integrates with ``scipy.integrate.quad``; scipy is absent
here, so we use composite Simpson on a fixed fine grid — validated in
tests to reproduce the reference's published optima:
thr 0.9 → (5, 25) (doc anchor ``datasketch/lsh.py:98-100``),
thr 0.8 → (9, 13), thr 0.5 → (25, 5).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_GRID = 1024  # Simpson intervals per integral; plenty for smooth integrands


def _integrate(f, lo: float, hi: float) -> float:
    if hi <= lo:
        return 0.0
    n = _GRID
    x = np.linspace(lo, hi, n + 1)
    y = f(x)
    h = (hi - lo) / n
    # composite Simpson (n is even)
    return float(h / 3.0 * (y[0] + y[-1] + 4.0 * y[1:-1:2].sum() + 2.0 * y[2:-1:2].sum()))


def _false_positive_area(threshold: float, b: int, r: int) -> float:
    return _integrate(lambda s: 1.0 - (1.0 - s ** float(r)) ** float(b), 0.0, threshold)


def _false_negative_area(threshold: float, b: int, r: int) -> float:
    return _integrate(lambda s: (1.0 - s ** float(r)) ** float(b), threshold, 1.0)


@lru_cache(maxsize=None)
def optimal_param(
    threshold: float,
    num_perm: int = 128,
    false_positive_weight: float = 0.5,
    false_negative_weight: float = 0.5,
) -> tuple[int, int]:
    """Grid-search the (b, r) minimizing the weighted error (reference
    ``datasketch/lsh.py:35-48``). Driver-side, cached."""
    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, num_perm + 1):
        for r in range(1, num_perm // b + 1):
            err = false_positive_weight * _false_positive_area(
                threshold, b, r
            ) + false_negative_weight * _false_negative_area(threshold, b, r)
            if err < min_error:
                min_error = err
                opt = (b, r)
    return opt
