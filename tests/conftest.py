"""Shared fixtures: one Ray session per pytest run; reference import shim.

The reference library (read-only at /root/reference) is used as the
conformance oracle in several tests. It imports scipy
(``datasketch/lsh.py:8``), which this environment lacks, so a minimal
stub providing ``scipy.integrate.quad`` (numpy Simpson quadrature) and a
bare ``scipy.sparse`` namespace is installed before import.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


def _install_scipy_stub() -> None:
    if "scipy" in sys.modules:
        return

    def quad(f, lo, hi, **kw):
        if hi <= lo:
            return 0.0, 0.0
        n = 1024
        x = np.linspace(lo, hi, n + 1)
        y = np.array([f(v) for v in x])
        h = (hi - lo) / n
        val = h / 3.0 * (y[0] + y[-1] + 4.0 * y[1:-1:2].sum() + 2.0 * y[2:-1:2].sum())
        return float(val), 0.0

    scipy = types.ModuleType("scipy")
    integrate = types.ModuleType("scipy.integrate")
    integrate.quad = quad
    sparse = types.ModuleType("scipy.sparse")

    class _NoSparse:  # placeholder so isinstance checks fail cleanly
        pass

    sparse.spmatrix = _NoSparse
    sparse.issparse = lambda x: False
    scipy.integrate = integrate
    scipy.sparse = sparse
    sys.modules["scipy"] = scipy
    sys.modules["scipy.integrate"] = integrate
    sys.modules["scipy.sparse"] = sparse


_install_scipy_stub()
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from raydedup.stages.grouped import ensure_hash_shuffle

    ensure_hash_shuffle()  # clamp shuffle parallelism to the session CPUs
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def reference_datasketch():
    """The reference library, imported with the scipy stub in place."""
    import datasketch

    assert datasketch.__file__.startswith("/root/reference")
    return datasketch
