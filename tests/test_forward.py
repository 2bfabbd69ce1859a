"""Conformance tests for forward regression and FoBa.
Oracles: /root/reference/test/forward.jl (seeded here)."""

import jax
import numpy as np

from cstpu import fr, foba, sparse_data, perturb, support
from cstpu.models.forward import fr_warm

DELTA = 1e-2


def _problem(seed, n=32, m=48, k=3):
    from conftest import planted_problem

    return planted_problem(seed, n=n, m=m, k=k, noise=DELTA)


def test_fr_noiseless():
    A, x, b, _ = _problem(10)
    sol = fr(A, b, sparsity=3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)


def test_fr_noisy():
    A, x, _, y = _problem(11)
    sol = fr(A, y, sparsity=3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=2 * DELTA)


def test_fr_warm_start():
    # oracle: test/forward.jl:24-28 — restricted LS on a given support
    A, x, _, y = _problem(12)
    sol = fr_warm(A, y, [0, 1, 2])
    assert list(sol.nzind) == [0, 1, 2]
    ref = np.linalg.lstsq(np.asarray(A)[:, [0, 1, 2]], np.asarray(y),
                          rcond=None)[0]
    np.testing.assert_allclose(sol.nzval, ref, rtol=1e-10)


def test_fr_stopping_criteria():
    A, x, b, _ = _problem(13)
    # max_residual reached before sparsity cap
    sol = fr(A, b, max_residual=1e-10, sparsity=10)
    assert sol.nnz == 3  # noiseless 3-sparse: all planted atoms needed before resid ~0
    # min_decrease: a huge threshold prevents any selection
    sol = fr(A, b, min_decrease=1e6, sparsity=10)
    assert sol.nnz == 0


def test_fr_aliases():
    # reference exports five aliases for FR (src/forward.jl:13-18)
    import cstpu

    for name in ("ols", "oomp", "ormp", "stepwise_regression"):
        assert getattr(cstpu, name) is fr


def test_foba():
    A, x, _, y = _problem(14)
    sol = foba(A, y, DELTA)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=2 * DELTA)


def test_foba_noiseless():
    A, x, b, _ = _problem(15, n=32, m=64)
    sol = foba(A, b, DELTA)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)
