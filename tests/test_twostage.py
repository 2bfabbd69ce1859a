"""Conformance tests for SRR / Subspace Pursuit / OMPR.
Oracles: /root/reference/test/twostage.jl (seeded here)."""

import jax
import numpy as np

from cstpu import srr, sp, ompr, sparse_data, sparse_vector, perturb, support

DELTA = 1e-2


def _problem(seed, n=32, m=64, k=3):
    from conftest import planted_problem

    return planted_problem(seed, n=n, m=m, k=k, noise=DELTA / 2)


def test_srr_noiseless():
    A, x, b, _ = _problem(30)
    sol = srr(A, b, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)


def test_srr_noisy():
    A, x, _, y = _problem(31)
    sol = srr(A, y, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=3 * DELTA)


def test_srr_k1_special_case():
    # oracle: test/twostage.jl:23-26
    A, _, _, _ = _problem(32)
    x1 = sparse_vector(jax.random.PRNGKey(33), 64, 1)
    sol = srr(A, A @ x1, 1)
    assert list(sol.nzind) == list(support(x1))
    np.testing.assert_allclose(sol.nzval, np.asarray(x1)[support(x1)],
                               rtol=1e-8)


def test_srr_lstep():
    # oracle: test/twostage.jl:28-38 (l = k variant)
    A, x, b, y = _problem(34)
    sol = srr(A, b, 3, l=3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)
    sol = srr(A, y, 3, l=3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=3 * DELTA)


def test_srr_initializations():
    A, x, b, _ = _problem(35)
    for init in (1, 2, 3):
        sol = srr(A, b, 3, initialization=init,
                  key=jax.random.PRNGKey(99))
        assert list(sol.nzind) == list(support(x))


def test_sp():
    A, x, b, y = _problem(36)
    sol = sp(A, b, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)
    sol = sp(A, y, 3, DELTA)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=3 * DELTA)


def test_sp_guard():
    A, _, b, _ = _problem(37)
    import pytest
    with pytest.raises(ValueError):
        sp(A, b, 20)  # 2k > n


def test_ompr():
    A, x, b, y = _problem(38)
    sol = ompr(A, b, 3, 1e-6)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)
    sol = ompr(A, y, 3, DELTA)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=3 * DELTA)
