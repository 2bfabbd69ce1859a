"""Conformance tests for MP/OMP/GOMP/oblivious.
Oracles: /root/reference/test/matchingpursuit.jl (seeded here)."""

import jax
import numpy as np

from cstpu import mp, omp, gomp, oblivious, sparse_data, perturb, support

DELTA = 1e-2


def _problem(seed, n=32, m=48, k=3):
    from conftest import planted_problem

    return planted_problem(seed, n=n, m=m, k=k, noise=DELTA / 2)


def test_mp():
    # oracle: test/matchingpursuit.jl:16-18 (10k iterations, atol 3*delta)
    A, x, b, _ = _problem(0)
    xmp = mp(A, b, 30)
    np.testing.assert_allclose(np.asarray(A @ xmp), np.asarray(b),
                               atol=3 * DELTA)
    np.testing.assert_allclose(np.asarray(xmp), np.asarray(x), atol=3 * DELTA)


def test_omp_noiseless():
    A, x, b, _ = _problem(1)
    sol = omp(A, b, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)


def test_omp_noisy():
    A, x, _, y = _problem(2)
    sol = omp(A, y, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=2 * DELTA)


def test_omp_epsilon_stopping():
    # with a large tolerance the solver must stop before adding k atoms
    A, x, b, _ = _problem(3)
    sol = omp(A, b, 10, max_residual=1e-12)
    # exactly 3: the noiseless 3-sparse fit needs all planted atoms
    # before the residual can hit ~0 (a <= would pass an empty solution)
    assert sol.nnz == 3
    sol_loose = omp(A, b, 10, max_residual=10.0)
    assert sol_loose.nnz <= 1


def test_gomp():
    # oracle: test/matchingpursuit.jl:33-45 (l = 2)
    A, x, b, y = _problem(4)
    sol = gomp(A, b, 2, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               rtol=1e-8)
    sol = gomp(A, y, 2, 3)
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.nzval, np.asarray(x)[support(x)],
                               atol=2 * DELTA)


def test_oblivious_well_separated():
    # oblivious thresholding recovers when correlations are unambiguous
    A, x, b, _ = _problem(5, n=64, m=96, k=2)
    sol = oblivious(A, b, 2)
    assert list(sol.nzind) == list(support(x))
    # LS fit on the recovered support is the exact projection
    r = np.asarray(b) - np.asarray(A) @ np.asarray(sol.todense())
    assert np.linalg.norm(r) < 1e-6


def test_omp_batched_vmap():
    # batched-first: vmap over measurement batches reproduces per-instance runs
    A, x, b, y = _problem(6)
    B = jax.numpy.stack([b, y])
    sols = jax.vmap(lambda bb: omp(A, bb, 3).todense())(B)
    s0 = omp(A, b, 3).todense()
    s1 = omp(A, y, 3).todense()
    np.testing.assert_allclose(np.asarray(sols[0]), np.asarray(s0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sols[1]), np.asarray(s1), rtol=1e-12)
