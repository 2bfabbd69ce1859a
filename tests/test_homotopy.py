"""Native LARS/homotopy tests: KKT-exact LASSO solutions, the exact
||Ax-b|| = delta crossing for basis-pursuit denoising (the role ECOS
played for the reference, src/basispursuit.jl:83-99), and cross-checks
against the XLA first-order solvers."""

import jax
import numpy as np
import pytest

from cstpu import bpd, ista, perturb, sparse_data, support
from cstpu.native import (HomotopyError, bpd_homotopy, lasso_homotopy,
                          lasso_homotopy_batch)


def _problem(seed, n=32, m=48, k=3):
    A, x, b = sparse_data(jax.random.PRNGKey(seed), n=n, m=m, k=k)
    return np.asarray(A, np.float64), np.asarray(x), np.asarray(b)


def _lasso_kkt_gap(A, b, x, lam, w):
    """Max KKT violation of the weighted LASSO at x."""
    c = A.T @ (b - A @ x)
    gap = 0.0
    for j in range(A.shape[1]):
        if x[j] != 0.0:
            gap = max(gap, abs(c[j] - lam * w[j] * np.sign(x[j])))
        else:
            gap = max(gap, max(abs(c[j]) - lam * w[j], 0.0))
    return gap


def test_lasso_kkt_exact():
    A, x, b = _problem(90)
    lam = 0.05
    xs = lasso_homotopy(A, b, lam)
    w = np.ones(A.shape[1])
    assert _lasso_kkt_gap(A, b, xs, lam, w) < 1e-10
    assert sorted(np.flatnonzero(xs)) == list(support(x))


def test_lasso_weighted_kkt_exact():
    A, x, b = _problem(91)
    rng = np.random.default_rng(0)
    w = 0.5 + rng.random(A.shape[1])
    lam = 0.03
    xs = lasso_homotopy(A, b, lam, w=w)
    assert _lasso_kkt_gap(A, b, xs, lam, w) < 1e-10


def test_lasso_matches_ista_objective():
    A, x, b = _problem(92)
    lam = 0.05
    xs = lasso_homotopy(A, b, lam)
    xi = np.asarray(ista(A, b, lam, maxiter=20000, stepsize=1e-2))

    def obj(z):
        return 0.5 * np.sum((A @ z - b) ** 2) + lam * np.sum(np.abs(z))

    # the exact path solution can only be better, and close (ISTA at the
    # reference's fixed stepsize converges to ~1e-3 in objective)
    assert obj(xs) <= obj(xi) + 1e-8
    assert abs(obj(xs) - obj(xi)) < 5e-3


def test_bpd_homotopy_exact_crossing():
    A, x, b = _problem(93)
    y = np.asarray(perturb(jax.random.PRNGKey(5), b, 1e-2 / 2))
    delta = 1e-2
    xs, lam = bpd_homotopy(A, y, delta)
    # the residual ends exactly on the delta sphere (path-segment root)
    assert abs(np.linalg.norm(A @ xs - y) - delta) < 1e-10
    assert lam > 0
    assert sorted(np.flatnonzero(xs)) == list(support(x))


def test_bpd_homotopy_zero_when_feasible():
    A, x, b = _problem(94)
    xs, lam = bpd_homotopy(A, b, delta=2.0 * np.linalg.norm(b))
    assert np.all(xs == 0)


def test_bpd_method_homotopy_dispatch():
    A, x, b = _problem(95)
    y = np.asarray(perturb(jax.random.PRNGKey(6), b, 1e-2 / 2))
    xs = np.asarray(bpd(A, y, 1e-2, method="homotopy"))
    xa = np.asarray(bpd(A, y, 1e-2))  # ADMM path
    assert sorted(np.flatnonzero(np.abs(xs) > 0)) == list(support(x))
    # first-order solution agrees to its tolerance
    np.testing.assert_allclose(xs, np.where(np.abs(xa) > 1e-5, xa, 0.0),
                               atol=5e-3)


def test_bpd_homotopy_noiseless_bp_limit():
    # delta -> 0 recovers the exact sparse solution on noiseless data
    A, x, b = _problem(96)
    xs, _ = bpd_homotopy(A, b, delta=1e-10)
    np.testing.assert_allclose(xs, np.asarray(x), atol=1e-7)


def test_bpd_candes_homotopy_inner_solver():
    # reweighted BPD with the exact native inner solver: every re-solve
    # is solver-exact, mirroring the reference's reweighting through ECOS
    from cstpu import bpd_candes

    A, x, b = _problem(98)
    y = np.asarray(perturb(jax.random.PRNGKey(7), b, 1e-2 / 2))
    xs = np.asarray(bpd_candes(A, y, 1e-2, method="homotopy"))
    assert sorted(np.flatnonzero(xs)) == list(support(x))
    np.testing.assert_allclose(xs[np.flatnonzero(xs)],
                               np.asarray(x)[list(support(x))], atol=2e-2)


def test_batch_matches_sequential():
    from cstpu.native import bpd_homotopy_batch, lasso_homotopy_batch

    A, x, b = _problem(99)
    y = np.asarray(perturb(jax.random.PRNGKey(9), b, 1e-2 / 2))
    Bs = np.stack([np.asarray(b), y, 2.0 * np.asarray(b)])

    X, st = lasso_homotopy_batch(A, Bs, 0.05, n_threads=3)
    assert list(st) == [0, 0, 0]
    for i in range(3):
        np.testing.assert_array_equal(X[i], lasso_homotopy(A, Bs[i], 0.05))

    Xd, lams, std = bpd_homotopy_batch(A, Bs, 1e-2, n_threads=2)
    assert list(std) == [0, 0, 0]
    for i in range(3):
        xi, li = bpd_homotopy(A, Bs[i], 1e-2)
        np.testing.assert_array_equal(Xd[i], xi)
        assert lams[i] == li


def test_batch_per_instance_status():
    # an infeasible instance is flagged, not aborting the batch
    from cstpu.native import bpd_homotopy_batch

    rng = np.random.default_rng(4)
    A = rng.standard_normal((40, 8))
    good = A @ rng.standard_normal(8)          # reachable (in range(A))
    bad = rng.standard_normal(40)              # LS residual >> delta
    X, lams, st = bpd_homotopy_batch(A, np.stack([good, bad]), 1e-6)
    assert st[0] == 0 and st[1] == 4
    assert np.linalg.norm(A @ X[0] - good) <= 1e-6 + 1e-9


def test_homotopy_rejects_bad_weights():
    A, x, b = _problem(97)
    with pytest.raises(HomotopyError):
        lasso_homotopy(A, b, 0.1, w=np.zeros(A.shape[1]))


def test_batch_rejects_wrong_length_weights():
    # the batch path must validate w BEFORE handing it to C (a short
    # buffer would be read out of bounds by the native weight check)
    A, x, b = _problem(98)
    with pytest.raises(ValueError, match="weights"):
        lasso_homotopy_batch(A, np.stack([b, b]), 0.1,
                             w=np.ones(A.shape[1] - 1))


def test_bpd_homotopy_infeasible_delta():
    # overdetermined system whose LS residual exceeds delta: the
    # constraint is unreachable and must be reported as such
    rng = np.random.default_rng(3)
    A = rng.standard_normal((40, 8))
    b = rng.standard_normal(40)
    with pytest.raises(HomotopyError, match="unreachable"):
        bpd_homotopy(A, b, delta=1e-8)


def test_lasso_kkt_twin_atom_degenerate_path():
    # NOTE: generation bypasses conftest.planted_problem — the keys pin
    # fuzz trial 4035 verbatim. Pre-fix the path walker ended with a
    # stale sign on a twin-atom pair (|corr| 0.964): a zero-crossing
    # that tied with a join event slipped past the leave scan and the
    # returned x carried a 2*lam KKT violation on atom 115; the terminal
    # active-set repair (_kkt_repair) now restores exact stationarity.
    import jax
    import jax.numpy as jnp

    from cstpu import correlated_data, perturb

    A, _, b = correlated_data(jax.random.PRNGKey(1591874361), n=32, m=128,
                              k=3, decay=1.0, dtype=jnp.float32)
    b = perturb(jax.random.PRNGKey(4035 + 10**6), b, 5e-3)
    lam = 0.0020368724085016348
    An, yn = np.asarray(A, np.float64), np.asarray(b, np.float64)
    xs = lasso_homotopy(An, yn, lam)
    assert _lasso_kkt_gap(An, yn, xs, lam, np.ones(128)) < 1e-10


def _fuzz_bpd_draw(trial):
    """Replays benchmarks/fuzz.py's _problem + delta draw for a trial."""
    import jax
    import jax.numpy as jnp

    from cstpu import correlated_data, perturb, sparse_data

    rng = np.random.default_rng(trial)
    shapes = [(32, 128), (64, 128), (64, 256), (32, 48)]
    n, m = shapes[rng.integers(len(shapes))]
    k = int(rng.integers(1, 7))
    correlated = bool(rng.integers(2))
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    if correlated:
        A, x, b = correlated_data(key, n=n, m=m, k=k, decay=1.0,
                                  dtype=jnp.float32)
    else:
        A, x, b = sparse_data(key, n=n, m=m, k=k, dtype=jnp.float32)
    if rng.integers(2):
        b = perturb(jax.random.PRNGKey(trial + 10**6), b, 5e-3)
    delta = float(10 ** rng.uniform(-2.3, -1.5))
    return np.asarray(A, np.float64), np.asarray(b, np.float64), delta


def test_bpd_terminal_polish_corrupted_lambda():
    # fuzz trials 165 + 251 (r5): a twin-atom stale sign corrupts the
    # walker's terminal lambda, so the plain KKT repair lands OFF the
    # ball (165: 1.0001x outside; 251: 0.847x inside with the "exact"
    # objective ABOVE a feasible first-order solve). The terminal
    # lambda-secant polish must restore the exact delta crossing AND
    # path optimality.
    from cstpu.native import bpd_homotopy

    for trial in (165, 251):
        A64, y64, delta = _fuzz_bpd_draw(trial)
        xh, lam = bpd_homotopy(A64, y64, delta)
        rho = float(np.linalg.norm(A64 @ xh - y64))
        assert abs(rho - delta) <= 1e-9 * delta + 1e-12, (trial, rho)
        assert lam > 0
        # KKT at the returned lambda: the point is the exact LASSO
        # solution there (stationarity to rounding)
        c = A64.T @ (y64 - A64 @ xh)
        on = xh != 0
        assert np.max(np.abs(c[on] - lam * np.sign(xh[on]))) <= 1e-7 * lam
        assert np.max(np.abs(c[~on])) <= lam * (1 + 1e-7)
