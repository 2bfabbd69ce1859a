"""Native C++ simplex tests: exactness, LP sanity, and cross-check of the
XLA-native ADMM basis-pursuit solver against the exact vertex solution
(the role Clp played for the reference)."""

import jax
import numpy as np
import pytest

from cstpu import bp, sparse_data, support
from cstpu.native import simplex_solve, bp_simplex, SimplexError


def test_simplex_known_lp():
    A = np.array([[1.0, 2.0], [3.0, 2.0]])
    b = np.array([4.0, 8.0])
    c = np.array([1.0, 1.0])
    x, obj = simplex_solve(A, b, c)
    np.testing.assert_allclose(x, [2.0, 1.0], atol=1e-10)
    assert abs(obj - 3.0) < 1e-10


def test_simplex_infeasible():
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    b = np.array([1.0, 2.0])  # inconsistent
    c = np.array([1.0, 1.0])
    with pytest.raises(SimplexError):
        simplex_solve(A, b, c)


def test_simplex_negative_rhs():
    # min x1 s.t. -x1 = -3 → x1 = 3 (row sign normalization path)
    A = np.array([[-1.0, 0.0]])
    b = np.array([-3.0])
    c = np.array([1.0, 5.0])
    x, obj = simplex_solve(A, b, c)
    np.testing.assert_allclose(x, [3.0, 0.0], atol=1e-10)
    assert abs(obj - 3.0) < 1e-10  # sign normalization must not hit obj


def test_bp_simplex_exact_recovery():
    A, x, b = sparse_data(jax.random.PRNGKey(80), n=32, m=48, k=3)
    xs = bp_simplex(np.asarray(A), np.asarray(b))
    assert list(np.flatnonzero(np.abs(xs) > 1e-9)) == list(support(x))
    np.testing.assert_allclose(np.asarray(A) @ xs, np.asarray(b), atol=1e-10)


def test_bp_admm_matches_simplex():
    # ADMM first-order solution must identify the same support and nearly
    # the same objective as the exact vertex solution
    A, x, b = sparse_data(jax.random.PRNGKey(81), n=32, m=48, k=3)
    x_admm = np.asarray(bp(A, b))
    x_sx = np.asarray(bp(A, b, method="simplex"))
    s_admm = np.flatnonzero(np.abs(x_admm) > 1e-5)
    s_sx = np.flatnonzero(np.abs(x_sx) > 1e-9)
    assert list(s_admm) == list(s_sx)
    assert abs(np.abs(x_admm).sum() - np.abs(x_sx).sum()) < 1e-4


def test_bp_simplex_weighted():
    # heavy weights off the true support force the sparse solution
    A, x, b = sparse_data(jax.random.PRNGKey(82), n=32, m=48, k=3)
    w = np.full(48, 10.0)
    w[support(x)] = 1.0
    xs = bp_simplex(np.asarray(A), np.asarray(b), w)
    assert list(np.flatnonzero(np.abs(xs) > 1e-9)) == list(support(x))


def test_lasso_homotopy_tied_joins():
    # atoms whose correlations tie at the same event lambda must ALL join
    # the path (consecutive zero-length steps); before the fix only one
    # joined and lasso(eye(2), [1,1], 0.25) returned [0.75, 0] — a silent
    # KKT violation (|c_1| = 1 >> lambda = 0.25)
    from cstpu.native import lasso_homotopy

    x = lasso_homotopy(np.eye(2), np.array([1.0, 1.0]), 0.25)
    np.testing.assert_allclose(x, [0.75, 0.75], atol=1e-12)
    x4 = lasso_homotopy(np.eye(4), np.ones(4), 0.5)
    np.testing.assert_allclose(x4, 0.5, atol=1e-12)


def test_bpd_homotopy_tied_joins_feasible():
    # the same tie previously walked the path to lambda == 0 without a
    # delta crossing and raised "target unreachable" for a plainly
    # feasible delta
    from cstpu.native import bpd_homotopy

    x, lam = bpd_homotopy(np.eye(2), np.array([1.0, 1.0]), 0.5)
    assert np.linalg.norm(x - 1.0) <= 0.5 + 1e-9
    np.testing.assert_allclose(x[0], x[1], atol=1e-12)


def test_bp_simplex_redundant_rows():
    # a consistent LP with linearly dependent rows leaves a zero-level
    # artificial basic after Phase 1 with no drive-out pivot; its Phase-2
    # cost must be 0 (its level is structurally forced to 0), not big-M —
    # the big-M in cB poisoned the dual vector and reported feasible
    # bounded problems unbounded
    for t in range(3):
        A, x, b = sparse_data(jax.random.PRNGKey(90 + t), n=32, m=48, k=3)
        A = np.asarray(A)
        b = np.asarray(b)
        A2 = np.vstack([A, A[0] - 2.0 * A[3], A[1]])
        b2 = np.concatenate([b, [b[0] - 2.0 * b[3]], [b[1]]])
        xs = bp_simplex(A2, b2)
        np.testing.assert_allclose(A2 @ xs, b2, atol=1e-7)
        assert list(np.flatnonzero(np.abs(xs) > 1e-7)) == list(support(x))


def test_bp_simplex_degenerate_correlated_terminates():
    # NOTE: generation bypasses conftest.planted_problem — the key pins
    # fuzz trial 3336's problem verbatim. Pre-fix the raw LP livelocked
    # (1e6 iterations, no termination): at cond ~2e5 the basis solves'
    # round-off pushed xB slightly negative, the ratio test went
    # negative, and Bland's anti-cycling premise broke. The wrapper now
    # row-whitens the equality constraints and the ratio test clamps
    # round-off negatives to degenerate zeros.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cstpu import correlated_data, perturb
    from cstpu.native import bp_simplex, lasso_homotopy

    A, x, b = correlated_data(jax.random.PRNGKey(1253297724), n=32, m=128,
                              k=1, decay=1.0, dtype=jnp.float32)
    b = perturb(jax.random.PRNGKey(3336 + 10**6), b, 5e-3)
    A64, y64 = np.asarray(A, np.float64), np.asarray(b, np.float64)
    xs = bp_simplex(A64, y64)          # pre-fix: HomotopyError/iter limit
    assert np.linalg.norm(A64 @ xs - y64) < 1e-9
    # LP weak duality with the l-inf dual bound: any feasible y' with
    # ||A'y'||_inf <= 1 certifies obj >= y'b; the exact vertex must
    # dominate every such certificate (here: the scaled LS dual)
    yd = np.linalg.lstsq(A64.T, np.sign(xs), rcond=None)[0]
    yd = yd / max(1.0, np.max(np.abs(A64.T @ yd)))
    assert np.abs(xs).sum() >= yd @ y64 - 1e-8
