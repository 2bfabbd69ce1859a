"""Fused backward-elimination kernel (FBR/LACE): interpret-mode
equivalence with the XLA path and the reference's backward oracles
(/root/reference/test/backward.jl — square system, three equivalent
stopping criteria)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstpu import fbr, lace, sparse_data, perturb, support
from cstpu.ops.fused_backward import fbr_fused_solve, lace_fused_solve

DELTA = 1e-2


def _problem(seed, n=32, m=None, k=3):
    from conftest import planted_problem

    return planted_problem(seed, n=n, m=n if m is None else m, k=k,
                           noise=DELTA / 2, dtype=jnp.float32)


def _assert_matches(sol, ref_sols, atol=1e-3):
    B = sol.idx.shape[0]
    dense_all = np.asarray(jax.vmap(lambda s: s.todense())(sol))
    for i in range(B):
        got = np.asarray(sol.idx[i])[np.asarray(sol.mask[i])]
        ref = ref_sols[i]
        np.testing.assert_array_equal(np.sort(got), ref.nzind)
        rdense = np.zeros_like(dense_all[i])
        rdense[ref.nzind] = ref.nzval
        np.testing.assert_allclose(dense_all[i], rdense, atol=atol)


def test_fbr_fused_matches_xla_sparsity():
    A, x, b, y = _problem(310)
    Bs = jnp.stack([b, y, 2.0 * b, b - 0.1 * y])
    sol, failed = fbr_fused_solve(A, Bs, sparsity=3, interpret=True)
    ref = [fbr(A, bb, sparsity=3) for bb in Bs]
    _assert_matches(sol, ref)
    assert not np.any(np.asarray(failed))


def test_fbr_fused_exact_support_recovery():
    A, x, b, y = _problem(311)
    sol, _ = fbr_fused_solve(A, y[None, :], sparsity=3, interpret=True)
    got = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    np.testing.assert_array_equal(np.sort(got), support(x))


@pytest.mark.parametrize("crit", ["max_residual", "max_increase"])
def test_fbr_fused_threshold_stopping(crit):
    # the reference tests BR/FBR under sparsity, max_residual and
    # max_increase as equivalent criteria (test/backward.jl:16-26,44-55)
    A, x, b, y = _problem(312)
    sol, _ = fbr_fused_solve(A, y[None, :], **{crit: DELTA},
                             interpret=True)
    ref = [fbr(A, y, **{crit: DELTA})]
    _assert_matches(sol, ref)
    got = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    np.testing.assert_array_equal(np.sort(got), support(x))


def test_lace_fused_matches_xla():
    A, x, b, y = _problem(313, n=48, m=32)
    Bs = jnp.stack([b, y])
    sol, _ = lace_fused_solve(A, Bs, sparsity=3, interpret=True)
    ref = [lace(A, bb, sparsity=3) for bb in Bs]
    _assert_matches(sol, ref)


def test_lace_fused_max_residual():
    A, x, b, y = _problem(314, n=48, m=32)
    sol, _ = lace_fused_solve(A, y[None, :], max_residual=DELTA,
                           interpret=True)
    got = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    np.testing.assert_array_equal(np.sort(got), support(x))


def test_fbr_fused_sparsity_zero_deletes_all():
    # with unbounded thresholds and sparsity=0 every atom is deleted
    A, x, b, y = _problem(315, n=16, m=16, k=2)
    sol, failed = fbr_fused_solve(A, b[None, :], sparsity=0,
                                  interpret=True)
    assert int(np.sum(np.asarray(sol.mask))) == 0
    assert not bool(np.asarray(failed)[0])


def test_fbr_batch_return_failed():
    from cstpu import fbr_batch

    A, x, b, y = _problem(318)
    sol, failed = fbr_batch(A, jnp.stack([b, y]), sparsity=3,
                            return_failed=True)
    assert failed.shape == (2,)
    assert not np.any(np.asarray(failed))


def test_fbr_fused_batch_heterogeneous_stops():
    # instances stopping at different deletion counts must not interfere
    A, x, b, y = _problem(316)
    A2, x2, b2, y2 = _problem(317, k=5)
    sol, _ = fbr_fused_solve(A, jnp.stack([y, b2]), max_increase=DELTA,
                             interpret=True)
    ref = [fbr(A, y, max_increase=DELTA), fbr(A, b2, max_increase=DELTA)]
    _assert_matches(sol, ref)


def test_fbr_fused_nan_init_sets_failed():
    # a rank-deficient Gram (duplicated column, m <= n still) NaNs the
    # shared Cholesky init; the kernel's failure flag must latch instead
    # of reporting success over all-NaN output (the accept predicate is
    # written as a negated >= so NaN comparisons fail toward `failed`)
    key = jax.random.PRNGKey(400)
    A0 = jax.random.normal(key, (48, 31), jnp.float32)
    A = jnp.concatenate([A0, A0[:, :1]], axis=1)  # col 31 == col 0
    A = A / jnp.linalg.norm(A, axis=0, keepdims=True)
    b = A[:, 0] + A[:, 5]
    _, failed = fbr_fused_solve(A, b[None, :], sparsity=3, interpret=True)
    assert bool(failed[0])


def test_fbr_refit_discards_downdate_drift_fuzz20099():
    # fuzz trial 20099 (r5 broad band): after ~125 f32 Schur downdates
    # the fused and XLA FBR paths returned the SAME support with
    # coefficients drifted ~1e-3 in different directions (residuals
    # diverged up to 2.4x delta-scale). Both paths now end with an
    # exact masked normal-equation refit, so same support => same
    # residual to solver rounding. Replays the fuzz draw verbatim.
    import numpy as np
    import jax
    import jax.numpy as jnp

    import cstpu
    from cstpu.models import batched
    from cstpu.ops import fused_backward as fb

    trial = 20099
    rng = np.random.default_rng(trial)
    # benchmarks/fuzz.py _problem + check_fused_vs_xla RNG sequence
    shapes = [(32, 128), (64, 128), (64, 256), (32, 48)]
    n0, m0 = shapes[rng.integers(len(shapes))]
    k = int(rng.integers(1, 7))
    correlated = bool(rng.integers(2))
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    gen = cstpu.correlated_data if correlated else cstpu.sparse_data
    kwargs = {"decay": 1.0} if correlated else {}
    A0, x0, b0 = gen(key, n=n0, m=m0, k=k, dtype=jnp.float32, **kwargs)
    if rng.integers(2):
        b0 = cstpu.perturb(jax.random.PRNGKey(trial + 10**6), b0, 5e-3)
    keys = jax.random.split(jax.random.PRNGKey(int(rng.integers(2**31))), 8)
    _ = jnp.stack([b0] + [cstpu.perturb(kk, b0, 1e-2) for kk in keys[:7]])
    key2 = jax.random.PRNGKey(int(rng.integers(2**31)))
    A, _, b = cstpu.sparse_data(key2, n=128, m=128, k=k, dtype=jnp.float32)
    keys2 = jax.random.split(jax.random.PRNGKey(int(rng.integers(2**31))), 8)
    Y = jnp.stack([b] + [cstpu.perturb(kk, b, 1e-2) for kk in keys2[:7]])

    sol, failed = fb.fbr_fused_solve(A, Y, sparsity=k, interpret=True)
    ref = batched.fbr_batch(A, Y, sparsity=k)
    assert not bool(np.any(np.asarray(failed)))
    for i in range(8):
        row = jax.tree.map(lambda leaf: leaf[i], sol)
        rrow = jax.tree.map(lambda leaf: leaf[i], ref)
        rk = float(jnp.linalg.norm(A @ row.todense() - Y[i]))
        rx = float(jnp.linalg.norm(A @ rrow.todense() - Y[i]))
        assert rk <= rx * (1 + 1e-3) + 1e-4, (i, rk, rx)
        assert rx <= rk * (1 + 1e-3) + 1e-4, (i, rk, rx)
