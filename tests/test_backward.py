"""Conformance tests for BR/FBR/LACE under all three stopping criteria.
Oracles: /root/reference/test/backward.jl (square system, seeded here)."""

import jax
import numpy as np
import pytest

from cstpu import br, fbr, lace, sparse_data, perturb, support

DELTA = 1e-2


def _problem(seed, n=32, k=3):
    from conftest import planted_problem

    A, x, _, y = planted_problem(seed, n=n, m=n, k=k, noise=DELTA / 2)
    return A, x, y


def _check(sol, x, atol=2 * DELTA):
    assert list(sol.nzind) == list(support(x))
    np.testing.assert_allclose(sol.todense(), np.asarray(x), atol=atol)


@pytest.mark.parametrize("solver", [br, fbr, lace])
def test_backward_sparsity(solver):
    A, x, y = _problem(20)
    _check(solver(A, y, sparsity=3), x)


@pytest.mark.parametrize("solver", [br, fbr, lace])
def test_backward_max_residual(solver):
    A, x, y = _problem(21)
    _check(solver(A, y, max_residual=DELTA), x)


@pytest.mark.parametrize("solver", [br, fbr, lace])
def test_backward_max_increase(solver):
    A, x, y = _problem(22)
    _check(solver(A, y, max_increase=DELTA), x)


def test_br_naive_matches_fast():
    A, x, y = _problem(23)
    fast = br(A, y, sparsity=3)
    slow = br(A, y, sparsity=3, naive=True)
    assert list(fast.nzind) == list(slow.nzind)
    np.testing.assert_allclose(fast.todense(), slow.todense(), rtol=1e-8)


def test_backward_requires_overdetermined():
    A, _, b = sparse_data(jax.random.PRNGKey(24), n=16, m=32, k=3)
    with pytest.raises(ValueError):
        br(A, b, sparsity=3)
    with pytest.raises(ValueError):
        fbr(A, b, sparsity=3)
    with pytest.raises(ValueError):
        lace(A, b, sparsity=3)


def test_backward_batch_wrappers():
    import jax.numpy as jnp
    import numpy as np

    from cstpu import br, br_batch, fbr_batch, lace_batch

    A, x, y = _problem(60)
    Bs = jnp.stack([y, y * 2.0])
    sols = br_batch(A, Bs, sparsity=3)
    ref = br(A, y, sparsity=3)
    assert sorted(np.asarray(sols.idx[0])[np.asarray(sols.mask[0])].tolist()) \
        == list(ref.nzind)
    f = fbr_batch(A, Bs, sparsity=3)
    l = lace_batch(A, Bs, sparsity=3)
    assert f.idx.shape[0] == 2 and l.idx.shape[0] == 2


def test_lace_batch_failed_flag_is_real_on_xla_path():
    # the XLA path must report a REAL per-instance instability signal
    # (non-finite active coefficients), not a fabricated all-False: a NaN
    # measurement row yields NaN refits and must flag exactly that
    # instance while the clean instance stays False
    import jax.numpy as jnp

    from cstpu import lace_batch

    A, x, y = _problem(61)
    bad = jnp.full_like(y, jnp.nan)
    Bs = jnp.stack([y, bad])
    sols, failed = lace_batch(A, Bs, sparsity=3, return_failed=True)
    failed = np.asarray(failed)
    assert failed.dtype == bool and failed.shape == (2,)
    assert not failed[0] and failed[1]


def test_fbr_rank_deficient_sets_failed():
    # a duplicated column makes the Gram singular and the Cholesky init
    # NaN; the failure flag must latch (the predicate is a negated >= so
    # NaN comparisons fail toward `failed`) instead of reporting success
    # over an all-NaN solution — the XLA twin of the fused-kernel fix
    import jax.numpy as jnp

    key = jax.random.PRNGKey(60)
    A0 = jax.random.normal(key, (48, 31))
    A = jnp.concatenate([A0, A0[:, :1]], axis=1)
    A = A / jnp.linalg.norm(A, axis=0, keepdims=True)
    b = A[:, 0] + A[:, 5]
    _, failed = fbr(A, b, sparsity=3, return_failed=True)
    assert bool(failed)
