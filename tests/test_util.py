"""Conformance tests for data generators, dictionary analysis, and
preconditioners. Oracles: /root/reference/test/util.jl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstpu import (
    sparse_data, sparse_vector, correlated_data, perturb,
    coherence, babel, cumbabel,
    normalize_columns, mean_preconditioner, svd_preconditioner,
    support, samesupport,
)


def test_sparse_vector():
    key = jax.random.PRNGKey(0)
    x = sparse_vector(key, 64, 5)
    assert x.shape == (64,)
    nz = support(x)
    assert len(nz) == 5
    assert np.all(np.isin(np.asarray(x)[nz], [-1.0, 1.0]))
    xg = sparse_vector(key, 64, 5, gaussian=True)
    assert len(support(xg)) == 5
    with pytest.raises(ValueError):
        sparse_vector(key, 3, 5)


def test_sparse_data_shapes_and_normalization():
    A, x, b = sparse_data(jax.random.PRNGKey(1), n=32, m=48, k=3)
    assert A.shape == (32, 48) and x.shape == (48,) and b.shape == (32,)
    np.testing.assert_allclose(np.sum(np.asarray(A) ** 2, axis=0), 1.0,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-12)


def test_correlated_data():
    A, x, b = correlated_data(jax.random.PRNGKey(2), 32, 64, 3)
    np.testing.assert_allclose(np.sum(np.asarray(A) ** 2, axis=0), 1.0,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-12)


def test_perturb_exact_norm():
    _, _, b = sparse_data(jax.random.PRNGKey(3), n=32, m=48, k=3)
    y = perturb(jax.random.PRNGKey(4), b, 1e-2)
    assert abs(float(jnp.linalg.norm(y - b)) - 1e-2) < 1e-14


def test_babel_identities():
    # oracle: test/util.jl:7-20
    n, m, k = 64, 128, 16
    A, _, _ = sparse_data(jax.random.PRNGKey(5), n=n, m=m, k=k)
    mu = float(coherence(A))
    assert 0 < mu
    assert abs(float(babel(A, 1)) - mu) < 1e-14
    mu1 = np.asarray(cumbabel(A, k))
    individually = np.array([float(babel(A, i)) for i in range(1, k + 1)])
    np.testing.assert_allclose(mu1, individually, rtol=1e-12)
    tol = 1e-12
    for i, mu_i in enumerate(mu1, start=1):
        assert mu_i <= i * mu + tol


def test_preconditioners_decrease_babel():
    # oracle: test/util.jl:22-46 — both preconditioners strictly decrease
    # the cumulative Babel function on |Gaussian| dictionaries
    n, m, k = 64, 128, 6
    A, x, b = sparse_data(jax.random.PRNGKey(6), n=n, m=m, k=k,
                          rescaled=False)
    A = normalize_columns(jnp.abs(A))
    mu = np.asarray(cumbabel(A, k))

    PA = normalize_columns(svd_preconditioner(A)(A))
    Pmu = np.asarray(cumbabel(PA, k))
    assert np.all(Pmu < mu)

    MA = normalize_columns(mean_preconditioner(1e-6)(A))
    Mmu = np.asarray(cumbabel(MA, k))
    assert np.all(Mmu < mu)


def test_samesupport():
    x = np.array([0.0, 1.0, 0.0, -2.0])
    y = np.array([0.0, 3.0, 0.0, 5.0])
    z = np.array([1.0, 3.0, 0.0, 5.0])
    assert samesupport(x, y)
    assert not samesupport(x, z)


def test_droptol():
    from cstpu import droptol
    from cstpu.utils.sparse import from_dense

    x = np.array([0.0, 1.0, 1e-9, -2.0])
    np.testing.assert_array_equal(np.asarray(droptol(x, 1e-6)),
                                  [0.0, 1.0, 0.0, -2.0])
    sol = droptol(from_dense(x, kmax=4), 1e-6)
    np.testing.assert_array_equal(sol.nzind, [1, 3])
    np.testing.assert_array_equal(sol.nzval, [1.0, -2.0])


def test_polish_refits_support():
    # the working version of the reference's intended droptol!-with-refit
    # (src/util.jl:163-170 is broken): polishing a perturbed solution
    # restores the exact LS coefficients on the surviving support
    import jax.numpy as jnp

    from cstpu import polish
    from cstpu.utils.sparse import from_dense

    rng = np.random.default_rng(3)
    A = rng.standard_normal((16, 24))
    A /= np.linalg.norm(A, axis=0, keepdims=True)
    xt = np.zeros(24)
    xt[[2, 7, 19]] = [1.5, -2.0, 0.75]
    b = A @ xt
    noisy = xt + rng.standard_normal(24) * 1e-4   # biased coefficients
    noisy[np.abs(xt) == 0] *= 5.0                 # sub-tol clutter
    xp = np.asarray(polish(A, b, jnp.asarray(noisy), tol=1e-2))
    np.testing.assert_allclose(xp, xt, atol=1e-10)
    sol = polish(A, b, from_dense(noisy, kmax=8, tol=1e-2), tol=1e-2)
    np.testing.assert_array_equal(sol.nzind, [2, 7, 19])
    np.testing.assert_allclose(sol.nzval, [1.5, -2.0, 0.75], atol=1e-10)


def test_active_set_bookkeeping():
    # analog of the dropindex!/addindex! bookkeeping test (test/util.jl:48-59)
    from cstpu.ops import active_set as aset
    key = jax.random.PRNGKey(7)
    A, _, b = sparse_data(key, n=16, m=16, k=3)
    st = aset.empty(16, 4, 16, A.dtype)
    for i in [2, 5, 11]:
        st = aset.refit(aset.append(A, b, st, jnp.asarray(i)))
    assert int(st.k) == 3
    sol = aset.finalize(st, 16)
    assert list(sol.nzind) == [2, 5, 11]
    # delete the middle atom (position of idx 5 in insertion order is 1)
    st = aset.refit(aset.delete(st, jnp.asarray(1), 16))
    sol = aset.finalize(st, 16)
    assert list(sol.nzind) == [2, 11]
    # coefficients match the restricted LS solution
    ref = np.linalg.lstsq(np.asarray(A)[:, [2, 11]], np.asarray(b),
                          rcond=None)[0]
    np.testing.assert_allclose(sol.nzval, ref, rtol=1e-10)


def test_exhaustive_oracle():
    # the brute-force oracle finds the planted support (reference's
    # exhaustive.jl, with its wrong-axis/repetition defects fixed)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cstpu import exhaustive, sparse_data, support

    kd = jax.random.PRNGKey(90)
    A, x, b = sparse_data(kd, n=16, m=24, k=3)
    got = np.asarray(exhaustive(A, b, 3))
    np.testing.assert_array_equal(np.sort(got), np.sort(support(x)))


def test_perturb_batched_per_row_norm():
    # a batched (B, n) perturb must give EACH ROW exact norm delta (a
    # global normalization silently hands every instance delta/sqrt(B))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cstpu import perturb

    B0 = jnp.ones((8, 32))
    Y = perturb(jax.random.PRNGKey(0), B0, 0.25)
    norms = np.linalg.norm(np.asarray(Y - B0), axis=1)
    np.testing.assert_allclose(norms, 0.25, rtol=1e-6)


def test_exhaustive_rejects_oversized_before_enumeration():
    import jax.numpy as jnp
    import pytest
    from cstpu import exhaustive

    A = jnp.ones((4, 1000))
    with pytest.raises(ValueError, match="max_candidates"):
        # C(1000, 5) = 8.25e12 — must raise instantly, not enumerate
        exhaustive(A, jnp.ones((4,)), 5)
