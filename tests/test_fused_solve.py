"""Whole-solve fused OMP kernel: interpret-mode equivalence with the XLA
path (the real-TPU compile path is exercised by bench.py on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from cstpu import omp, sparse_data, perturb, support
from cstpu.models.batched import omp_batch
from cstpu.ops.fused_solve import omp_fused_solve


def _problem(seed, n=32, m=128, k=3):
    from conftest import planted_problem

    return planted_problem(seed, n=n, m=m, k=k, noise=1e-2 / 2,
                           dtype=jnp.float32)


def test_fused_matches_xla_path_noiseless():
    A, x, b, y = _problem(200)
    Bs = jnp.stack([b, y, b * 2.0, b - 0.1 * y])
    sol, r = omp_fused_solve(A, Bs, 3, corr_dtype=jnp.float32,
                             interpret=True)
    ref = jax.vmap(lambda bb: omp(A, bb, 3))(Bs)
    np.testing.assert_array_equal(np.asarray(sol.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(sol.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(sol.val), np.asarray(ref.val),
                               atol=1e-4)
    # returned residual consistent with the recovered solution
    dense = jax.vmap(lambda s: s.todense())(sol)
    np.testing.assert_allclose(np.asarray(Bs - dense @ A.T), np.asarray(r),
                               atol=1e-4)


def test_fused_exact_support_recovery():
    A, x, b, y = _problem(201)
    sol, _ = omp_fused_solve(A, y[None, :], 3, corr_dtype=jnp.float32,
                             interpret=True)
    got = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    np.testing.assert_array_equal(np.sort(got), np.sort(support(x)))


def test_fused_k_exceeding_rank_stalls_cleanly():
    # k larger than the planted sparsity: extra steps must not corrupt the
    # solution (stall/no-op semantics, src/matchingpursuit.jl:66)
    A, x, b, y = _problem(202)
    sol, r = omp_fused_solve(A, b[None, :], 8, corr_dtype=jnp.float32,
                             interpret=True)
    dense = jax.vmap(lambda s: s.todense())(sol)[0]
    np.testing.assert_allclose(np.asarray(A @ dense), np.asarray(b),
                               atol=1e-4)


def test_omp_batch_fallback_cpu_matches_plain():
    # on CPU omp_batch must take the vmap path and agree with omp exactly
    A, x, b, y = _problem(203)
    Bs = jnp.stack([b, y])
    sol = omp_batch(A, Bs, 3)
    ref = jax.vmap(lambda bb: omp(A, bb, 3))(Bs)
    np.testing.assert_array_equal(np.asarray(sol.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(sol.val), np.asarray(ref.val),
                               rtol=1e-12)


def test_fr_fused_matches_xla_path():
    from cstpu import fr
    from cstpu.ops.fused_solve import fr_fused_solve

    A, x, b, y = _problem(300)
    Bs = jnp.stack([b, y, 0.5 * b + 0.5 * y, -b])
    sol, r = fr_fused_solve(A, Bs, 3, corr_dtype=jnp.float32,
                            interpret=True)
    ref = jax.vmap(lambda bb: fr(A, bb, sparsity=3))(Bs)
    np.testing.assert_array_equal(np.asarray(sol.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(sol.val), np.asarray(ref.val),
                               atol=1e-4)


def test_fr_fused_min_decrease_stops_early():
    from cstpu import fr, support
    from cstpu.ops.fused_solve import fr_fused_solve

    A, x, b, y = _problem(301)
    # a generous min_decrease halts after the informative atoms; compare
    # against the XLA path under the same rule
    sol, _ = fr_fused_solve(A, y[None, :], 8, min_decrease=1e-3,
                            corr_dtype=jnp.float32, interpret=True)
    ref = fr(A, y, min_decrease=1e-3, sparsity=8)
    got = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    want = np.asarray(ref.idx)[np.asarray(ref.mask)]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_mp_fused_matches_xla_path():
    from cstpu import mp
    from cstpu.ops.fused_solve import mp_fused_solve

    A, x, b, y = _problem(302)
    Bs = jnp.stack([b, y])
    xs, r = mp_fused_solve(A, Bs, 12, corr_dtype=jnp.float32,
                           interpret=True)
    ref = jax.vmap(lambda bb: mp(A, bb, 12))(Bs)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Bs - xs @ A.T), np.asarray(r),
                               atol=1e-5)


def test_gomp_fused_matches_xla_path():
    from cstpu import gomp
    from cstpu.ops.fused_solve import gomp_fused_solve

    A, x, b, y = _problem(400, n=32, m=128, k=4)
    Bs = jnp.stack([b, y, 2.0 * b, b - y])
    # l=2 divides k=4; also exercise the remainder path with k=5, l=2
    for k_, l_ in ((4, 2), (5, 2), (3, 1)):
        sol, r = gomp_fused_solve(A, Bs, l_, k_, corr_dtype=jnp.float32,
                                  interpret=True)
        ref = jax.vmap(lambda bb: gomp(A, bb, l_, k_))(Bs)
        np.testing.assert_array_equal(np.asarray(sol.idx),
                                      np.asarray(ref.idx),
                                      err_msg=f"k={k_} l={l_}")
        np.testing.assert_allclose(np.asarray(sol.val), np.asarray(ref.val),
                                   atol=1e-4, err_msg=f"k={k_} l={l_}")


def test_sp_fused_matches_xla_path():
    from cstpu import sp
    from cstpu.ops.fused_twostage import sp_fused_solve

    A, x, b, y = _problem(500, n=32, m=128, k=3)
    Bs = jnp.stack([b, y, -2.0 * b, b + y])
    sol, r = sp_fused_solve(A, Bs, 3, maxiter=8, corr_dtype=jnp.float32,
                            interpret=True)
    ref = jax.vmap(lambda bb: sp(A, bb, 3, maxiter=8))(Bs)
    # supports must agree exactly; coefficients to LS accuracy
    def active(idxs, masks):
        return [np.sort(np.asarray(idxs[i])[np.asarray(masks[i])])
                for i in range(idxs.shape[0])]
    got, want = active(sol.idx, sol.mask), active(ref.idx, ref.mask)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    dense_f = jax.vmap(lambda s: s.todense())(sol)
    dense_r = jax.vmap(lambda s: s.todense())(ref)
    np.testing.assert_allclose(np.asarray(dense_f), np.asarray(dense_r),
                               atol=1e-4)


def test_sp_fused_matches_xla_unstructured_fuzz():
    # non-planted Gaussian measurements at larger k: stresses the block-
    # partitioned union inverse + fresh kept-block rebuild (v3) against
    # the XLA reference on data with no recoverable support
    from cstpu import sp
    from cstpu.ops.fused_twostage import sp_fused_solve

    key = jax.random.PRNGKey(502)
    ka, kb = jax.random.split(key)
    A = jax.random.normal(ka, (64, 256))
    A = A / jnp.linalg.norm(A, axis=0, keepdims=True)
    Bs = jax.random.normal(kb, (6, 64))
    k_ = 8
    sol, _ = sp_fused_solve(A, Bs, k_, maxiter=8,
                            corr_dtype=jnp.float32, interpret=True)
    ref = jax.vmap(lambda bb: sp(A, bb, k_, maxiter=8))(Bs)
    for i in range(Bs.shape[0]):
        g = np.sort(np.asarray(sol.idx[i])[np.asarray(sol.mask[i])])
        w = np.sort(np.asarray(ref.idx[i])[np.asarray(ref.mask[i])])
        np.testing.assert_array_equal(g, w, err_msg=f"instance {i}")


def test_sp_fused_exact_recovery_noisy():
    from cstpu import support
    from cstpu.ops.fused_twostage import sp_fused_solve

    A, x, b, y = _problem(501, n=32, m=128, k=3)
    sol, _ = sp_fused_solve(A, y[None, :], 3, corr_dtype=jnp.float32,
                            interpret=True)
    got = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    np.testing.assert_array_equal(np.sort(got), np.sort(support(x)))


def test_stream_matches_fused_solve():
    from cstpu.ops.fused_solve import omp_fused_solve, omp_stream_solve

    A, x, b, y = _problem(600, n=32, m=512, k=3)
    Bs = jnp.stack([b, y, -b, 0.3 * b + y])
    sol_s, r_s = omp_stream_solve(A, Bs, 3, corr_dtype=jnp.float32,
                                  interpret=True)
    sol_f, r_f = omp_fused_solve(A, Bs, 3, corr_dtype=jnp.float32,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_s.idx),
                                  np.asarray(sol_f.idx))
    np.testing.assert_allclose(np.asarray(sol_s.val), np.asarray(sol_f.val),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_f), atol=1e-5)


def test_srr_fused_matches_xla_path():
    from cstpu import srr
    from cstpu.ops.fused_twostage import srr_fused_solve

    A, x, b, y = _problem(700, n=32, m=128, k=3)
    Bs = jnp.stack([b, y, -b, b + 0.5 * y])
    for l_ in (1, 2):
        sol, r = srr_fused_solve(A, Bs, 3, l=l_, corr_dtype=jnp.float32,
                                 interpret=True)
        ref = jax.vmap(lambda bb: srr(A, bb, 3, l=l_))(Bs)

        def active(idxs, masks):
            return [np.sort(np.asarray(idxs[i])[np.asarray(masks[i])])
                    for i in range(idxs.shape[0])]
        for g, w in zip(active(sol.idx, sol.mask),
                        active(ref.idx, ref.mask)):
            np.testing.assert_array_equal(g, w, err_msg=f"l={l_}")
        dense_f = jax.vmap(lambda s: s.todense())(sol)
        dense_r = jax.vmap(lambda s: s.todense())(ref)
        np.testing.assert_allclose(np.asarray(dense_f),
                                   np.asarray(dense_r), atol=1e-4)


def test_fused_nan_row_is_memory_safe():
    # a NaN-poisoned instance makes every `scores == smax` comparison
    # False, so the argmax reduction returns INT_MAX — _extract_cols must
    # clamp before the dynamic slice (OOB reads are undefined in Mosaic,
    # and the one-hot GEMM this replaced degraded gracefully). Clean rows
    # in the same batch must still solve exactly.
    A, x, b, y = _problem(930)
    bad = b.at[0].set(jnp.nan)
    Bs = jnp.stack([bad, y])
    sol, _ = omp_fused_solve(A, Bs, 3, corr_dtype=jnp.float32,
                             interpret=True)
    ref = omp(A, y, 3)
    got = np.asarray(sol.idx[1])[np.asarray(sol.mask[1])]
    np.testing.assert_array_equal(np.sort(got),
                                  np.sort(np.asarray(ref.nzind)))


def test_gomp_fused_k_exceeding_n_clamped():
    # k > n used to allocate a (B, k, k) Ginv scratch that supported()
    # (which clamps by min(k, n, m)) never accounted for; the solve now
    # clamps the same way — appends beyond n are impossible regardless
    from cstpu.ops.fused_solve import gomp_fused_solve

    A, x, b, y = _problem(931, n=32, m=128)
    sol, _ = gomp_fused_solve(A, y[None, :], 2, 128,
                              corr_dtype=jnp.float32, interpret=True)
    assert sol.idx.shape[1] == 32
    got = set(np.asarray(sol.idx[0])[np.asarray(sol.mask[0])].tolist())
    assert set(np.asarray(support(x)).tolist()) <= got


def test_ompr_fused_matches_xla_path():
    from cstpu import ompr
    from cstpu.ops.fused_twostage import ompr_fused_solve

    A, x, b, y = _problem(800, n=32, m=128, k=3)
    Bs = jnp.stack([b, y, -b, 2.0 * y])
    sol, r = ompr_fused_solve(A, Bs, 3, delta=1e-10, maxiter=16,
                              corr_dtype=jnp.float32, interpret=True)
    ref = jax.vmap(lambda bb: ompr(A, bb, 3, 1e-10, maxiter=16))(Bs)

    def active(idxs, masks):
        return [np.sort(np.asarray(idxs[i])[np.asarray(masks[i])])
                for i in range(idxs.shape[0])]
    for g, w in zip(active(sol.idx, sol.mask), active(ref.idx, ref.mask)):
        np.testing.assert_array_equal(g, w)
    dense_f = jax.vmap(lambda s: s.todense())(sol)
    dense_r = jax.vmap(lambda s: s.todense())(ref)
    np.testing.assert_allclose(np.asarray(dense_f), np.asarray(dense_r),
                               atol=1e-4)


def test_ompr_fused_preappend_gradient_score():
    # the OMPR deletion score must be built from the PRE-append solution
    # (reference: Ar = x + eta A'r, src/twostage.jl:163-168) — scoring the
    # post-append LS refit instead roughly doubles the new atom's score
    # and deletes a different slot. Correlated seeds 2 and 7 are verified
    # discriminators: the post-append variant returns supports {8,53,116}
    # / {21,27,120} where the XLA path returns {8,53,97} / {21,27,104}.
    from cstpu import correlated_data, ompr, perturb
    from cstpu.ops.fused_twostage import ompr_fused_solve

    for seed in (2, 7):
        kd, kn = jax.random.split(jax.random.PRNGKey(seed))
        A, x, b = correlated_data(kd, n=32, m=128, k=3, dtype=jnp.float32)
        y = perturb(kn, b, 5e-3)
        Bs = jnp.stack([b, y])
        sol, _ = ompr_fused_solve(A, Bs, 3, 1e-2, corr_dtype=jnp.float32,
                                  interpret=True)
        for row, bb in ((0, b), (1, y)):
            ref = ompr(A, bb, 3, 1e-2)
            got = sorted(np.asarray(sol.idx[row])[
                np.asarray(sol.mask[row])].tolist())
            want = sorted(np.asarray(ref.nzind).tolist())
            assert got == want, (seed, row, got, want)


def test_rmps_capped_acquisition_not_starved():
    # maxiter_acquisition=1 adds at most one atom per OUTER iteration, so
    # recovering k=3 needs >= 3 outer iterations. Right after an optimal
    # add the re-estimate gain is exactly zero in exact arithmetic — the
    # "deletion changed nothing" convergence test used to ride a +-ulp
    # sign here and could terminate on a 1-atom starved support. With the
    # pending-adds guard the solver must keep iterating and recover.
    # sparse_data seed 9 is a verified discriminator: the unguarded path
    # returns the single atom {102} on this well-separated Gaussian
    # problem (where exact recovery is otherwise guaranteed).
    from cstpu import correlated_data, perturb, rmps, sparse_data, support

    for seed, gen in ((9, sparse_data), (0, correlated_data)):
        kd, kn = jax.random.split(jax.random.PRNGKey(seed))
        A, x, b = gen(kd, n=32, m=128, k=3, dtype=jnp.float32)
        y = perturb(kn, b, 1e-2)
        planted = set(np.asarray(support(x)).tolist())

        ref = rmps(A, y, 1e-4, maxiter_acquisition=1)
        got_xla = set(np.flatnonzero(
            np.abs(np.asarray(ref)) > 1e-2).tolist())
        assert planted <= got_xla, (seed, got_xla, planted)


def test_rmp_fused_matches_xla_path():
    from cstpu import rmp
    from cstpu.ops.fused_twostage import rmp_fused_solve

    A, x, b, y = _problem(910)
    Bs = jnp.stack([b, y])

    # delta variant
    sol, _, capped = rmp_fused_solve(A, Bs, delta=1e-2, kmax=8,
                                     corr_dtype=jnp.float32, interpret=True)
    assert not np.any(np.asarray(capped))
    ref = jax.vmap(lambda bb: rmp(A, bb, delta=1e-2))(Bs)
    dense_f = jax.vmap(lambda s: s.todense())(sol)
    dense_r = jax.vmap(lambda s: s.todense())(ref)
    np.testing.assert_allclose(np.asarray(dense_f), np.asarray(dense_r),
                               atol=1e-4)

    # k variant: forward to exhaustion (f32 floor), backward to k —
    # must land the XLA path's support. kmax = n: exhaustion on the
    # noisy instance legitimately wants up to min(n, m) atoms, and the
    # slot cap must be able to hold them (smaller caps report `capped`
    # and the batch wrapper falls back — by contract, not tested here)
    solk, _, cappedk = rmp_fused_solve(A, Bs, k=3, kmax=A.shape[0],
                                       corr_dtype=jnp.float32,
                                       interpret=True)
    assert not np.any(np.asarray(cappedk))
    refk = jax.vmap(lambda bb: rmp(A, bb, k=3))(Bs)
    for i in range(Bs.shape[0]):
        g = np.sort(np.asarray(solk.idx[i])[np.asarray(solk.mask[i])])
        w = np.sort(np.asarray(refk.idx[i])[np.asarray(refk.mask[i])])
        np.testing.assert_array_equal(g, w, err_msg=f"instance {i}")
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda s: s.todense())(solk)),
        np.asarray(jax.vmap(lambda s: s.todense())(refk)), atol=1e-4)

    # k > kmax cannot be represented in the slot engine
    import pytest
    with pytest.raises(ValueError):
        rmp_fused_solve(A, Bs, k=9, kmax=8, corr_dtype=jnp.float32,
                        interpret=True)


def test_rmp_fused_capped_flag():
    from cstpu.ops.fused_twostage import rmp_fused_solve

    # kmax=2 cannot hold a 3-sparse solution: the forward stage must
    # report the cap instead of silently truncating
    A, x, b, y = _problem(911)
    sol, _, capped = rmp_fused_solve(A, b[None, :], delta=1e-2, kmax=2,
                                     corr_dtype=jnp.float32, interpret=True)
    assert np.all(np.asarray(capped))


def test_foba_fused_matches_xla_path():
    from cstpu import foba
    from cstpu.ops.fused_twostage import foba_fused_solve

    A, x, b, y = _problem(912)
    Bs = jnp.stack([b, y])
    sol, _, capped = foba_fused_solve(A, Bs, delta=1e-2, kmax=8,
                                      corr_dtype=jnp.float32, interpret=True)
    assert not np.any(np.asarray(capped))
    ref = jax.vmap(lambda bb: foba(A, bb, 1e-2))(Bs)
    dense_f = jax.vmap(lambda s: s.todense())(sol)
    dense_r = jax.vmap(lambda s: s.todense())(ref)
    np.testing.assert_allclose(np.asarray(dense_f), np.asarray(dense_r),
                               atol=1e-4)


def test_sp_incremental_ginv_matches_full_rebuild():
    # r5: the fused SP kernel maintains the kept-block inverse across
    # rounds (Schur downdates + stable-permutation GEMMs + bordered
    # appends with the exact pivot test) instead of re-inverting every
    # round. On correlated draws that actually SWAP atoms across
    # multiple sp_rounds, the maintained path must pick the same
    # supports as the full-rebuild path and agree on coefficients to
    # f32 rounding; iteration counts must match (same latch decisions).
    import jax.numpy as jnp

    from cstpu.ops.fused_twostage import sp_fused_solve
    from cstpu.utils.data import correlated_data, perturb

    for seed in (1, 3, 4):
        A, x, b = correlated_data(jax.random.PRNGKey(seed), n=64, m=256,
                                  k=5, decay=1.0, dtype=jnp.float32)
        Bs = jnp.stack([perturb(kk, b, 5e-3) for kk in
                        jax.random.split(jax.random.PRNGKey(seed + 100),
                                         8)])
        si, ri, iti = sp_fused_solve(A, Bs, 5, maxiter=12, interpret=True,
                                     return_iters=True)
        sf, rf, itf = sp_fused_solve(A, Bs, 5, maxiter=12, interpret=True,
                                     ablate="noincr", return_iters=True)
        assert int(iti) == int(itf), seed
        assert int(iti) >= 3, f"seed {seed} stopped swapping; weak test"
        np.testing.assert_array_equal(np.asarray(si.idx),
                                      np.asarray(sf.idx), err_msg=str(seed))
        np.testing.assert_allclose(np.asarray(si.val), np.asarray(sf.val),
                                   atol=5e-5, err_msg=str(seed))
