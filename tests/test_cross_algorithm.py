"""Cross-algorithm conformance battery: on a well-posed planted problem
every solver family must agree on the support — the framework-level
analog of the reference's per-file oracles, plus a multi-seed sweep
(the reference acknowledges flakiness from unseeded data,
test/matchingpursuit.jl:7-8; here every seed is pinned)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cstpu
from cstpu import perturb, sparse_data, support

DELTA = 1e-2


def _overdetermined(seed):
    A, x, b = sparse_data(jax.random.PRNGKey(seed), n=32, m=48, k=3)
    y = perturb(jax.random.PRNGKey(seed + 1000), b, DELTA / 2)
    return A, x, b, y


def _square(seed):
    A, x, b = sparse_data(jax.random.PRNGKey(seed), n=32, m=32, k=3)
    y = perturb(jax.random.PRNGKey(seed + 1000), b, DELTA / 2)
    return A, x, b, y


GREEDY = [
    ("omp", lambda A, y: cstpu.omp(A, y, 3)),
    ("gomp_l1", lambda A, y: cstpu.gomp(A, y, 1, 3)),
    ("fr", lambda A, y: cstpu.fr(A, y, sparsity=3)),
    ("sp", lambda A, y: cstpu.sp(A, y, 3, DELTA)),
    ("ompr", lambda A, y: cstpu.ompr(A, y, 3, DELTA)),
    ("srr", lambda A, y: cstpu.srr(A, y, 3, DELTA)),
    ("rmp_k", lambda A, y: cstpu.rmp(A, y, k=3)),
    ("foba", lambda A, y: cstpu.foba(A, y, DELTA)),
    ("oblivious", lambda A, y: cstpu.oblivious(A, y, 3)),
]

BACKWARD = [
    ("br", lambda A, y: cstpu.br(A, y, sparsity=3)),
    ("fbr", lambda A, y: cstpu.fbr(A, y, sparsity=3)),
    ("lace", lambda A, y: cstpu.lace(A, y, sparsity=3)),
]


@pytest.mark.parametrize("name,solver", GREEDY)
def test_greedy_families_agree(name, solver):
    A, x, b, y = _overdetermined(400)
    sol = solver(A, y)
    assert list(sol.nzind) == list(support(x)), name


@pytest.mark.parametrize("name,solver", BACKWARD)
def test_backward_families_agree(name, solver):
    A, x, b, y = _square(401)
    sol = solver(A, y)
    assert list(sol.nzind) == list(support(x)), name


def test_convex_and_bayes_families_agree():
    A, x, b, y = _overdetermined(402)
    ref = list(support(x))
    sigma = DELTA

    xs = cstpu.fsbl(A, y, sigma ** 2)
    assert sorted(np.flatnonzero(np.abs(np.asarray(xs)) > sigma)) == ref
    xr = cstpu.rmps(A, y, sigma ** 2)
    assert sorted(np.flatnonzero(np.abs(np.asarray(xr)) > sigma)) == ref
    xb = np.asarray(cstpu.bp(A, b))  # noiseless equality BP
    assert sorted(np.flatnonzero(np.abs(xb) > 1e-6)) == ref
    xd, _ = __import__("cstpu.native", fromlist=["bpd_homotopy"]).bpd_homotopy(
        np.asarray(A, np.float64), np.asarray(y, np.float64), DELTA)
    # the reference's BPD oracle droptols before comparing
    # (test/basispursuit.jl:27-36): l1 bias leaves small spurious atoms
    assert sorted(np.flatnonzero(np.abs(xd) > 10 * DELTA)) == ref


@pytest.mark.parametrize("seed", [410, 411, 415, 413, 414])
def test_multi_seed_sweep(seed):
    # one shape → one jit compile; five seeds ride the cached program
    A, x, b, y = _overdetermined(seed)
    ref = list(support(x))
    assert list(cstpu.omp(A, y, 3).nzind) == ref
    assert list(cstpu.fr(A, y, sparsity=3).nzind) == ref
    assert list(cstpu.sp(A, y, 3, DELTA).nzind) == ref


def test_batch_entries_match_single_solvers():
    # every *_batch entry must agree with a loop over its single-instance
    # solver on the same rows (on CPU both take the vmapped path, so this
    # pins the batch plumbing: kwarg threading, padding conventions,
    # per-instance convergence isolation — the class of divergence the
    # noise-EM freeze fix addressed)
    from cstpu.models import batched as B

    A, x, b, y = _overdetermined(7)
    y2 = perturb(jax.random.PRNGKey(77), b, DELTA / 2)
    Bs = jnp.stack([y, y2])
    As, xs_, bs = sparse_data(jax.random.PRNGKey(7), n=32, m=32, k=3)[:3]
    ys1 = perturb(jax.random.PRNGKey(78), bs, DELTA / 2)
    ys2 = perturb(jax.random.PRNGKey(79), bs, DELTA / 2)
    Bsq = jnp.stack([ys1, ys2])

    def sup_of(sol):
        if hasattr(sol, "mask"):
            return sorted(np.asarray(sol.idx)[np.asarray(sol.mask)]
                          .tolist())
        return sorted(np.flatnonzero(
            np.abs(np.asarray(sol)) > 10 * DELTA).tolist())

    cases = [
        (lambda: B.omp_batch(A, Bs, 3), lambda r: cstpu.omp(A, r, 3), Bs),
        (lambda: B.gomp_batch(A, Bs, 1, 3),
         lambda r: cstpu.gomp(A, r, 1, 3), Bs),
        (lambda: B.fr_batch(A, Bs, sparsity=3),
         lambda r: cstpu.fr(A, r, sparsity=3), Bs),
        (lambda: B.sp_batch(A, Bs, 3, DELTA),
         lambda r: cstpu.sp(A, r, 3, DELTA), Bs),
        (lambda: B.ompr_batch(A, Bs, 3, DELTA),
         lambda r: cstpu.ompr(A, r, 3, DELTA), Bs),
        (lambda: B.srr_batch(A, Bs, 3, DELTA),
         lambda r: cstpu.srr(A, r, 3, DELTA), Bs),
        (lambda: B.rmp_batch(A, Bs, delta=DELTA),
         lambda r: cstpu.rmp(A, r, delta=DELTA), Bs),
        (lambda: B.foba_batch(A, Bs, DELTA),
         lambda r: cstpu.foba(A, r, DELTA), Bs),
        (lambda: B.br_batch(As, Bsq, sparsity=3),
         lambda r: cstpu.br(As, r, sparsity=3), Bsq),
        (lambda: B.fbr_batch(As, Bsq, sparsity=3),
         lambda r: cstpu.fbr(As, r, sparsity=3), Bsq),
        (lambda: B.lace_batch(As, Bsq, sparsity=3),
         lambda r: cstpu.lace(As, r, sparsity=3), Bsq),
        (lambda: B.sbl_batch(A, Bs, DELTA ** 2),
         lambda r: cstpu.sbl(A, r, DELTA ** 2), Bs),
        (lambda: B.fsbl_batch(A, Bs, DELTA ** 2),
         lambda r: cstpu.fsbl(A, r, DELTA ** 2), Bs),
        (lambda: B.rmps_batch(A, Bs, DELTA ** 2),
         lambda r: cstpu.rmps(A, r, DELTA ** 2), Bs),
    ]
    for batch_fn, single_fn, rows in cases:
        out = batch_fn()
        for i in range(rows.shape[0]):
            rowsol = (jax.tree.map(lambda leaf: leaf[i], out)
                      if hasattr(out, "mask") else out[i])
            got = sup_of(rowsol)
            want = sup_of(single_fn(rows[i]))
            assert got == want, (batch_fn, i, got, want)
