"""Fused Pallas OMP step kernel: interpret-mode equivalence with the
reference XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from cstpu import omp, sparse_data, perturb, support
from cstpu.ops.pallas_step import omp_fused


def _problem(seed, n=32, m=64, k=3):
    kd, kn = jax.random.split(jax.random.PRNGKey(seed))
    A, x, b = sparse_data(kd, n=n, m=m, k=k, dtype=jnp.float32)
    y = perturb(kn, b, 1e-2 / 2)
    return A, x, b, y


def test_omp_fused_matches_xla_path():
    A, x, b, y = _problem(100)
    Bs = jnp.stack([b, y])
    sols = omp_fused(A, Bs, 3, interpret=True)
    for i, bb in enumerate([b, y]):
        ref = omp(A, bb, 3)
        mask = np.asarray(sols.mask[i])
        got_idx = np.asarray(sols.idx[i])[mask]
        got_val = np.asarray(sols.val[i])[mask]
        assert list(got_idx) == list(ref.nzind)
        np.testing.assert_allclose(got_val, ref.nzval, rtol=2e-4)


def test_omp_fused_recovers_support():
    A, x, b, _ = _problem(101, n=64, m=128, k=4)
    Bs = b[None, :]
    sols = omp_fused(A, Bs, 4, interpret=True)
    mask = np.asarray(sols.mask[0])
    got = np.sort(np.asarray(sols.idx[0])[mask])
    assert list(got) == list(support(x))


def test_omp_fused_stall_no_duplicates():
    # more steps than true sparsity: must stall without duplicate atoms
    A, x, b, _ = _problem(102)
    sols = omp_fused(A, b[None, :], 8, interpret=True)
    mask = np.asarray(sols.mask[0])
    got = np.asarray(sols.idx[0])[mask]
    assert len(got) == len(set(got.tolist()))
    assert set(support(x)) <= set(got.tolist())
