"""Column-sharded (tensor-parallel) greedy pursuit over a device mesh.

The TPU-native scaling design the reference has no analog for (it is
single-process BLAS; /root/reference/src/CompressedSensing.jl has no
distributed deps): the dictionary A is column-sharded across the 'atoms'
mesh axis, each device computes correlations against its own atom shard
(the per-chip hot GEMV/GEMM), and the global atom selection is resolved
with two scalar collectives:

    gmax  = pmax over shards of the local best |<a, r>|
    gidx  = pmin over shards of (global index where local best == gmax)

which gives deterministic lowest-index tie-breaking — bitwise-identical
support recovery regardless of sharding. The owning shard then broadcasts
the selected column with a masked psum (an n-length all-reduce), every
replica appends it to its replicated active-set state, and the k x k refit
is computed redundantly per shard (cheaper than communicating it).

Problem batches ride the orthogonal 'batch' axis (pure data parallelism:
each device group solves its slice of the b-batch, with a vmapped solver
inside shard_map).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cstpu.ops import active_set as aset
from cstpu.ops.util import tree_where

INT_MAX = jnp.iinfo(jnp.int32).max


def _global_argmax_abs_corr(A_local, r, axis: str):
    """Collective argmax of |A' r| over the column-sharded dictionary.

    Returns (global_index, value) with lowest-index tie-breaking.
    """
    m_local = A_local.shape[1]
    shard = lax.axis_index(axis)
    scores = jnp.abs(r @ A_local)
    li = jnp.argmax(scores)
    lv = scores[li]
    gi = shard.astype(jnp.int32) * m_local + li.astype(jnp.int32)
    gmax = lax.pmax(lv, axis)
    cand = jnp.where(lv == gmax, gi, INT_MAX)
    gidx = lax.pmin(cand, axis)
    return gidx, gmax


def _broadcast_column(A_local, gidx, axis: str):
    """All-reduce the selected column out of its owning shard."""
    m_local = A_local.shape[1]
    shard = lax.axis_index(axis)
    owner = (gidx // m_local) == shard
    local = jnp.take(A_local, gidx % m_local, axis=1)
    return lax.psum(jnp.where(owner, local, 0.0), axis)


def _omp_shard_body(A_local, b, k: int, eps, m: int, axis: str):
    """One full OMP solve with a column-sharded dictionary (single b)."""
    n = A_local.shape[0]
    st0 = aset.empty(n, k, m, A_local.dtype)

    def cond(carry):
        st, t, done = carry
        return (t < k) & ~done

    def body(carry):
        st, t, done = carry
        r = aset.residual(st, b)
        gidx, _ = _global_argmax_abs_corr(A_local, r, axis)
        a = _broadcast_column(A_local, gidx, axis)
        present = aset.contains(st, gidx)
        full = st.k >= jnp.minimum(n, k)
        ok = ~present & ~full
        st2 = tree_where(ok, aset.refit(aset.append_col(a, b, st, gidx)), st)
        r2 = aset.residual(st2, b)
        stalled = present | full
        return st2, t + 1, stalled | (jnp.linalg.norm(r2) < eps)

    st, _, _ = lax.while_loop(cond, body, (st0, jnp.int32(0), jnp.bool_(False)))
    return aset.finalize(st, m)


def omp_sharded(A, b, k: int, mesh: Mesh, max_residual: float = 0.0,
                atoms_axis: str = "atoms", batch_axis: str = "batch"):
    """OMP with the dictionary column-sharded over `atoms_axis`.

    `b` may be a single measurement (n,) or a batch (B, n); batches are
    data-parallel over `batch_axis` and vmapped within each shard. Returns a
    SparseSolution (batched along the leading axis if b is batched).
    Semantics identical to cstpu.omp (deterministic collective argmax).
    """
    n, m = A.shape
    k = int(min(k if k is not None else n, n, m))
    eps = jnp.asarray(max_residual, A.dtype)
    n_shards = mesh.shape[atoms_axis]
    if m % n_shards:
        raise ValueError(f"m = {m} not divisible by atom shards {n_shards}")

    batched = b.ndim == 2
    b_spec = P(batch_axis, None) if batched else P(None)
    out_leaf_spec = P(batch_axis) if batched else P()

    def shard_fn(A_local, b_local):
        solve = partial(_omp_shard_body, A_local, k=k, eps=eps, m=m,
                        axis=atoms_axis)
        if batched:
            return jax.vmap(lambda bb: solve(bb))(b_local)
        return solve(b_local)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, atoms_axis), b_spec),
        out_specs=jax.tree.map(lambda _: out_leaf_spec,
                               _out_struct(A, b, k, m, batched)),
        check_vma=False,
    )
    return jax.jit(fn)(A, b)


def _out_struct(A, b, k, m, batched):
    """Pytree structure template for shard_map out_specs."""
    from cstpu.utils.sparse import SparseSolution
    lead = (b.shape[0],) if batched else ()
    return SparseSolution(
        idx=jax.ShapeDtypeStruct(lead + (k,), jnp.int32),
        val=jax.ShapeDtypeStruct(lead + (k,), A.dtype),
        mask=jax.ShapeDtypeStruct(lead + (k,), jnp.bool_),
        m=m,
    )
