"""Atom-selection (acquisition) primitives.

The hot op of every pursuit: correlate the dictionary with the residual and
pick the best atom(s) — `argmaxinner!` in the reference
(/root/reference/src/matchingpursuit.jl:181-193). The XLA path below is a
single dot + abs + argmax/top_k, which XLA fuses. On TPU the production
batched solvers do not call this per step at all: selection happens inside
the whole-solve fused kernels (cstpu.ops.fused_solve / fused_twostage,
VMEM-pinned or streaming). The standalone fused correlate+argmax building
block in cstpu.ops.pallas_kernels remains for composing custom solvers
over dictionaries where only the selection op needs fusing.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def abs_correlate(A, r):
    """|A' r| computed as |r @ A| — never transposing the dictionary.

    On TPU, `A.T @ r` materializes a full transposed copy of A in HBM every
    step; `r @ A` is the same contraction with A consumed in its stored
    layout. Batched-first: under vmap the residuals stack into an
    (B x n)(n x m) GEMM that reads A once for the whole batch — the key TPU
    win over the reference's per-instance GEMV
    (/root/reference/src/matchingpursuit.jl:182).
    """
    return jnp.abs(r @ A)


def top1(scores):
    """(index, value) of the largest score; first index wins ties."""
    i = jnp.argmax(scores)
    return i, scores[i]


def topl(scores, l: int):
    """Indices of the l largest scores, descending (ties: lowest index)."""
    _, idx = lax.top_k(scores, l)
    return idx
