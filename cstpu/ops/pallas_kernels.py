"""Pallas TPU kernels for the pursuit hot loop.

The per-step bottleneck of every greedy solver is `argmaxinner!`
(/root/reference/src/matchingpursuit.jl:181-193): correlate the dictionary
with the residual(s), take |.|, and reduce to the best atom. Composed in
XLA this writes the (m x B) score matrix to HBM and reads it back for the
argmax; the fused kernel below streams A tile-by-tile through VMEM, keeps
the per-instance running (max, argmax) in VMEM scratch, and never
materializes the scores — HBM traffic is exactly one read of A plus the
residual block, which is the roofline for this op.

Tie-breaking is deterministic lowest-index (within a tile via masked min,
across tiles because only a strictly greater max replaces the running one),
matching `jnp.argmax` and the Julia reference — a requirement for
bitwise-stable support recovery across shardings.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max


def _corr_argmax_kernel(r_ref, a_ref, val_ref, idx_ref, vmax, vidx):
    t = pl.program_id(0)
    tm = a_ref.shape[1]
    B = r_ref.shape[1]

    @pl.when(t == 0)
    def _():
        vmax[:, :] = jnp.full_like(vmax, -jnp.inf)
        vidx[:, :] = jnp.zeros_like(vidx)

    # (B, n) @ (n, TM) -> (B, TM) on the MXU, fused abs on the VPU;
    # the residual is cast to the dictionary's dtype (callers keep r f32)
    scores = jnp.abs(
        jax.lax.dot_general(
            r_ref[:].astype(a_ref.dtype), a_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    local_max = jnp.max(scores, axis=1, keepdims=True)            # (B, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, tm), 1) + t * tm
    local_idx = jnp.min(jnp.where(scores == local_max, col, INT_MAX),
                        axis=1, keepdims=True)                     # (B, 1)
    better = local_max > vmax[:, :]
    vidx[:, :] = jnp.where(better, local_idx, vidx[:, :])
    # NaN scores must be VISIBLE in the returned value (jnp.max over the
    # full score row is NaN): a plain strict > would silently drop the
    # NaN tile and return a plausible finite selection, masking a
    # diverged solve. When val is NaN the returned idx is NOT meaningful
    # (index updates stop at the poisoned tile) — callers must treat a
    # NaN val as a failed selection, as every solver's NaN latch does.
    poison = jnp.isnan(local_max) | jnp.isnan(vmax[:, :])
    vmax[:, :] = jnp.where(poison, jnp.float32(jnp.nan),
                           jnp.where(better, local_max, vmax[:, :]))

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        val_ref[:, :] = vmax[:, :]
        idx_ref[:, :] = vidx[:, :]


def _pick_tile(m: int, target: int = 512) -> int:
    """Largest 128-multiple divisor of m up to `target` (0 if none)."""
    best = 0
    for tm in range(128, target + 1, 128):
        if m % tm == 0:
            best = tm
    return best


@partial(jax.jit, static_argnames=("interpret",))
def _corr_argmax_call(A, R, interpret: bool = False):
    n, m = A.shape
    B = R.shape[1]
    tm = _pick_tile(m)
    assert tm > 0
    grid = (m // tm,)
    val, idx = pl.pallas_call(
        _corr_argmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tm), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * B,
            bytes_accessed=n * m * A.dtype.itemsize + n * B * R.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(R, A)
    return idx[:, 0], val[:, 0]


def correlate_argmax(A, r, interpret: bool = False):
    """Fused |A' r| + argmax. `r` is (n,) or (n, B).

    Returns (idx, val) as scalars for a single residual or (B,) vectors for
    a batch. Requires m to have a 128-multiple divisor tile; callers fall
    back to the XLA path otherwise (see `supported`).
    """
    single = r.ndim == 1
    R = r[:, None] if single else r
    idx, val = _corr_argmax_call(A, R, interpret=interpret)
    if single:
        return idx[0], val[0]
    return idx, val


def supported(A, r) -> bool:
    """True if shapes/dtypes are compatible with the fused kernel."""
    n, m = A.shape
    if _pick_tile(m) == 0:
        return False
    B = 1 if r.ndim == 1 else r.shape[1]
    if A.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if not jnp.issubdtype(r.dtype, jnp.floating):
        return False  # the kernel casts r to A's dtype
    # A tile + residual block must fit VMEM comfortably
    tile_bytes = n * _pick_tile(m) * A.dtype.itemsize
    r_bytes = n * B * r.dtype.itemsize
    return tile_bytes + r_bytes < 12 * 1024 * 1024
