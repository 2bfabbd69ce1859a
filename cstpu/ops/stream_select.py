"""Per-step streaming correlate+select kernel (Pallas TPU).

The multi-chip building block: one OMP/greedy selection step over a
dictionary (shard) streamed tile-by-tile from HBM. Computes, for a batch
of residuals R (B, n) against A (n, m):

    val[b] = max_j |<a_j, r_b>|        (f32 accumulate)
    idx[b] = argmax (lowest index on ties — the reference's `argmax(P.Ar)`
             semantics, /root/reference/src/matchingpursuit.jl:181-185)

in a single pass over A at HBM-stream rate. The winning column itself is
cheaper to fetch afterwards as an indexed XLA gather of the full-precision
dictionary (n bytes-scale, vs the n*m sweep) — and exact, where an
in-kernel one-hot extraction would return the correlation-dtype rounding. Unlike the whole-solve kernels
(cstpu.ops.fused_solve) this leaves the append/refit to the caller, which
is exactly what the column-sharded multi-chip path needs: the global
selection is a cross-shard collective that cannot live inside a kernel, so
each shard runs this kernel per step and XLA stitches the two-scalar
argmax collective + rank-one active-set update between launches. The
dictionary read — all the traffic — stays at kernel rate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max


def _argmax_update(scores, j, tm: int, val_ref, idx_ref):
    """Fold one tile's scores into the running (max, lowest-index argmax)
    pair — the accumulation step shared by every streaming kernel here.
    Ties inside a tile resolve to the lowest index; ties ACROSS tiles keep
    the earlier (lower-global-index) entry via the strict > test."""
    tile_iota = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    tmax = jnp.max(scores, axis=1, keepdims=True)
    tloc = jnp.min(jnp.where(scores == tmax, tile_iota, INT_MAX),
                   axis=1, keepdims=True)                         # (B, 1)
    better = tmax > val_ref[:, :]                                 # (B, 1)
    idx_ref[:, :] = jnp.where(better, tloc + j * tm, idx_ref[:, :])
    val_ref[:, :] = jnp.where(better, tmax, val_ref[:, :])


def _select_kernel(tm: int, A_ref, R_ref, val_ref, idx_ref):
    f32 = jnp.float32
    cdt = A_ref.dtype
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        val_ref[:, :] = jnp.full_like(val_ref, -jnp.inf)
        idx_ref[:, :] = jnp.zeros_like(idx_ref)

    scores = jnp.abs(
        lax.dot_general(R_ref[:, :].astype(cdt), A_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32))              # (B, tm)
    _argmax_update(scores, j, tm, val_ref, idx_ref)


def _stream_tile(m: int, n: int, itemsize: int, target_bytes: int) -> int:
    best = 0
    tm = 128
    while tm * n * itemsize <= target_bytes and tm <= m:
        if m % tm == 0:
            best = tm
        tm += 128
    return best


@partial(jax.jit, static_argnames=("interpret",))
def correlate_select_stream(A, R, interpret: bool = False):
    """One selection sweep of A (n, m; pre-cast to the correlation dtype)
    against residuals R (B, n) f32. Returns (val (B,), idx (B,)).
    """
    n, m = A.shape
    B = R.shape[0]
    R = R.astype(jnp.float32)
    tm = _stream_tile(m, n, A.dtype.itemsize, 8 * 1024 * 1024)
    T = m // tm

    val, idx = pl.pallas_call(
        partial(_select_kernel, tm),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # A tile
            pl.BlockSpec((B, n), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),                # R
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n * m,
            bytes_accessed=n * m * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, R)
    return val[:, 0], idx[:, 0]


def supported_select(A, B: int, corr_dtype=jnp.bfloat16) -> bool:
    """Gate: batch/measurement tiling and a streamable tile size exist.

    `corr_dtype` must be the dtype the dictionary is actually streamed in:
    an f32 correlation path halves the largest streamable n, and a gate
    checked at bf16 width would admit shapes the kernel then rejects."""
    n, m = A.shape
    if n % 8 or B % 8 or m % 128:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    return _stream_tile(m, n, itemsize, 8 * 1024 * 1024) > 0


def _select_topl_kernel(tm: int, l: int,
                        A_ref, R_ref, val_ref, idx_ref):
    """Running top-l over tiles: each tile contributes its own top-l
    (at most l of a tile's atoms can make the global top-l), inserted
    one-by-one over the running set's current minimum. Strict-> insertion
    keeps earlier (lower-index) entries on value ties — the same
    deterministic tie-breaking as the top-1 kernel, matching
    `partialsortperm`'s stable order (src/matchingpursuit.jl:189-193)."""
    B, n = R_ref.shape
    f32 = jnp.float32
    cdt = A_ref.dtype
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        val_ref[:, :] = jnp.full_like(val_ref, -jnp.inf)
        idx_ref[:, :] = jnp.zeros_like(idx_ref)

    tile_iota = lax.broadcasted_iota(jnp.int32, (B, tm), 1)
    l_iota = lax.broadcasted_iota(jnp.int32, (B, l), 1)
    scores = jnp.abs(
        lax.dot_general(R_ref[:, :].astype(cdt), A_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32))              # (B, tm)

    def one(_, sc):
        tmax = jnp.max(sc, axis=1, keepdims=True)
        tloc = jnp.min(jnp.where(sc == tmax, tile_iota, INT_MAX),
                       axis=1, keepdims=True)                     # (B, 1)
        gcand = tloc + j * tm
        rmin = jnp.min(val_ref[:, :], axis=1, keepdims=True)
        p = jnp.min(jnp.where(val_ref[:, :] == rmin, l_iota, INT_MAX),
                    axis=1, keepdims=True)
        take = (l_iota == p) & (tmax > rmin)
        val_ref[:, :] = jnp.where(take, tmax, val_ref[:, :])
        idx_ref[:, :] = jnp.where(take, gcand, idx_ref[:, :])
        return jnp.where(tile_iota == tloc, -jnp.inf, sc)

    lax.fori_loop(0, l, one, scores)


@partial(jax.jit, static_argnames=("l", "interpret"))
def correlate_select_topl_stream(A, R, l: int, interpret: bool = False):
    """Top-l selection sweep of A (n, m; pre-cast to the correlation
    dtype) against residuals R (B, n) f32. Returns (val (B, l), idx
    (B, l)) — NOT sorted by value; mask on val > -inf for short
    dictionaries."""
    n, m = A.shape
    B = R.shape[0]
    R = R.astype(jnp.float32)
    tm = _stream_tile(m, n, A.dtype.itemsize, 8 * 1024 * 1024)
    T = m // tm

    val, idx = pl.pallas_call(
        partial(_select_topl_kernel, tm, int(l)),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, l), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, l), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, l), jnp.float32),
            jax.ShapeDtypeStruct((B, l), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n * m,
            bytes_accessed=n * m * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, R)
    return val, idx


def _fr_step_kernel(tm: int, deg: float, use_v: bool,
                    A_ref, R_ref, W_ref, *refs):
    """One forward-regression step over a streamed dictionary (shard):
    fold the PREVIOUS append's rescaling downdate (resc -= (w'a_j)^2, with
    w the scaled orthogonalized column) into the same tile pass that
    scores this step's OLS rule d2 = <a_j,r>^2 / resc — FR's two
    per-step dictionary sweeps (src/forward.jl:74-81,100-114) cost ONE
    HBM pass. V carries the dual identity for a deferred DELETION
    (resc += (v'a_j)^2, the freed span direction — SRR's backward stage,
    cstpu.ops.fused_twostage._Engine.delete_ep); zeros when unused.
    Appended atoms are marked by resc = -1 (any negative value is
    permanently invalid against rmin = deg * ||a_j||^2 >= 0), which
    reproduces the active-atom exclusion without a separate mask array;
    il carries two index columns per row: [mark, restore] — `mark`
    flags this call's appended atom as active (-1 for none), `restore`
    resurrects a deleted atom (its exact post-delete rescaling is the
    V update on a 0 base; -1 for none)."""
    if use_v:
        V_ref, il_ref, cn2_ref, resc_ref, val_ref, idx_ref, resc_out = refs
    else:
        il_ref, cn2_ref, resc_ref, val_ref, idx_ref, resc_out = refs
    B, n = R_ref.shape
    f32 = jnp.float32
    cdt = A_ref.dtype
    j = pl.program_id(0)
    NEG = jnp.float32(-jnp.inf)

    @pl.when(j == 0)
    def _init():
        val_ref[:, :] = jnp.full_like(val_ref, NEG)
        idx_ref[:, :] = jnp.zeros_like(idx_ref)

    tile_iota = lax.broadcasted_iota(jnp.int32, (B, tm), 1)
    q = lax.dot_general(R_ref[:, :].astype(cdt), A_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)               # (B, tm)
    z = lax.dot_general(W_ref[:, :].astype(cdt), A_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)               # (B, tm)
    gidx = tile_iota + j * tm
    mark = il_ref[:, 0:1]
    rest = il_ref[:, 1:2]
    resc = resc_ref[:, :]
    # a deleted atom's maintained rescaling is identically 0 while active
    # (w'a_p = 0 for appends of others, v'a_p = 0 for deletes of others,
    # and its own append subtracts exactly d); restore 0 and let the V
    # update add the exact post-delete value (v'a_p)^2/gamma_pp
    resc = jnp.where(gidx == rest, 0.0, resc)
    resc = resc - z * z
    if use_v:  # deferred-deletion dual update — the no-deletion FR path
        #        skips this third MXU pass entirely (use_v is static)
        zv = lax.dot_general(V_ref[:, :].astype(cdt), A_ref[:, :],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)          # (B, tm)
        resc = resc + zv * zv
    resc = jnp.where(gidx == mark, -1.0, resc)
    resc_out[:, :] = resc

    rmin = deg * cn2_ref[0:1, :]
    d2 = jnp.where(resc > rmin, q * q / resc, NEG)
    _argmax_update(d2, j, tm, val_ref, idx_ref)


@partial(jax.jit, static_argnames=("deg", "interpret"))
def fr_step_select(A, R, W, il, cn2, resc, deg: float,
                   V=None, interpret: bool = False):
    """One FR selection sweep with an inline rescaling downdate.

    A (n, m; correlation dtype), R residuals (B, n), W the previous
    step's scaled orthogonal direction (B, n; zeros on step 0 or
    rejection), il (B, 2) [mark, restore] LOCAL atom indices per row
    (-1 for none: `mark` = this sweep's appended atom to exclude,
    `restore` = a deleted atom to resurrect), cn2 (1, m)
    squared column norms, resc (B, m) current rescaling (donated), V the
    scaled freed direction of a deferred deletion (B, n; zeros when
    unused). Returns (d2max (B,), idx (B,), resc' (B, m)).
    """
    n, m = A.shape
    B = R.shape[0]
    tm = _stream_tile(m, n, A.dtype.itemsize, 8 * 1024 * 1024)
    T = m // tm
    use_v = V is not None

    bn_spec = pl.BlockSpec((B, n), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((n, tm), lambda j: (0, j),
                     memory_space=pltpu.VMEM),                # A tile
        bn_spec,                                              # R
        bn_spec,                                              # W
        *([bn_spec] if use_v else []),                        # V
        pl.BlockSpec((B, 2), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),                # il
        pl.BlockSpec((1, tm), lambda j: (0, j),
                     memory_space=pltpu.VMEM),                # cn2 tile
        pl.BlockSpec((B, tm), lambda j: (0, j),
                     memory_space=pltpu.VMEM),                # resc tile
    ]
    operands = [A, R.astype(jnp.float32), W.astype(jnp.float32),
                *([V.astype(jnp.float32)] if use_v else []),
                il.reshape(B, 2).astype(jnp.int32), cn2, resc]

    val, idx, resc2 = pl.pallas_call(
        partial(_fr_step_kernel, tm, float(deg), use_v),
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
        ],
        input_output_aliases={len(operands) - 1: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (4 if use_v else 3) * B * n * m,
            bytes_accessed=n * m * A.dtype.itemsize + 2 * B * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return val[:, 0], idx[:, 0], resc2


def _select_masked_kernel(tm: int, A_ref, R_ref, M_ref,
                          val_ref, idx_ref):
    """Top-1 |corr| with an additive per-atom mask tile (0 = eligible,
    -inf = excluded) — the passive-atom selection of OMPR
    (src/twostage.jl:134-180: passive scores are eta*|<a,r>| since the
    dense coefficient is zero off-support; active atoms are excluded)."""
    f32 = jnp.float32
    cdt = A_ref.dtype
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        val_ref[:, :] = jnp.full_like(val_ref, -jnp.inf)
        idx_ref[:, :] = jnp.zeros_like(idx_ref)

    scores = jnp.abs(
        lax.dot_general(R_ref[:, :].astype(cdt), A_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)) + M_ref[:, :]
    _argmax_update(scores, j, tm, val_ref, idx_ref)


@partial(jax.jit, static_argnames=("interpret",))
def correlate_select_masked_stream(A, R, M, interpret: bool = False):
    """Masked top-1 selection sweep: scores |R A| + M (M: 0 eligible,
    -inf excluded). Returns (val (B,), idx (B,))."""
    n, m = A.shape
    B = R.shape[0]
    tm = _stream_tile(m, n, A.dtype.itemsize, 8 * 1024 * 1024)
    T = m // tm

    val, idx = pl.pallas_call(
        partial(_select_masked_kernel, tm),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n * m,
            bytes_accessed=n * m * A.dtype.itemsize + B * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, R.astype(jnp.float32), M)
    return val[:, 0], idx[:, 0]
