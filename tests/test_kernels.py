"""Pallas kernel parity tests (interpret mode on CPU): the fused
correlate+argmax must agree with the XLA reference path, including
lowest-index tie-breaking."""

import jax
import jax.numpy as jnp
import numpy as np

from cstpu.ops.pallas_kernels import correlate_argmax, supported, _pick_tile


def test_pick_tile():
    assert _pick_tile(1024) == 512
    assert _pick_tile(8192) == 512
    assert _pick_tile(384) == 384
    assert _pick_tile(100) == 0


def test_correlate_argmax_matches_xla():
    key = jax.random.PRNGKey(0)
    n, m, B = 64, 256, 4
    ka, kr = jax.random.split(key)
    A = jax.random.normal(ka, (n, m), jnp.float32)
    R = jax.random.normal(kr, (n, B), jnp.float32)
    idx, val = correlate_argmax(A, R, interpret=True)
    scores = np.abs(np.asarray(R).T @ np.asarray(A))
    ref_idx = np.argmax(scores, axis=1)
    ref_val = scores[np.arange(B), ref_idx]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(val), ref_val, rtol=1e-6)


def test_correlate_argmax_single_residual():
    key = jax.random.PRNGKey(1)
    n, m = 32, 128
    ka, kr = jax.random.split(key)
    A = jax.random.normal(ka, (n, m), jnp.float32)
    r = jax.random.normal(kr, (n,), jnp.float32)
    idx, val = correlate_argmax(A, r, interpret=True)
    scores = np.abs(np.asarray(A).T @ np.asarray(r))
    assert int(idx) == int(np.argmax(scores))
    np.testing.assert_allclose(float(val), scores[int(idx)], rtol=1e-6)


def test_correlate_argmax_tie_break_lowest_index():
    # duplicate columns -> equal scores; lowest index must win.
    # m=640 forces tile=128 (the largest 128-multiple divisor <= 512),
    # so atoms 7 and 600 land in DIFFERENT tiles and the cross-tile
    # strict-> combine is actually exercised (at m=256 the tile is 256
    # and the whole sweep is one tile)
    n, m = 32, 640
    assert _pick_tile(m) == 128
    A = np.zeros((n, m), np.float32)
    A[0, 7] = 1.0
    A[0, 600] = 1.0  # identical column in a LATER tile
    r = np.zeros((n,), np.float32)
    r[0] = 1.0
    idx, val = correlate_argmax(jnp.asarray(A), jnp.asarray(r), interpret=True)
    assert int(idx) == 7
    np.testing.assert_allclose(float(val), 1.0, rtol=1e-6)
    # and within ONE tile too
    idx2, _ = correlate_argmax(jnp.asarray(A[:, :256]), jnp.asarray(r),
                               interpret=True)
    assert int(idx2) == 7


def test_supported():
    A = jnp.zeros((32, 128), jnp.float32)
    r = jnp.zeros((32,), jnp.float32)
    assert supported(A, r)
    A_bad = jnp.zeros((32, 100), jnp.float32)
    assert not supported(A_bad, r)


def test_fr_step_select_restore_semantics():
    # a deleted atom resurrects with EXACTLY the V-update value on a zero
    # base: resc_p' = (v'a_p)^2 (the post-delete rescaling identity)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cstpu.ops.stream_select import fr_step_select

    B, n, m = 8, 16, 256
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (n, m), jnp.float32)
    A = A / jnp.linalg.norm(A, axis=0, keepdims=True)
    R = jax.random.normal(jax.random.PRNGKey(4), (B, n), jnp.float32)
    V = jax.random.normal(jax.random.PRNGKey(5), (B, n), jnp.float32)
    cn2 = jnp.sum(A * A, axis=0)[None, :]
    p = 7
    resc = jnp.broadcast_to(cn2, (B, m)).at[:, p].set(-1.0)  # p marked active
    il = jnp.stack([jnp.full((B,), -1, jnp.int32),
                    jnp.full((B,), p, jnp.int32)], axis=1)   # restore p
    W = jnp.zeros((B, n), jnp.float32)
    _, _, resc2 = fr_step_select(A, R, W, il, cn2, resc, 1e-12,
                                 V=V, interpret=True)
    want = np.asarray(V @ A[:, p]) ** 2
    np.testing.assert_allclose(np.asarray(resc2[:, p]), want, rtol=1e-5)


def test_append_col_gated_noop_at_capacity():
    # the documented no-op contract must hold for ok gates that do not
    # themselves check capacity: at st.k == kmax the write slot used to
    # index one past the buffer and (under clamping lowerings) silently
    # zero the LAST active column
    from cstpu.ops import active_set as aset

    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (16, 8), jnp.float64)
    A = A / jnp.linalg.norm(A, axis=0, keepdims=True)
    b = A[:, 0] + 0.5 * A[:, 1]
    st = aset.empty(16, 2, 8, jnp.float64)
    st = aset.append(A, b, st, 0)
    st = aset.append(A, b, st, 1)
    st = aset.refit(st)
    full = aset.append_gated(A, b, st, 2, jnp.bool_(True))  # at capacity
    assert int(full.k) == 2
    np.testing.assert_array_equal(np.asarray(full.mask),
                                  np.asarray(st.mask))
    np.testing.assert_allclose(np.asarray(full.cols), np.asarray(st.cols))
    np.testing.assert_allclose(np.asarray(full.Atb), np.asarray(st.Atb))
    np.testing.assert_allclose(np.asarray(full.Ginv), np.asarray(st.Ginv))


def test_append_col_gated_rejects_in_span_column():
    # a column numerically inside the active span must be rejected: if it
    # enters, the exact Gram is singular and the next refresh/delete
    # Cholesky silently returns NaN for the whole solve. BOTH dtypes: the
    # threshold must be dtype-realistic (a fixed 1e-12 sits far below f32
    # Gram rounding noise and only happened to work in f64)
    from cstpu.ops import active_set as aset

    for dtype in (jnp.float64, jnp.float32):
        key = jax.random.PRNGKey(4)
        A0 = jax.random.normal(key, (16, 4), dtype)
        A = jnp.concatenate([A0, A0[:, 0:1]], axis=1)  # col 4 dups col 0
        A = A / jnp.linalg.norm(A, axis=0, keepdims=True)
        b = A[:, 0] + A[:, 1]
        st = aset.empty(16, 4, 5, dtype)
        st = aset.append_gated(A, b, st, 0, jnp.bool_(True))
        dup = aset.append_gated(A, b, st, 4, jnp.bool_(True))
        assert int(dup.k) == 1, dtype  # rejected
        st = aset.append_gated(A, b, dup, 1, jnp.bool_(True))
        st = aset.refit(aset.delete(st, jnp.int32(0), 5))
        assert bool(jnp.all(jnp.isfinite(st.Ginv))), dtype
        assert bool(jnp.all(jnp.isfinite(st.coef))), dtype


def test_supported_select_respects_corr_dtype():
    # an f32 correlation stream halves the largest streamable n: the gate
    # must check the ACTUAL streaming dtype or dispatch crashes where the
    # contract promises an XLA fallback (n in (16384, 32768] fits a
    # 128-atom bf16 tile in the 8 MB budget but not an f32 one)
    from cstpu.ops.stream_select import supported_select

    A = jax.ShapeDtypeStruct((20480, 1024), jnp.float32)
    assert supported_select(A, 8, jnp.bfloat16)
    assert not supported_select(A, 8, jnp.float32)
