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
    # duplicate columns -> equal scores; lowest index must win
    n, m = 32, 256
    A = np.zeros((n, m), np.float32)
    A[0, 7] = 1.0
    A[0, 200] = 1.0  # same column later on (cross-tile when tile=128)
    r = np.zeros((n,), np.float32)
    r[0] = 1.0
    idx, val = correlate_argmax(jnp.asarray(A), jnp.asarray(r), interpret=True)
    assert int(idx) == 7
    np.testing.assert_allclose(float(val), 1.0, rtol=1e-6)


def test_supported():
    A = jnp.zeros((32, 128), jnp.float32)
    r = jnp.zeros((32,), jnp.float32)
    assert supported(A, r)
    A_bad = jnp.zeros((32, 100), jnp.float32)
    assert not supported(A_bad, r)
