"""Seeded synthetic problem generators.

Capability parity with the reference's data utilities
(/root/reference/src/util.jl:11-55), redesigned for JAX: every generator
takes an explicit PRNG key (the reference uses global RNG with no seeding,
which its own tests call out as a flakiness source), returns device arrays,
and takes a `dtype`. Generators produce single instances (vmap over split
keys for batches); `perturb` also accepts a batched (B, n) measurement
matrix and normalizes the noise per row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def sparse_vector(key, m: int, k: int, gaussian: bool = False, dtype=None):
    """Random k-sparse vector of length m with +-1 (default) or Gaussian
    nonzero entries on a uniformly random support.

    Parity: /root/reference/src/util.jl:13-19. Returns a dense (m,) array;
    use `cstpu.support(x)` to obtain the support index set.
    """
    if m < k:
        raise ValueError(f"m = {m} < {k} = k")
    dtype = dtype or _default_dtype()
    k_ind, k_val = jax.random.split(key)
    ind = jax.random.permutation(k_ind, m)[:k]
    if gaussian:
        vals = jax.random.normal(k_val, (k,), dtype=dtype)
    else:
        vals = jax.random.rademacher(k_val, (k,), dtype=dtype)
    return jnp.zeros((m,), dtype=dtype).at[ind].set(vals)


def sparse_data(key, n: int = 32, m: int = 64, k: int = 3,
                rescaled: bool = True, dtype=None):
    """Gaussian dictionary + k-sparse ground truth: returns (A, x, b = A @ x).

    If `rescaled`, columns are mean-nudged by 1e-6 and normalized to unit l2
    norm, mirroring /root/reference/src/util.jl:21-33.
    """
    dtype = dtype or _default_dtype()
    k_a, k_x = jax.random.split(key)
    A = jax.random.normal(k_a, (n, m), dtype=dtype)
    if rescaled:
        eps = 1e-6
        A = A - eps * jnp.mean(A, axis=0, keepdims=True)
        A = A / jnp.sqrt(jnp.sum(A * A, axis=0, keepdims=True))
    x = sparse_vector(k_x, m, k, dtype=dtype)
    b = A @ x
    return A, x, b


# alias, matching the reference naming (src/util.jl:32)
gaussian_data = sparse_data


def correlated_data(key, n: int, m: int, k: int, normalized: bool = True,
                    dtype=None, decay: float = 2.0):
    """Ill-conditioned dictionary A = U diag(1/i^decay) V with correlated
    columns — the hard benchmark family of the reference
    (/root/reference/src/util.jl:34-47; decay=2 is the reference's
    spectrum). Returns (A, x, b).

    At the reference's test sizes (n=32) decay=2 gives condition ~1e3; at
    large n it collapses the numerical rank entirely (sigma_i = i^-2), so
    large-scale benchmarks pass a gentler decay to keep recovery
    well-posed while remaining strongly correlated.
    """
    dtype = dtype or _default_dtype()
    k_u, k_v, k_x = jax.random.split(key, 3)
    U = jax.random.normal(k_u, (n, n), dtype=dtype)
    V = jax.random.normal(k_v, (n, m), dtype=dtype)
    s = 1.0 / jnp.arange(1, n + 1, dtype=dtype) ** decay
    A = (U * s[None, :]) @ V
    if normalized:
        A = A / jnp.sqrt(jnp.sum(A * A, axis=0, keepdims=True))
    x = sparse_vector(k_x, m, k, dtype=dtype)
    b = A @ x
    return A, x, b


coherent_data = correlated_data


def perturb(key, b, delta):
    """Add Gaussian noise rescaled to have exact l2 norm `delta`.

    Parity: /root/reference/src/util.jl:50-55. For a batched (B, n)
    measurement matrix, EACH ROW gets noise of exact norm `delta`
    (a global normalization would silently hand every instance
    ~delta/sqrt(B) noise).
    """
    e = jax.random.normal(key, b.shape, dtype=b.dtype)
    if b.ndim == 2:
        e = e * (delta / jnp.linalg.norm(e, axis=1, keepdims=True))
    else:
        e = e * (delta / jnp.linalg.norm(e))
    return b + e
