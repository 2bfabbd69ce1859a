"""Sparse Bayesian Learning family: sbl / fsbl / rmps + noise learning.

Covers the reference's test/sbl.jl workflow: the three SBL solvers
agree on the planted support at threshold sigma, the sigma^2 outer EM
loop recovers the injected noise level, and the zero-noise limit of
RMPS matches RMP. Adds the observability layer the reference lacks:
per-action marginal-likelihood traces.

Run:  python examples/02_sbl_noise_learning.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cstpu

A, x, b = cstpu.sparse_data(jax.random.PRNGKey(3), n=64, m=128, k=3)
true_support = cstpu.support(x)

sigma = 1e-2
y = cstpu.perturb(jax.random.PRNGKey(4), b, sigma / 2)

# --- the three SBL solvers agree at threshold sigma -----------------------
for name, run in {
    "sbl": lambda: cstpu.sbl(A, y, sigma),
    "fsbl": lambda: cstpu.fsbl(A, y, sigma),
    "rmps": lambda: cstpu.rmps(A, y, sigma),
}.items():
    xs = run()                                     # dense posterior mean
    got = np.flatnonzero(np.abs(np.asarray(xs)) > sigma)
    print(f"{name:5s} support@sigma {got.tolist()}")
    assert got.tolist() == list(true_support), name

# --- noise-variance learning (Inverse-Gamma prior EM) ---------------------
x_hat, sigma2 = cstpu.rmps_estimate_noise(A, y, sigma2_init=1e-2)
resid = float(jnp.linalg.norm(A @ x_hat - y))
print(f"learned sigma^2 = {sigma2:.2e} "
      f"(injected {(sigma/2)**2/len(y):.2e} per-sample), "
      f"residual {resid:.2e}")
assert resid < 5 * np.sqrt(sigma2 * len(y))        # reference's sanity bound

# --- zero-noise limit: RMPS -> RMP ----------------------------------------
x_rmps = cstpu.rmps(A, b, 1e-6)
sol_rmp = cstpu.rmp(A, b, delta=1e-6)
assert cstpu.samesupport(cstpu.droptol(x_rmps, 1e-6), sol_rmp)
print("zero-noise rmps support == rmp support")

# --- observability: which action moved the likelihood? --------------------
xs, tr = cstpu.fsbl_traced(A, y, sigma)
acts = {0: "add", 1: "del", 2: "upd"}
done = int(np.sum(np.asarray(tr.action) >= 0))
for t in range(min(done, 6)):
    print(f"  step {t}: {acts[int(tr.action[t])]:3s} atom "
          f"{int(tr.selected[t]):3d}  dL={float(tr.likelihood_delta[t]):.3e}"
          f"  |active|={int(tr.n_active[t])}")

xs, rtr = cstpu.rmps_traced(A, y, sigma)
it = int(np.sum(np.asarray(rtr.n_active) > 0))
print(f"rmps: {it} outer iterations, per-stage counts "
      f"added={np.asarray(rtr.n_added)[:it].tolist()} "
      f"deleted={np.asarray(rtr.n_deleted)[:it].tolist()}")

# --- batched: one dictionary, many noisy draws ----------------------------
Bs = jax.vmap(lambda kk: cstpu.perturb(kk, b, sigma / 2))(
    jax.random.split(jax.random.PRNGKey(5), 8))
Xs = cstpu.rmps_batch(A, Bs, sigma)                # (8, m) posterior means
rec = np.mean([
    np.array_equal(np.flatnonzero(np.abs(r) > sigma), true_support)
    for r in np.asarray(Xs)])
print(f"batched rmps support recovery {rec:.2f}")
assert rec == 1.0
print("OK")
