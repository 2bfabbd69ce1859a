"""Solver-config layer: validation, dispatch equivalence, JSON round-trip,
and preservation of the reference's literal defaults (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstpu import omp, sparse_data
from cstpu.utils.config import (SolverConfig, available_solvers, defaults,
                                solver_config)


def test_unknown_solver_rejected():
    with pytest.raises(KeyError):
        solver_config("nope")


def test_unknown_parameter_rejected():
    with pytest.raises(TypeError, match="sparsityy"):
        solver_config("fr", sparsityy=3)


def test_run_matches_direct_call():
    A, x, b = sparse_data(jax.random.PRNGKey(7), n=32, m=64, k=3)
    cfg = solver_config("omp", k=3)
    sol = cfg.run(A, b)
    ref = omp(A, b, 3)
    np.testing.assert_array_equal(np.asarray(sol.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(sol.val), np.asarray(ref.val))


def test_run_batch_dispatches():
    A, x, b = sparse_data(jax.random.PRNGKey(8), n=32, m=64, k=3)
    Bs = jnp.stack([b, 2.0 * b])
    sol = solver_config("omp", k=3).run_batch(A, Bs)
    assert sol.idx.shape[0] == 2
    ref = omp(A, b, 3)
    got0 = np.asarray(sol.idx[0])[np.asarray(sol.mask[0])]
    np.testing.assert_array_equal(np.sort(got0), ref.nzind)


def test_run_batch_kwargs_forwarding():
    # rmps_batch forwards **kw — validation must not reject its params
    A, x, b = sparse_data(jax.random.PRNGKey(9), n=32, m=64, k=3)
    Bs = jnp.stack([b, 2.0 * b])
    sol = solver_config("rmps", maxiter=8).run_batch(A, Bs, sigma=1e-4)
    assert np.asarray(sol).shape == (2, 64)


def test_json_round_trip():
    cfg = solver_config("sp", k=4, delta=1e-6)
    cfg2 = SolverConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.kwargs() == {"k": 4, "delta": 1e-6}


def test_hashable_for_sweep_grids():
    grid = {solver_config("omp", k=k) for k in (2, 3, 3)}
    assert len(grid) == 2


def test_reference_defaults_preserved():
    # literal defaults from the reference are the conformance contract
    assert defaults("sbl")["min_change"] == 1e-6      # src/sbl.jl:39
    assert defaults("fsbl")["min_increase"] == 1e-6   # src/sbl.jl:148
    assert defaults("bp_candes")["eps"] == 1e-2       # src/basispursuit.jl:42
    assert defaults("bp_candes")["maxiter"] == 8      # src/basispursuit.jl:19
    assert defaults("ista")["maxiter"] == 1024        # src/basispursuit.jl:165
    assert defaults("ista")["stepsize"] == 1e-2       # src/basispursuit.jl:165
    assert defaults("srr")["initialization"] == 1     # src/twostage.jl:4
    assert defaults("rmp")["maxiter"] == 1            # src/stepwise.jl:5


def test_available_solvers_cover_reference_surface():
    names = available_solvers()
    for s in ("mp", "omp", "gomp", "fr", "br", "fbr", "lace", "sp", "ompr",
              "srr", "rmp", "foba", "sbl", "fsbl", "rmps", "bp", "bpd",
              "ista", "fista"):
        assert s in names["single"]
    for s in ("omp", "fr", "fbr", "rmps"):
        assert s in names["batched"]


def test_solver_config_numpy_scalars_serialize():
    # sweeping values out of an array hands numpy scalars to the config;
    # they must not break hashability or JSON round-tripping
    import numpy as np
    from cstpu.utils.config import SolverConfig, solver_config

    cfg = solver_config("omp", k=np.int64(8))
    hash(cfg)
    s = cfg.to_json()
    assert SolverConfig.from_json(s) == cfg
