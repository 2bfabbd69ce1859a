"""Checkpoint / resume for solver state.

The reference's nearest analog is warm-starting (FR's support constructor,
RMPS's alpha carry-over — /root/reference/src/forward.jl:20-21,
/root/reference/src/sbl.jl:448-451). Here every solver state is a pytree
(ActiveSet, FBRState, SQState, SolveTrace, SparseSolution), so durable
checkpoint/resume is a thin orbax wrapper; long multi-stage solves (e.g.
the RMPS sigma^2 outer loop, reweighted BP) can persist and resume across
processes/hosts.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Persist a solver-state pytree (orbax if available, npz fallback)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        # real save errors must propagate — swallowing them would
        # silently switch formats mid-run and mask the actual failure
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, state, force=True)
    else:
        leaves, treedef = jax.tree.flatten(state)
        np.savez(path + ".npz",
                 treedef=np.frombuffer(
                     repr(treedef).encode(), dtype=np.uint8),
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, like):
    """Restore a solver-state pytree saved by `save_state`.

    `like` is a template pytree with the target structure (and, for orbax,
    the target shardings/dtypes).
    """
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None and os.path.isdir(path):
        ckpt = ocp.PyTreeCheckpointer()
        return ckpt.restore(path, item=like)
    else:
        # npz fallback (written when orbax was unavailable at save time)
        data = np.load(path + ".npz")
        leaves, treedef = jax.tree.flatten(like)
        new_leaves = [jax.numpy.asarray(data[f"leaf_{i}"])
                      for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, new_leaves)
