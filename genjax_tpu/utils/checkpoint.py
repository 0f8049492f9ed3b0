"""Checkpoint / resume for inference state: traces, particle collections,
chain states — any framework pytree — via Orbax (async-capable, sharding
aware) with a plain-numpy fallback.

New scope relative to the reference (SURVEY §5: "Checkpoint/resume: None.
Traces/ChoiceMaps are pytrees so they are trivially serializable, but no
save/load code exists"). The structural (static) part of a pytree is
reconstructed from a caller-provided ``like`` template, so restoration is
robust across processes.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint"]


def _flatten(state: Any):
    leaves, treedef = jtu.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree's array leaves to ``path`` (a directory for Orbax, a
    ``.npz`` file for the numpy fallback)."""
    if path.endswith(".npz"):
        leaves, _ = _flatten(state)
        np.savez(
            path, **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
        )
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`; ``like`` supplies
    the static structure (an exemplar state, e.g. a zero trace).

    Cross-topology restore (the elastic down-shift scenario,
    ``utils/failure.py``): leaves of ``like`` that are committed
    ``jax.Array``\\s carry their SHARDING into the Orbax restore target,
    so a checkpoint saved on an 8-device mesh restores directly onto a
    template laid out over 4 devices (or any other healthy topology) —
    no unsharded intermediate, and no "unsafe when restoring on a
    different topology" fallback. Templates of plain numpy/python
    leaves restore unsharded as before."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves, treedef = _flatten(like)
        restored = [
            jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
        ]
        return jtu.tree_unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    leaves, treedef = _flatten(like)

    def _abstract(v):
        # Any jax.Array template leaf carries a sharding (explicit mesh
        # placement or the default single-device one) — by construction
        # it lives on healthy devices, so it is always a valid restore
        # target; plain numpy/python leaves restore unsharded.
        sharding = getattr(v, "sharding", None)
        if sharding is not None:
            return jax.ShapeDtypeStruct(
                jnp.shape(v), jnp.asarray(v).dtype, sharding=sharding
            )
        return jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype)

    abstract = jtu.tree_unflatten(treedef, [_abstract(v) for v in leaves])
    return ckptr.restore(os.path.abspath(path), abstract)
