"""Checkpoint / resume for long reachability solves.

The reference documents ``saveFilename/saveFrequency`` but never implements
them (``hji_solver.py:116-118`` — survey §5.4); its only real resume path is
passing a stacked ``data0`` to continue from the last slice
(``hji_solver.py:487-501``).  Here checkpointing is explicit and complete:
any pytree (a :class:`~levelsetpy_tpu.solver.SolveResult`, a raw value
function + time, solver configs) round-trips through orbax when available,
with a numpy ``.npz`` fallback, and :func:`resume_tau` reproduces the
reference's continue-from-last-slice semantics for chaining solves.
"""
from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "resume_tau"]


def save_checkpoint(path, tree: Any, metadata: dict | None = None) -> None:
    """Persist a pytree of arrays.  Uses orbax when importable (async-safe,
    sharded-array aware), else a flat ``.npz``."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            ckptr.save(path.resolve(), tree, force=True)
        if metadata:
            (path / "levelsetpy_meta.json").write_text(json.dumps(metadata))
        return
    except (ImportError, Exception):  # noqa: BLE001 - fall back to npz
        pass
    leaves, treedef = jax.tree.flatten(tree)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path.with_suffix(".npz"),
        *[np.asarray(leaf) for leaf in leaves],
        __treedef__=np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8),
        __meta__=np.frombuffer(
            json.dumps(metadata or {}).encode(), dtype=np.uint8),
    )


def load_checkpoint(path, like: Any | None = None):
    """Load a checkpoint saved by :func:`save_checkpoint`.  ``like`` (an
    abstract or concrete pytree of matching structure) restores the exact
    pytree structure; without it, orbax returns its standard dict layout and
    the npz fallback returns the flat leaf list."""
    path = pathlib.Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            if like is not None:
                return ckptr.restore(path.resolve(), item=like)
            return ckptr.restore(path.resolve())
    data = np.load(path.with_suffix(".npz"))
    leaves = [data[k] for k in data.files
              if not k.startswith("__")]
    if like is not None:
        treedef = jax.tree.structure(like)
        return jax.tree.unflatten(treedef, leaves)
    return leaves


def resume_tau(tau_done, tau_more):
    """Checkpoint-chaining helper: given the tau grid a finished solve
    covered and additional horizon points, return the tau vector for the
    continuation solve (starting at the finished solve's last time) — the
    reference's ``extraArgs.istart`` continuation (``hji_solver.py:487-501``)
    made explicit."""
    import jax.numpy as jnp

    tau_done = jnp.asarray(tau_done)
    tau_more = jnp.asarray(tau_more)
    return jnp.concatenate([tau_done[-1:], tau_more])
