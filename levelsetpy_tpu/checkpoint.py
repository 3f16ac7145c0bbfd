"""Checkpoint / resume for long reachability solves.

The reference documents ``saveFilename/saveFrequency`` but never implements
them (``hji_solver.py:116-118`` — survey §5.4); its only real resume path is
passing a stacked ``data0`` to continue from the last slice
(``hji_solver.py:487-501``).  Here checkpointing is explicit and complete:
any pytree (a :class:`~levelsetpy_tpu.solver.SolveResult`, a raw value
function + time, solver configs) round-trips through orbax when available,
with a numpy ``.npz`` fallback that pickles the treedef so the structure
round-trips WITHOUT a ``like`` template, and :func:`resume_tau` reproduces
the reference's continue-from-last-slice semantics for chaining solves.
"""
from __future__ import annotations

import json
import pathlib
import pickle
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "load_metadata", "resume_tau"]


def _npz_save(path: pathlib.Path, tree: Any, metadata: dict | None) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path.with_suffix(".npz"),
        *[np.asarray(leaf) for leaf in leaves],
        __treedef__=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
        __meta__=np.frombuffer(
            json.dumps(metadata or {}).encode(), dtype=np.uint8),
    )


def save_checkpoint(path, tree: Any, metadata: dict | None = None,
                    format: str = "auto") -> None:
    """Persist a pytree of arrays.

    ``format``: ``'orbax'`` (async-safe, sharded-array aware), ``'npz'``
    (flat numpy archive + pickled treedef), or ``'auto'`` — orbax when
    importable, else npz.  Errors from the chosen backend propagate (no
    silent format switching); only a missing orbax install falls back.
    """
    path = pathlib.Path(path)
    if format not in ("auto", "orbax", "npz"):
        raise ValueError(f"unknown checkpoint format {format!r}")
    if format in ("auto", "orbax"):
        try:
            import orbax.checkpoint as ocp
        except ImportError:
            if format == "orbax":
                raise
        else:
            with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
                ckptr.save(path.resolve(), tree, force=True)
            if metadata:
                (path / "levelsetpy_meta.json").write_text(
                    json.dumps(metadata))
            return
    _npz_save(path, tree, metadata)


def load_checkpoint(path, like: Any | None = None):
    """Load a checkpoint saved by :func:`save_checkpoint`.

    Orbax checkpoints (directories): ``like`` restores the exact pytree
    structure; without it, orbax returns its standard dict layout.  npz
    checkpoints round-trip the full structure with or without ``like``
    (the treedef is stored in the archive).
    """
    path = pathlib.Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            if like is not None:
                return ckptr.restore(path.resolve(), item=like)
            return ckptr.restore(path.resolve())
    data = np.load(path.with_suffix(".npz"))
    leaves = [data[k] for k in data.files if not k.startswith("__")]
    if like is not None:
        treedef = jax.tree.structure(like)
    else:
        treedef = pickle.loads(data["__treedef__"].tobytes())
    return jax.tree.unflatten(treedef, leaves)


def load_metadata(path) -> dict:
    """Metadata dict stored alongside a checkpoint (empty if none)."""
    path = pathlib.Path(path)
    if path.is_dir():
        meta = path / "levelsetpy_meta.json"
        return json.loads(meta.read_text()) if meta.exists() else {}
    data = np.load(path.with_suffix(".npz"))
    if "__meta__" in data.files:
        return json.loads(data["__meta__"].tobytes().decode())
    return {}


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
