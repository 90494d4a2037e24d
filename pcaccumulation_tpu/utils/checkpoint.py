"""Checkpoint save / restore.

Mirrors the reference's policy (libs/trainer.py:65-110): a state dict of
{params, batch_stats, opt_state, epoch, best_loss, best_metric} saved as
rolling `model_best_loss` / `model_best_metric` / `model_latest`, with
partial (intersection-only) parameter loading for architecture drift
(toolbox/utils.py:16-24).

Two backends:
 - "pickle" (default): one file of a host-numpy pytree — round-trips the
   optax NamedTuple optimizer state exactly, so resume restores the full
   structure without a separately-kept template.
 - "orbax": an Orbax StandardCheckpointer directory (`<path>.orbax/`) —
   async-capable, multi-host-aware, and the durable production format.
   Restoring the NamedTuple structure needs a `target` template (a freshly
   initialised state of the same shape); without one, nested containers
   come back as plain dicts/lists.

`load_checkpoint` sniffs the format from what exists on disk, so the two
backends interoperate behind the same rolling-checkpoint paths.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    """Fetch every leaf to host numpy.

    Leaves sharded across PROCESSES (ZeRO-1 optimizer state over a data
    axis that spans hosts) are not fully addressable, so `np.asarray`
    would raise — gather them to a replicated global value first
    (process_allgather reshards to P() under the hood), exactly like a
    single-host save sees the full array."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x))
        return np.asarray(x)

    return jax.tree.map(fetch, tree)


def _orbax_dir(path: str) -> str:
    return os.path.abspath(path) + ".orbax"


def save_checkpoint(path: str, state: dict, backend: str = "pickle") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backend == "pickle":
        import shutil

        # drop any stale orbax dir at the same logical path: load sniffs
        # the pickle file first, so leaving both would shadow older data
        # after a backend migration (and vice versa below)
        shutil.rmtree(_orbax_dir(path), ignore_errors=True)
        with open(path, "wb") as f:
            pickle.dump(_to_host(state), f)
    elif backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        if os.path.isfile(path):
            os.remove(path)  # stale pickle would shadow the orbax restore
        target = _orbax_dir(path)
        shutil.rmtree(target, ignore_errors=True)  # rolling overwrite
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, _to_host(state))
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")


def load_checkpoint(path: str, target=None) -> dict:
    """Restore `path` (either backend). `target` is an optional pytree
    template; with the orbax backend it makes custom containers (optax
    NamedTuples) come back with their original structure."""
    if os.path.isfile(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    odir = _orbax_dir(path)
    if os.path.isdir(odir):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(
                odir, None if target is None else _to_host(target))
    raise FileNotFoundError(path)


def partial_load(saved_params: dict, init_params: dict) -> dict:
    """Keep saved entries whose path+shape match the freshly-initialised
    tree; everything else falls back to the init value
    (toolbox/utils.py:16-24 semantics)."""
    flat_saved = dict(
        jax.tree_util.tree_flatten_with_path(saved_params)[0]
        and {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(saved_params)[0]
        }
    )
    out_flat = []
    for key, init_v in jax.tree_util.tree_flatten_with_path(init_params)[0]:
        ks = jax.tree_util.keystr(key)
        v = flat_saved.get(ks)
        if v is not None and np.shape(v) == np.shape(init_v):
            out_flat.append(v)
        else:
            out_flat.append(init_v)
    treedef = jax.tree_util.tree_structure(init_params)
    return jax.tree_util.tree_unflatten(treedef, out_flat)
