"""Checkpoint save / restore.

Mirrors the reference's policy (libs/trainer.py:65-110): a state dict of
{params, batch_stats, opt_state, epoch, best_loss, best_metric} saved as
rolling `model_best_loss` / `model_best_metric` / `model_latest`, with
partial (intersection-only) parameter loading for architecture drift
(toolbox/utils.py:16-24). Format: pickle of a host-numpy pytree — chosen
deliberately over orbax/msgpack because it round-trips the optax
NamedTuple optimizer state exactly, so resume restores the full
structure without a separately-kept template.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_host(state), f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


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
