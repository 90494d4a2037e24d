"""Checkpoint save/restore: pickle + orbax backends, partial loading."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pcaccumulation_tpu.utils.checkpoint import (
    load_checkpoint,
    partial_load,
    save_checkpoint,
)


def _make_state():
    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros(3)}}
    tx = optax.adam(1e-3)
    return {
        "epoch": 7,
        "params": params,
        "batch_stats": {"bn": {"mean": jnp.ones(3)}},
        "opt_state": tx.init(params),
        "best_loss": 1.25,
        "best_metric": 0.5,
    }


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_roundtrip(tmp_path, backend):
    state = _make_state()
    path = str(tmp_path / "model_latest.ckpt")
    save_checkpoint(path, state, backend=backend)
    # sniffing picks the right reader; the orbax restore gets the template
    out = load_checkpoint(path, target=state)
    assert int(np.asarray(out["epoch"])) == 7
    assert float(np.asarray(out["best_loss"])) == 1.25
    _assert_tree_equal(out["params"], state["params"])
    _assert_tree_equal(out["opt_state"], state["opt_state"])
    if backend == "orbax":
        # with a template the optax NamedTuple structure survives
        assert jax.tree.structure(out["opt_state"]) == jax.tree.structure(
            state["opt_state"])


@pytest.mark.parametrize("first,second", [("pickle", "orbax"),
                                          ("orbax", "pickle")])
def test_cross_backend_migration(tmp_path, first, second):
    """pickle <-> orbax migration: a run saved with one backend resumes
    under the other (production configs now default to orbax while the
    unit-test default stays pickle; load_checkpoint sniffs the format)."""
    state = _make_state()
    path = str(tmp_path / "model_latest.ckpt")
    save_checkpoint(path, state, backend=first)
    mid = load_checkpoint(path, target=state)
    _assert_tree_equal(mid["params"], state["params"])
    # resume continues, next snapshot written by the OTHER backend
    mid["epoch"] = 8
    save_checkpoint(path, mid, backend=second)
    out = load_checkpoint(path, target=state)
    assert int(np.asarray(out["epoch"])) == 8
    _assert_tree_equal(out["params"], state["params"])
    _assert_tree_equal(out["opt_state"], state["opt_state"])


def test_production_configs_default_to_orbax():
    from pcaccumulation_tpu.config import load_config

    for name in ("nuscene", "waymo"):
        cfg = load_config(f"configs/{name}.yaml")
        assert cfg["train"]["ckpt_backend"] == "orbax", name
        # the dataset yaml's partial train block must not clobber defaults
        assert cfg["train"]["batch_size"] == 4
        assert cfg["train"]["grad_clip"] == 1.0


def test_orbax_rolling_overwrite(tmp_path):
    state = _make_state()
    path = str(tmp_path / "model_best_loss.ckpt")
    save_checkpoint(path, state, backend="orbax")
    state["epoch"] = 9
    save_checkpoint(path, state, backend="orbax")  # must not error/append
    out = load_checkpoint(path)
    assert int(np.asarray(out["epoch"])) == 9


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(str(tmp_path / "nope.ckpt"))


def test_unknown_backend(tmp_path):
    with pytest.raises(ValueError):
        save_checkpoint(str(tmp_path / "x.ckpt"), {"a": 1}, backend="msgpack")


def test_partial_load_shape_filter():
    saved = {"a": np.ones((2, 3)), "b": np.ones(4), "extra": np.ones(1)}
    init = {"a": np.zeros((2, 3)), "b": np.zeros(5), "c": np.zeros(2)}
    out = partial_load(saved, init)
    np.testing.assert_array_equal(out["a"], np.ones((2, 3)))  # kept
    np.testing.assert_array_equal(out["b"], np.zeros(5))      # shape mismatch
    np.testing.assert_array_equal(out["c"], np.zeros(2))      # missing
    assert "extra" not in out
