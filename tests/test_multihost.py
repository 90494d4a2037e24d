"""Multi-process (DCN) path of parallel/mesh.py, executed for real.

The reference is single-GPU; the multi-host input path
(`initialize_multihost` + `global_batch_from_host_local`) is this
rebuild's own component, so it gets its own proof: the test spawns TWO
actual Python processes, each with 2 virtual CPU devices, federates them
through `jax.distributed.initialize` (Gloo collectives), builds the
global 4-device mesh, assembles a globally-sharded batch from each
process's local shard, and runs jitted data-parallel train steps whose
gradient psum crosses the process boundary. Both processes must agree on
the loss and on the updated parameters bit-for-bit (allreduce output is
identical on every rank).

The worker deliberately runs a small dense model, not MotionNet: the
numerical DP-equivalence of the full model is pinned single-process by
tests/test_parallel.py; THIS test pins the distributed machinery (which
is model-agnostic) without paying a per-process XLA compile of the full
graph.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
hybrid = len(sys.argv) > 3 and sys.argv[3] == "hybrid"

import jax
jax.config.update("jax_platforms", "cpu")   # the axon TPU plugin ignores env
jax.config.update("jax_num_cpu_devices", 2)

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from pcaccumulation_tpu.parallel.mesh import (
    DATA_AXIS, FRAME_AXIS,
    global_batch_from_host_local, initialize_multihost, make_mesh, replicate)

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2 and len(jax.devices()) == 4

# hybrid: the (2 data x 2 frame) mesh SPANS the two processes — the frame
# axis crosses the DCN boundary, so the activation constraint below forces
# cross-process collectives beyond the gradient psum
mesh = make_mesh(frame_devices=2) if hybrid else make_mesh()
# each process holds only ITS slice of the global batch (per-host sharded
# file lists — data/loader.py make_loader(process_id=...))
rng = np.random.default_rng(100 + pid)
local_x = rng.normal(size=(2, 16)).astype(np.float32)
local_y = rng.normal(size=(2, 4)).astype(np.float32)
batch = global_batch_from_host_local({"x": local_x, "y": local_y}, mesh)

w_rng = np.random.default_rng(7)  # identical init on every process
params = {"w": jnp.asarray(w_rng.normal(size=(16, 4)).astype(np.float32)),
          "b": jnp.zeros((4,), jnp.float32)}
params = replicate(params, mesh)
tx = optax.sgd(0.1)
opt_state = replicate(tx.init(params), mesh)

def train_step(params, opt_state, batch):
    def loss_fn(p):
        pred = batch["x"] @ p["w"] + p["b"]
        if hybrid:
            # shard the activation over BOTH mesh axes (the MotionNet
            # frame-SP pattern: [rows, frames, c] constrained to
            # (data, frame)) before the loss reduces it back
            pred = jax.lax.with_sharding_constraint(
                pred.reshape(pred.shape[0], 2, 2), P(DATA_AXIS, FRAME_AXIS)
            ).reshape(pred.shape)
        return jnp.mean((pred - batch["y"]) ** 2)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

with mesh:
    step = jax.jit(train_step)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, batch)

# every rank must see the same allreduced loss and parameters
w_local = np.asarray(jax.device_get(params["w"]))
print("MHRESULT", pid, float(loss), float(np.abs(w_local).sum()), flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, mode=""):
    port = _free_port()
    env = dict(os.environ)
    # scrub the conftest's single-process 8-device forcing; the worker
    # configures its own platform via jax.config (env alone is not enough
    # to beat the axon plugin)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True, cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MHRESULT")]
        assert len(lines) == 1, out[-3000:]
        _, pid, loss, wsum = lines[0].split()
        results[int(pid)] = (float(loss), float(wsum))
    assert set(results) == {0, 1}
    # allreduce determinism: both ranks computed the identical global
    # gradient, so losses and updated params agree exactly
    np.testing.assert_array_equal(
        np.asarray(results[0]), np.asarray(results[1]))
    return results


def test_two_process_dcn_train_step(tmp_path):
    _run_two_process(tmp_path)


def test_two_process_dcn_hybrid_mesh(tmp_path):
    """The (2 data x 2 frame) hybrid mesh SPANNING the two processes: the
    frame axis crosses the DCN boundary, so the worker's activation
    sharding constraint (the MotionNet frame-SP pattern) makes GSPMD
    route model-axis collectives — not just the gradient psum — across
    processes. Same bit-exact cross-rank agreement criteria."""
    _run_two_process(tmp_path, mode="hybrid")
