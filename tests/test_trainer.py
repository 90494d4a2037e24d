"""Trainer smoke test: a few optimisation steps reduce the loss and
checkpoints round-trip."""

import numpy as np
import pytest

from test_model import tiny_cfg, tiny_batch


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from pcaccumulation_tpu.models import MotionNet
    from pcaccumulation_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    cfg["train"]["iter_size"] = 1
    cfg["train"]["batch_size"] = 1

    batches = [tiny_batch(cfg, seed=s) for s in (0, 1)]

    class FakeLoader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    model = MotionNet(cfg)
    save_dir = str(tmp_path_factory.mktemp("snap"))
    return Trainer(
        cfg, model, {"train": FakeLoader(), "val": FakeLoader()}, save_dir=save_dir
    )


def test_train_steps_and_loss_decreases(trainer):
    m0 = trainer.inference_one_epoch(1, "train")
    losses = []
    for epoch in range(2, 5):
        m = trainer.inference_one_epoch(epoch, "train")
        losses.append(m["loss"].avg)
    assert np.isfinite(losses[-1])
    assert losses[-1] < m0["loss"].avg, (m0["loss"].avg, losses)


def test_checkpoint_roundtrip(trainer):
    import jax
    import jax.numpy as jnp

    trainer.snapshot(1, "latest")
    before = jax.tree.map(np.asarray, trainer.params)
    # perturb then reload
    trainer.params = jax.tree.map(lambda x: x + 1.0, trainer.params)
    import os

    trainer.load_pretrain(os.path.join(trainer.save_dir, "model_latest.ckpt"))
    after = jax.tree.map(np.asarray, trainer.params)
    flat_b = jax.tree.leaves(before)
    flat_a = jax.tree.leaves(after)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b)


def test_val_epoch(trainer):
    meters = trainer.eval()
    assert "mos_metric" in meters
    assert np.isfinite(meters["loss"].avg)
