"""Test mode: per-scene scene-flow dumps + MOS / cluster evaluation.

Re-implements the reference's libs/tester.py:23-114: for every scene of the
test split, run the full test-time pipeline (forward + on-device
clustering + instance reconstruction), compute per-point end-point error
against the GT reconstruction, and dump `results/<exp>/<scene>/
flow_error.npz` with the same schema (fp16 epe / relative error, int8
time index, bool labels). MOS IoU and instance-cluster metrics are
accumulated across scenes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pcaccumulation_tpu.data.dataset import SceneDataset
from pcaccumulation_tpu.data.loader import make_loader
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.train.cluster_eval import ClusterEvaluation
from pcaccumulation_tpu.train.loss import compute_iou_stats
from pcaccumulation_tpu.train.metrics import (
    compute_mean_iou_recall_precision,
    init_stats_meter,
    update_stats_meter,
)
from pcaccumulation_tpu.train.trainer import MOS_CLASSES
from pcaccumulation_tpu.utils.checkpoint import load_checkpoint, partial_load
from pcaccumulation_tpu.utils.logging import Logger

_EPS = 1e-7


class Tester:
    def __init__(self, cfg, model, save_dir=None, variables=None):
        self.cfg = cfg
        self.model = model
        self.save_dir = save_dir or os.path.join("snapshot", cfg["misc"]["exp_name"])
        self.logger = Logger(self.save_dir)
        self.n_frames = cfg["voxel_generator"]["n_sweeps"]
        self.variables = variables
        if self.variables is None:
            self._init_variables()
        self._build_step()

    def _init_variables(self):
        ds = SceneDataset(self.cfg, "test", augment=False)
        sample = ds[0]
        jbatch = jax.tree.map(lambda x: jnp.asarray(x)[None], sample)
        init_fn = jax.jit(
            lambda rngs, b: self.model.init(rngs, b, train=False, mode="val")
        )
        self.variables = init_fn(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
        )
        pretrain = self.cfg["misc"].get("pretrain", "")
        if pretrain:
            state = load_checkpoint(pretrain)
            self.variables = {
                "params": partial_load(state["params"], self.variables["params"]),
                "batch_stats": partial_load(
                    state["batch_stats"], self.variables.get("batch_stats", {})
                ),
            }
            self.logger.write(f"Loaded checkpoint {pretrain}\n")

    def _build_step(self):
        model = self.model

        def step(variables, batch, rng):
            results = model.apply(
                variables, batch, train=False, mode="test",
                rngs={"sample": rng},
            )
            # GT flow: ego compensation + GT instance reconstruction
            # (tester.py:67-68)
            points = batch["points"].astype(jnp.float32)
            tid = batch["time_idx"]
            comp_gt = se3.ego_motion_compensation(
                points, tid, batch["ego_motion_gt"].astype(jnp.float32)
            )
            b, n, _ = points.shape
            k = batch["inst_motion_gt"].shape[1]
            gid = (jnp.arange(b, dtype=jnp.int32)[:, None] * k + batch["inst_labels"]).reshape(-1)
            rec_gt = se3.reconstruct_sequence(
                comp_gt.reshape(-1, 3), tid.reshape(-1), gid,
                batch["inst_motion_gt"].astype(jnp.float32).reshape(b * k, -1, 4, 4),
            ).reshape(b, n, 3)

            est_flow = results["rec_est"] - points
            gt_flow = rec_gt - points
            epe = jnp.linalg.norm(est_flow - gt_flow, axis=-1)
            rel = epe / (jnp.linalg.norm(gt_flow, axis=-1) + _EPS)

            fb_mask = (
                (batch["fb_labels"] == 1) | (results["fb_est_per_points"] == 1)
            ) & batch["point_valid"]
            mos_metric = compute_iou_stats(
                jnp.argmax(results["mos_est"], -1).reshape(-1),
                batch["sd_labels"].reshape(-1),
                fb_mask.reshape(-1),
            )
            return {
                "epe": epe,
                "rel": rel,
                "mos_metric": mos_metric,
                "inst_labels_est": results["inst_labels_est"],
            }

        self._step = jax.jit(step)

    def test(self):
        cfg = self.cfg
        exp = cfg["misc"]["exp_name"]
        base = SceneDataset(cfg, "test", augment=False)
        scenes = base.scenes()
        stats_meter = None
        cluster_eval = ClusterEvaluation(self.save_dir)

        for scene in scenes:
            ds = SceneDataset(cfg, "test", augment=False, scene_name=scene)
            loader = make_loader(ds, batch_size=1, shuffle=False,
                                 num_workers=cfg["test"]["num_workers"],
                                 mode=cfg["test"].get("worker_mode", "thread"),
                                 drop_last=False)
            buf = {k: [] for k in ("fb_label", "sd_label", "epe_per_point",
                                   "relative_error", "time_indice")}

            def consume(dev_out, batch):
                nonlocal stats_meter
                out = jax.tree.map(np.asarray, dev_out)
                valid = batch["point_valid"][0]
                tid = batch["time_idx"][0]
                sel = valid & (tid > 0)  # tester.py:85: exclude the anchor
                buf["fb_label"].append(batch["fb_labels"][0][sel].astype(bool))
                buf["sd_label"].append(batch["sd_labels"][0][sel].astype(bool))
                buf["epe_per_point"].append(out["epe"][0][sel].astype(np.float16))
                buf["relative_error"].append(out["rel"][0][sel].astype(np.float16))
                buf["time_indice"].append(tid[sel].astype(np.int8))

                if stats_meter is None:
                    stats_meter = init_stats_meter(out["mos_metric"])
                update_stats_meter(stats_meter, out["mos_metric"])

                cluster_eval.add(
                    out["inst_labels_est"][0], batch["inst_labels"][0],
                    batch["sd_labels"][0], valid,
                )

            # one-sample-delayed fetch: the host transfer of sample i-1
            # overlaps sample i's device compute (same pattern as the
            # trainer's stats pipeline)
            pending = None
            for it, batch in enumerate(loader):
                jbatch = jax.tree.map(jnp.asarray, batch)
                dev_out = self._step(self.variables, jbatch, jax.random.key(it))
                if pending is not None:
                    consume(*pending)
                pending = (dev_out, batch)
            if pending is not None:
                consume(*pending)

            scene_dir = os.path.join("results", exp, scene)
            os.makedirs(scene_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(scene_dir, "flow_error.npz"),
                **{k: np.concatenate(v) if v else np.zeros(0) for k, v in buf.items()},
            )
            self.logger.write(f"scene {scene}: dumped flow_error.npz\n")

        self.logger.write("Motion segmentation results\n")
        _, msg = compute_mean_iou_recall_precision(stats_meter, MOS_CLASSES)
        self.logger.write(msg)
        self.logger.write("cluster results from offseted points\n")
        cluster_eval.final_eval()
        return stats_meter
