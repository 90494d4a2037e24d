"""Deployment inference API: a persistent, jit-once scene-flow predictor.

The reference has no serving layer (its only inference surface is the
per-scene test loop, libs/tester.py:23-114, which requires full GT
labels). This module exposes the same test-time pipeline — voxelize ->
MotionNet forward with on-device clustering and instance reconstruction
— as a label-free library API for production use:

    pred = Predictor(cfg, ckpt_path="snapshot/exp/model_best_metric.ckpt")
    out = pred.predict(points, time_idx)       # one T-frame sequence
    for out in pred.predict_stream(scans):     # overlapped host/device
        ...
    pred.export("model.pcx.npz")               # AOT deployment artifact

    served = ExportedPredictor("model.pcx.npz")  # no flax / ckpt needed
    out = served.predict(points, time_idx)

Input is the raw sensor stream contract (per-frame sensor-coordinate
points + frame index, exactly `raw_points`/`time_indice` of the dataset
contract, SURVEY §2.3); no labels are needed. Outputs are trimmed to the
points that survived crop/ground filtering.
"""

from __future__ import annotations

import collections
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from pcaccumulation_tpu.data.dataset import prep_sample
from pcaccumulation_tpu.data.loader import collate
from pcaccumulation_tpu.models import MotionNet
from pcaccumulation_tpu.utils.checkpoint import load_checkpoint, partial_load


# LRU-bounded: one jitted step per model config. Keyed by the full config
# repr, so a long-lived process serving many distinct configs would
# otherwise grow without bound (each entry pins an XLA executable).
_STEP_CACHE: "collections.OrderedDict[str, object]" = collections.OrderedDict()
_STEP_CACHE_MAX = 8

# bump when the artifact schema below changes (keys, blob semantics)
# v2: transformed_points left off the device outputs (recomputed on host
#     from points + ego_motion), mos/fb/inst narrowed to uint8/uint16
EXPORT_FORMAT_VERSION = 2

# batch fields that are IDENTICAL every serving call (the neutral-GT
# contract `_wrap` builds: zero labels, identity poses). They live on the
# device once instead of riding the H2D transfer of every predict — at
# nuScenes capacities that is ~2 MB/call, and serving measured
# TRANSFER-bound through a network-attached device (tools/PROFILE_r12.md)
_CONST_KEYS = ("sd_labels", "fb_labels", "inst_labels", "sem_labels",
               "ego_motion_gt", "inst_motion_gt")


def _mesh_key(mesh):
    """Cache-key signature of a mesh (None = single-device serving)."""
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), tuple(mesh.devices.shape),
            tuple(d.id for d in mesh.devices.flat))


def _get_step(model, mesh=None):
    """ONE jitted step per (model config, mesh), shared across Predictors.

    Two per-instance `jax.jit(lambda ...)` wrappers defined at the same
    code location over equal-by-config flax modules collided in jax's
    dispatch cache ("Execution supplied 199 buffers but compiled program
    expected 201"); sharing a single wrapper per config makes the reuse
    explicit and collision-free."""
    # flax module repr includes the full config; the mesh changes the
    # compiled partitioning, so it is part of the key
    key = (repr(model), _mesh_key(mesh))
    fn = _STEP_CACHE.get(key)
    if fn is not None:
        _STEP_CACHE.move_to_end(key)
        return fn

    def step(variables, batch, rng, _model=model):
        r = _model.apply(variables, batch, train=False, mode="test",
                         rngs={"sample": rng})
        # D2H is the serving bottleneck on network-attached devices
        # (tools/PROFILE_r12.md): label outputs ship narrow (values are
        # {0,1} / canonicalised 0..C instance ids), and transformed_points
        # ships not at all — it is exactly ego_motion_compensation(points,
        # time_idx, ego_motion_est) (models/motionnet.py:450), which the
        # host recomputes from outputs it already holds
        return {
            "rec_points": r["rec_est"],
            "ego_motion": r["ego_motion_est"],
            "mos": jnp.argmax(r["mos_est"], -1).astype(jnp.uint8),
            "fb": r["fb_est_per_points"].astype(jnp.uint8),
            "inst_labels": r["inst_labels_est"].astype(jnp.uint16),
            "offset": r["offset_est"],
        }

    fn = _STEP_CACHE.setdefault(key, jax.jit(step))
    _STEP_CACHE.move_to_end(key)
    while len(_STEP_CACHE) > _STEP_CACHE_MAX:
        _STEP_CACHE.popitem(last=False)
    return fn


class Predictor:
    """Jit-once predictor over fixed capacities (cfg["capacity"]).

    Every call pads to the same static shapes, so the XLA program
    compiles exactly once; sequences larger than the capacities are
    truncated the same way the training pipeline truncates.
    """

    def __init__(self, cfg, variables=None, ckpt_path: str | None = None,
                 rng_seed: int = 0, mesh=None):
        """mesh: optional `jax.sharding.Mesh` for LATENCY-SHARDED serving —
        the single sequence's backbone is partitioned over the mesh's
        frame/spatial axes (enable via cfg["parallel"]["frame_devices"] /
        ["spatial_devices"], exactly as in training; the data axis is
        useless at B=1). Inputs are replicated; the model's own sharding
        constraints (models/motionnet.py) split the per-frame UNet and
        BEV bands across devices, cutting the measured ~50 ms single-chip
        device floor the way frame-SP cuts the train step. Output
        equality vs mesh-less serving is pinned by
        tests/test_serve.py::test_predict_on_mesh_matches_single_device."""
        self.cfg = cfg
        self.n_frames = cfg["voxel_generator"]["n_sweeps"]
        self.model = MotionNet(cfg)
        self.mesh = mesh
        # fixed key: inference is DETERMINISTIC (same input -> same output);
        # the "sample" rng only drives ego-motion keypoint subsampling
        self._rng = jax.random.key(rng_seed)

        batch = collate([prep_sample(self._dummy_scan(), cfg, augment=False)])
        jbatch = jax.tree.map(jnp.asarray, batch)
        if variables is None:
            init_fn = jax.jit(
                lambda rngs, b: self.model.init(rngs, b, train=False, mode="val")
            )
            with self._mesh_ctx():
                variables = init_fn(
                    {"params": jax.random.key(0), "sample": jax.random.key(1)},
                    jbatch,
                )
            if ckpt_path:
                state = load_checkpoint(ckpt_path)
                variables = dict(variables)
                variables["params"] = partial_load(
                    state["params"], variables["params"]
                )
                if "batch_stats" in state and state["batch_stats"]:
                    variables["batch_stats"] = partial_load(
                        state["batch_stats"], variables["batch_stats"]
                    )
        if mesh is not None:
            from pcaccumulation_tpu.parallel.mesh import replicate

            variables = replicate(variables, mesh)
        self.variables = variables

        self._step = _get_step(self.model, mesh)
        self._const_dev = None  # first _to_device call captures _CONST_KEYS

    def _mesh_ctx(self):
        """Ambient-mesh context (the model's bare-P sharding constraints
        resolve against it at trace time); no-op without a mesh."""
        import contextlib

        return self.mesh if self.mesh is not None else contextlib.nullcontext()

    def _dummy_scan(self):
        t = self.n_frames
        pts = np.random.default_rng(0).uniform(-20, 20, (t * 64, 3)).astype(np.float32)
        pts[:, 2] = np.abs(pts[:, 2]) * 0.1 + 0.5
        return self._wrap(pts, np.repeat(np.arange(t), 64).astype(np.int32))

    def _wrap(self, points, time_idx):
        """Raw scan -> the dataset dict contract with neutral GT (the GT
        fields only feed metric outputs in test mode). Validates the raw
        sensor contract up front — a malformed scan must fail with a
        clear message here, not as garbage labels or an index error deep
        in postprocessing."""
        t = self.n_frames
        points = np.asarray(points, np.float32)
        time_idx = np.asarray(time_idx)
        if points.ndim != 2 or points.shape[1] != 3:
            raise ValueError(
                f"points must be [m, 3] sensor-frame xyz; got {points.shape}")
        if time_idx.shape != (points.shape[0],):
            raise ValueError(
                f"time_idx must be [m] = [{points.shape[0]}] frame indices; "
                f"got {time_idx.shape}")
        if not np.issubdtype(time_idx.dtype, np.integer):
            raise ValueError(f"time_idx must be integer, got {time_idx.dtype}")
        if time_idx.size and (time_idx.min() < 0 or time_idx.max() >= t):
            raise ValueError(
                f"time_idx values must lie in [0, n_frames={t}); got "
                f"[{time_idx.min()}, {time_idx.max()}]")
        m = points.shape[0]
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (t, 4, 4)).copy()
        k = self.cfg["capacity"]["max_instances"]
        inst_eye = np.broadcast_to(
            np.eye(4, dtype=np.float32), (k, t, 4, 4)
        ).copy()
        zeros = np.zeros(m, np.int32)
        return {
            "raw_points": np.asarray(points, np.float32),
            "time_indice": np.asarray(time_idx, np.int32),
            "sd_labels": zeros, "fb_labels": zeros, "inst_labels": zeros,
            "sem_labels": zeros, "ego_motion_gt": eye, "bbox_tsfm": inst_eye,
        }

    def _prep(self, points, time_idx):
        # with_labels=False: the neutral zero labels need no gathering,
        # and their device copies are the cached _CONST_KEYS anyway
        return collate([
            prep_sample(self._wrap(points, time_idx), self.cfg,
                        augment=False, with_labels=False)
        ])

    def _invoke(self, jbatch):
        with self._mesh_ctx():  # trace-time: constraints bind to the mesh
            return self._step(self.variables, jbatch, self._rng)

    def _to_device(self, batch):
        """Transfer a prepped batch, reusing the device-resident constant
        neutral-GT leaves (every serving batch carries identical zero
        labels / identity poses — see _CONST_KEYS).

        This substitution is only sound because every batch comes from
        `_wrap`, whose GT leaves are ALWAYS the neutral constants; a
        caller feeding real labels/poses through this path would see
        them silently dropped. Guard that contract cheaply: an all-zero
        scan of the int sd_labels array (~µs at 120k points, vs the ms
        transfer it gates) — assert-based, so `-O` removes it."""
        sd = np.asarray(batch["sd_labels"])
        assert sd.size == 0 or not sd.any(), (
            "_to_device caches neutral-GT leaves; batches with real "
            "labels must not flow through the serving path"
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())

            def put(x):  # replicate: B=1 inputs shard nothing themselves
                return jax.device_put(np.asarray(x), rep)
        else:
            put = jnp.asarray
        if self._const_dev is None:
            self._const_dev = {k: put(batch[k]) for k in _CONST_KEYS}
        const = self._const_dev
        return {k: const[k] if k in const else put(v)
                for k, v in batch.items()}

    def _postproc(self, batch, out):
        """Fetch + trim device outputs; rebuild the derived host outputs
        (flow, transformed_points) and restore the int32 label dtypes of
        the public API (the device ships them narrow)."""
        valid = np.asarray(batch["point_valid"][0])
        res = {k: np.asarray(v)[0][valid] for k, v in out.items()
               if k not in ("ego_motion",)}
        for k in ("mos", "fb", "inst_labels"):
            res[k] = res[k].astype(np.int32)
        res["points"] = np.asarray(batch["points"][0])[valid]
        res["time_idx"] = np.asarray(batch["time_idx"][0])[valid]
        res["flow"] = res["rec_points"] - res["points"]
        res["ego_motion"] = np.asarray(out["ego_motion"])[0]
        # == se3.ego_motion_compensation(points, time_idx, pose_est) on
        # the valid subset (models/motionnet.py:450), recomputed here to
        # keep [N, 3] floats off the D2H transfer
        rows = res["ego_motion"][res["time_idx"]]  # [n, 4, 4] gathered
        res["transformed_points"] = (
            np.einsum("nij,nj->ni", rows[:, :3, :3], res["points"])
            + rows[:, :3, 3]
        ).astype(np.float32)
        return res

    def _run(self, batch):
        return self._postproc(batch, self._invoke(self._to_device(batch)))

    def predict(self, points: np.ndarray, time_idx: np.ndarray) -> dict:
        """One T-frame sequence: points [m, 3] (per-frame sensor coords),
        time_idx [m] in [0, n_frames). Returns numpy arrays over the
        points that survived preprocessing: points, time_idx, rec_points
        (accumulated anchor-frame cloud), flow, mos (1 = moving), fb
        (1 = foreground), inst_labels, offset, and ego_motion [T, 4, 4]."""
        return self._run(self._prep(points, time_idx))

    def export(self, path: str) -> None:
        """AOT-export the test-mode step to a self-contained artifact.

        Serializes the jitted step via `jax.export` (StableHLO) with the
        trained variables BAKED IN as constants, bundled with the config
        (needed for host-side preprocessing) into one `.npz`. The file is
        loadable by `ExportedPredictor` with no model code, no checkpoint
        and no flax at serving time — the TPU-native analogue of a
        torchscript/ONNX deployment bundle (the reference has none; its
        only inference surface is libs/tester.py:23-114).

        The artifact targets the backend it was exported on
        (`jax.export` records the lowering platform); loading it on a
        different backend raises a clear error up front instead of an
        opaque StableHLO failure. Artifact schema (format_version 1):
        `cfg` (json), `blob` (serialized StableHLO), `platforms`,
        `key_data` + `key_impl` (the export-time PRNG key material, so a
        different serve-time jax_default_prng_impl cannot cause a silent
        shape mismatch), `format_version`. Schema (format_version 2):
        the device outputs omit `transformed_points` (recomputed on host
        from points + ego_motion) and ship mos/fb as uint8 and
        inst_labels as uint16 (see _get_step).
        """
        import json

        from jax import export as jexport

        if self.mesh is not None:
            raise NotImplementedError(
                "export targets single-device deployment artifacts; build "
                "the Predictor without a mesh to export, and pass mesh= at "
                "serve time for latency-sharded jit serving"
            )
        variables, step = self.variables, self._step

        def fn(batch, key_data):
            return step(variables, batch, jax.random.wrap_key_data(key_data))

        batch = collate([
            prep_sample(self._dummy_scan(), self.cfg, augment=False)
        ])
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.asarray(x).shape,
                                           jnp.asarray(x).dtype),
            batch,
        )
        key_data = jax.random.key_data(self._rng)
        exported = jexport.export(jax.jit(fn))(
            abstract,
            jax.ShapeDtypeStruct(key_data.shape, key_data.dtype),
        )
        np.savez(
            path,
            format_version=np.int32(EXPORT_FORMAT_VERSION),
            cfg=json.dumps(self.cfg),
            blob=np.frombuffer(exported.serialize(), np.uint8),
            platforms=np.array(list(exported.platforms)),
            key_data=np.asarray(key_data),
            key_impl=np.array(str(jax.random.key_impl(self._rng))),
        )

    def predict_stream(self, scans, prefetch: int = 2, depth: int = 1):
        """Iterate over (points, time_idx) pairs with a three-stage
        pipeline: a producer thread preprocesses AND starts the H2D
        transfer of the next scans while the device computes, and the
        blocking D2H fetch of each result is delayed `depth` items so it
        overlaps the next dispatch (jax dispatch is asynchronous). The
        serial per-item cost drops from prep + H2D + step + D2H to
        ~max(prep, step, transfers) — measured 1.9x on a network-attached
        device, where transfers dominate (tools/PROFILE_r12.md). Results
        arrive in input order."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        err: list = []

        def producer():
            try:
                for pts, tid in scans:
                    b = self._prep(pts, tid)
                    q.put((b, self._to_device(b)))  # async H2D here
            except Exception as e:  # propagate, never deadlock the consumer
                err.append(e)
            finally:
                q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        pending: collections.deque = collections.deque()
        while True:
            item = q.get()
            if item is None:
                break
            batch, jbatch = item
            pending.append((batch, self._invoke(jbatch)))  # async dispatch
            if len(pending) > depth:
                yield self._postproc(*pending.popleft())
        while pending:
            yield self._postproc(*pending.popleft())
        th.join()
        if err:
            raise err[0]


class ExportedPredictor(Predictor):
    """Serve from a `Predictor.export` artifact: weights and graph come
    from the serialized StableHLO blob (no flax module is built, no
    checkpoint is read); the bundled config drives the identical
    host-side preprocessing. Same `predict` / `predict_stream` API."""

    def __init__(self, path: str, rng_seed: int = 0):
        import json

        from jax import export as jexport

        with np.load(path, allow_pickle=False) as z:
            version = int(z["format_version"]) if "format_version" in z else 0
            if version != EXPORT_FORMAT_VERSION:
                raise ValueError(
                    f"export artifact {path!r} has format_version {version}; "
                    f"this build reads version {EXPORT_FORMAT_VERSION} — "
                    "re-export with Predictor.export"
                )
            cfg = json.loads(str(z["cfg"]))
            platforms = [str(p) for p in z["platforms"]]
            backend = jax.default_backend()
            if backend not in platforms:
                raise RuntimeError(
                    f"export artifact {path!r} was lowered for "
                    f"{platforms} but the current backend is "
                    f"{backend!r}; re-export on this platform (the "
                    "StableHLO blob bakes in platform-specific lowering)"
                )
            if rng_seed == 0:
                # the export-time key material: immune to a serve-time
                # jax_default_prng_impl differing from export time
                key_data = jnp.asarray(z["key_data"])
            else:
                key_data = jax.random.key_data(
                    jax.random.key(rng_seed, impl=str(z["key_impl"])))
            exported = jexport.deserialize(z["blob"].tobytes())
        self.cfg = cfg
        self.n_frames = cfg["voxel_generator"]["n_sweeps"]
        self._key_data = key_data
        self._exported_call = jax.jit(exported.call)
        self.variables = None
        self.model = None
        self.mesh = None  # artifacts are single-device (see export())
        self._const_dev = None

    def export(self, path: str) -> None:
        raise NotImplementedError(
            "this Predictor was loaded FROM an export artifact; the "
            "artifact is the exported form — copy the file instead"
        )

    def _invoke(self, jbatch):
        return self._exported_call(jbatch, self._key_data)
