"""END-TO-END execution of the devkit-facing converter code via stub
injection (VERDICT r2, Missing #4).

The raw-data converters' pure math (window assembly, box extrapolation,
contract assembly) is fixture-tested in test_preprocess.py, but the
devkit-facing plumbing — `nuscenes_convert.convert` walking NuScenes
tables / `waymo_convert.convert` decoding TFRecords — had never executed
because nuscenes-devkit / waymo-open-dataset are absent from the image.
Here fake `nuscenes` / `waymo_open_dataset` modules (the
tests/ref_exec.py `_install_stubs` pattern) serve a small synthetic
world with exactly the devkit API surface the converters touch, so the
FULL codepath runs: scene iteration, sweep/`prev` chains, ego/calibration
pose composition, annotation velocity extrapolation, real
`tf.data.TFRecordDataset` decoding (tensorflow IS in the image; only the
waymo proto/utils are stubbed), `.npz` emission, info files — and the
output feeds through SceneDataset + collate + one MotionNet forward.

The synthetic world has known geometry, so the assertions are physical:
ego-compensating each frame's static points must reproduce the anchor
frame's statics; the fast car is foreground+dynamic, the slow pedestrian
foreground+static, the barrier background, the Waymo sign excluded.

Reference anchors: /root/reference/dataset_toolbox/nuscene/preprocess.py:301-364,
/root/reference/dataset_toolbox/prep_nuscene_waymo_sf/waymo.py:99-133,
/root/reference/dataset_toolbox/waymo/converter.py:157.
"""

from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np
import pytest

from tools.preprocess import core

FREQ_NUSC = 20.0
FREQ_WAYMO = 10.0
N_SWEEPS = 3


def _yaw_quat_wxyz(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


class _World:
    """Shared synthetic geometry: static clusters + a fast car + a slow
    pedestrian, everything in GLOBAL coordinates as functions of time."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        centres = np.array(
            [[-5, -2, 1.2], [-2.5, -3, 1.0], [0.5, -4.5, 1.5],
             [3, -2.5, 0.9], [5, -4, 1.3], [-4, -5, 1.1]])
        self.static_g = np.concatenate(
            [c + rng.uniform(-0.4, 0.4, (40, 3)) for c in centres]
        ).astype(np.float64)
        self.car_c0 = np.array([0.0, 2.0, 1.0])
        self.car_v = np.array([4.0, 0.0, 0.0])       # 4 m/s -> dynamic
        self.car_lwh = np.array([3.0, 1.6, 1.4])
        self.car_off = rng.uniform(-0.45, 0.45, (60, 3)) * self.car_lwh
        self.ped_c0 = np.array([-1.0, 4.0, 0.9])
        self.ped_v = np.array([0.2, 0.0, 0.0])       # 0.2 m/s -> static
        self.ped_lwh = np.array([0.6, 0.6, 1.8])
        self.ped_off = rng.uniform(-0.45, 0.45, (20, 3)) * self.ped_lwh
        self.bar_c = np.array([2.0, -6.0, 1.0])      # background class
        self.bar_lwh = np.array([2.0, 0.5, 1.0])
        self.bar_off = rng.uniform(-0.45, 0.45, (25, 3)) * self.bar_lwh
        self.n_static = len(self.static_g)
        self.n_car, self.n_ped, self.n_bar = 60, 20, 25

    def car_centre(self, tau):
        return self.car_c0 + self.car_v * tau

    def ped_centre(self, tau):
        return self.ped_c0 + self.ped_v * tau

    def points_global(self, tau):
        """[static | car | ped | barrier] at global time tau (this order is
        preserved inside each frame block of the emitted sample)."""
        return np.concatenate([
            self.static_g,
            self.car_centre(tau) + self.car_off,
            self.ped_centre(tau) + self.ped_off,
            self.bar_c + self.bar_off,
        ])


def _check_contract_npz(data, world, n_frames, sensor_from_global,
                        expect_sign_excluded=False):
    """Physical invariants of one emitted sample. sensor_from_global(t):
    the generator's sensor(frame t)<-global transform, to cross-check the
    converter's ego chain against ground truth it never saw assembled."""
    for key, dt in [("raw_points", np.float32), ("time_indice", None),
                    ("sd_labels", None), ("fb_labels", None),
                    ("inst_labels", None), ("sem_labels", None),
                    ("ego_motion_gt", np.float32), ("bbox_tsfm", np.float32)]:
        assert key in data, key
        if dt is not None:
            assert data[key].dtype == dt, (key, data[key].dtype)

    ego = np.asarray(data["ego_motion_gt"], np.float64)
    assert ego.shape == (n_frames, 4, 4)
    np.testing.assert_allclose(ego[0], np.eye(4), atol=1e-9)

    # the converter's ego chain equals anchor<-global @ global<-sensor_t
    a_from_g = sensor_from_global(0)
    for t in range(n_frames):
        want = a_from_g @ np.linalg.inv(sensor_from_global(t))
        np.testing.assert_allclose(ego[t], want, atol=1e-9)

    pts = np.asarray(data["raw_points"], np.float64)
    tid = np.asarray(data["time_indice"])
    fb, sd = np.asarray(data["fb_labels"]), np.asarray(data["sd_labels"])
    inst = np.asarray(data["inst_labels"])

    s, c, p = world.n_static, world.n_car, world.n_ped
    car_ids = set()
    anchor_static = None
    for t in range(n_frames):
        blk = np.where(tid == t)[0]
        assert len(blk) == s + c + p + world.n_bar
        comp = (ego[t, :3, :3] @ pts[blk].T).T + ego[t, :3, 3]
        if t == 0:
            anchor_static = comp[:s]
        else:
            # ego compensation maps every frame's statics onto the anchor's
            np.testing.assert_allclose(comp[:s], anchor_static, atol=1e-6)
        assert (fb[blk[:s]] == 0).all() and (inst[blk[:s]] == 0).all()
        car = blk[s:s + c]
        assert (fb[car] == 1).all() and (sd[car] == 1).all()
        assert (inst[car] > 0).all() and len(set(inst[car])) == 1
        car_ids.add(int(inst[car][0]))
        ped = blk[s + c:s + c + p]
        assert (fb[ped] == 1).all() and (sd[ped] == 0).all()
        assert (inst[ped] > 0).all()
        bar = blk[s + c + p:]
        assert (sd[bar] == 0).all()
        if expect_sign_excluded:
            assert (inst[bar] == 0).all() and (fb[bar] == 0).all()
        else:
            assert (inst[bar] > 0).all() and (fb[bar] == 0).all()
    assert len(car_ids) == 1  # stable track identity across frames

    # bbox_tsfm moves the car's frame-t points onto their anchor pose
    k_car = car_ids.pop()
    bt = np.asarray(data["bbox_tsfm"], np.float64)
    for t in range(1, n_frames):
        blk = np.where(tid == t)[0][s:s + c]
        comp = (ego[t, :3, :3] @ pts[blk].T).T + ego[t, :3, 3]
        rec = (bt[k_car, t, :3, :3] @ comp.T).T + bt[k_car, t, :3, 3]
        blk0 = np.where(tid == 0)[0][s:s + c]
        comp0 = pts[blk0]
        np.testing.assert_allclose(rec, comp0, atol=1e-6)


# --------------------------------------------------------------------------
# nuScenes
# --------------------------------------------------------------------------

class _FakeLidarPointCloud:
    def __init__(self, points):
        self.points = points  # [4, N], devkit layout

    @classmethod
    def from_file(cls, path):
        return cls(np.load(path))


def _build_nusc_world(root, world):
    """Tables for a 1-scene world: sweep chain sd0..sd3 (oldest first),
    keyframe samples at sd2 and sd3 (so each has a full 3-sweep window)."""
    dt = 1.0 / FREQ_NUSC
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    cal_t = [0.5, 0.0, 1.8]
    cal_q = _yaw_quat_wxyz(np.pi / 2)     # 90-deg mounted sensor
    e_from_s = core.pose_matrix(cal_t, cal_q)

    tables = {"sample": {}, "sample_data": {}, "calibrated_sensor": {},
              "ego_pose": {}, "sample_annotation": {}}
    velocity = {}
    tables["calibrated_sensor"]["cal0"] = {
        "translation": cal_t, "rotation": cal_q}

    def g_from_s(i):
        tau = i * dt
        g_from_e = core.pose_matrix([2.0 * tau, 0.0, 0.0],
                                    _yaw_quat_wxyz(0.02 * i))
        return g_from_e @ e_from_s

    for i in range(4):
        tau = i * dt
        p_g = world.points_global(tau)
        p_s = (np.linalg.inv(g_from_s(i))[:3, :3] @ p_g.T).T \
            + np.linalg.inv(g_from_s(i))[:3, 3]
        fn = os.path.join("sweeps", f"pc{i}.npy")
        np.save(os.path.join(root, fn),
                np.vstack([p_s.T, np.zeros((1, len(p_s)))]).astype(np.float32))
        tables["ego_pose"][f"pose{i}"] = {
            "translation": [2.0 * tau, 0.0, 0.0],
            "rotation": _yaw_quat_wxyz(0.02 * i)}
        tables["sample_data"][f"sd{i}"] = {
            "calibrated_sensor_token": "cal0", "ego_pose_token": f"pose{i}",
            "filename": fn, "prev": f"sd{i - 1}" if i > 0 else ""}

    def anns_at(sample_tok, i):
        tau = i * dt
        toks = []
        for name, (centre, lwh, vel, cat) in {
            "car": (world.car_centre(tau), world.car_lwh, world.car_v,
                    "vehicle.car"),
            "ped": (world.ped_centre(tau), world.ped_lwh, world.ped_v,
                    "human.pedestrian.adult"),
            "bar": (world.bar_c, world.bar_lwh,
                    [np.nan, np.nan, np.nan],    # devkit returns nan here
                    "movable_object.barrier"),
        }.items():
            tok = f"{sample_tok}_{name}"
            tables["sample_annotation"][tok] = {
                "token": tok, "translation": list(centre),
                "rotation": _yaw_quat_wxyz(0.0),
                # devkit size is (w, l, h)
                "size": [lwh[1], lwh[0], lwh[2]],
                "category_name": cat,
            }
            velocity[tok] = np.asarray(vel, np.float64)
            toks.append(tok)
        return toks

    tables["sample"]["smp0"] = {"data": {"LIDAR_TOP": "sd2"},
                                "anns": anns_at("smp0", 2), "next": "smp1"}
    tables["sample"]["smp1"] = {"data": {"LIDAR_TOP": "sd3"},
                                "anns": anns_at("smp1", 3), "next": ""}
    scene = [{"name": "scene-0001", "first_sample_token": "smp0"}]
    return scene, tables, velocity, g_from_s


_NUSC_WORLDS: dict = {}


class _FakeNuScenes:
    def __init__(self, version, dataroot, verbose=False):
        self.version = version
        w = _NUSC_WORLDS[dataroot]
        self.scene, self._tables, self._velocity = w

    def get(self, table, token):
        return self._tables[table][token]

    def box_velocity(self, token):
        return self._velocity[token]


@pytest.fixture
def nusc_stub(monkeypatch):
    mod = types.ModuleType("nuscenes")
    sub = types.ModuleType("nuscenes.nuscenes")
    sub.NuScenes = _FakeNuScenes
    utils = types.ModuleType("nuscenes.utils")
    dc = types.ModuleType("nuscenes.utils.data_classes")
    dc.LidarPointCloud = _FakeLidarPointCloud
    mod.nuscenes, mod.utils, utils.data_classes = sub, utils, dc
    for name, m in [("nuscenes", mod), ("nuscenes.nuscenes", sub),
                    ("nuscenes.utils", utils),
                    ("nuscenes.utils.data_classes", dc)]:
        monkeypatch.setitem(sys.modules, name, m)


@pytest.mark.parametrize("workers", [1, 2])
def test_nuscenes_convert_end_to_end(tmp_path, nusc_stub, workers):
    """workers=2 exercises the scene-parallel Pool path (reference
    preprocesses with multiprocessing.Pool, toolbox/utils.py:27-31); the
    fork context inherits the loaded devkit object — and here the
    injected stub modules — so the identical codepath runs per worker."""
    from tools.preprocess import nuscenes_convert

    world = _World(seed=0)
    root = str(tmp_path / "nusc")
    out = str(tmp_path / "out_nusc")
    os.makedirs(root)
    scene, tables, velocity, g_from_s = _build_nusc_world(root, world)
    _NUSC_WORLDS[root] = (scene, tables, velocity)
    try:
        nuscenes_convert.convert(root, out, version="v1.0-mini",
                                 n_sweeps=N_SWEEPS, freq=FREQ_NUSC,
                                 workers=workers)
    finally:
        _NUSC_WORLDS.pop(root)

    with open(os.path.join(out, "all_info.txt")) as f:
        infos = [l.strip() for l in f if l.strip()]
    assert infos == [os.path.join("scene-0001", "00000.npz"),
                     os.path.join("scene-0001", "00001.npz")]

    # sample 0: anchor = keyframe sd2; sweep slot t is sweep sd(2-t)
    with np.load(os.path.join(out, infos[0])) as z:
        data = {k: z[k] for k in z.files}
    _check_contract_npz(
        data, world, N_SWEEPS,
        sensor_from_global=lambda t: np.linalg.inv(g_from_s(2 - t)))


# --------------------------------------------------------------------------
# Waymo
# --------------------------------------------------------------------------

class _FakeFrame:
    TYPE_SIGN = 3

    def ParseFromString(self, buf):
        d = pickle.loads(buf)
        self.pose = types.SimpleNamespace(transform=d["pose"])
        self.laser_labels = [
            types.SimpleNamespace(id=l["id"], type=l["type"],
                                  TYPE_SIGN=self.TYPE_SIGN,
                                  box=types.SimpleNamespace(**l["box"]))
            for l in d["labels"]
        ]
        self._points = [np.asarray(p, np.float32) for p in d["points"]]


def _fake_parse_range_image_and_camera_projection(frame):
    return {}, {}, None, None


def _fake_convert_range_image_to_point_cloud(frame, ri, cp, pose_ri):
    return frame._points, None


@pytest.fixture
def waymo_stub(monkeypatch):
    pkg = types.ModuleType("waymo_open_dataset")
    pb2 = types.ModuleType("waymo_open_dataset.dataset_pb2")
    pb2.Frame = _FakeFrame
    utils = types.ModuleType("waymo_open_dataset.utils")
    fu = types.ModuleType("waymo_open_dataset.utils.frame_utils")
    fu.parse_range_image_and_camera_projection = (
        _fake_parse_range_image_and_camera_projection)
    fu.convert_range_image_to_point_cloud = (
        _fake_convert_range_image_to_point_cloud)
    pkg.dataset_pb2, pkg.utils, utils.frame_utils = pb2, utils, fu
    for name, m in [("waymo_open_dataset", pkg),
                    ("waymo_open_dataset.dataset_pb2", pb2),
                    ("waymo_open_dataset.utils", utils),
                    ("waymo_open_dataset.utils.frame_utils", fu)]:
        monkeypatch.setitem(sys.modules, name, m)


def _write_waymo_tfrecord(path, world, n_records):
    """REAL TFRecord file (tf.data decodes it in the converter); only the
    proto payload is a stand-in."""
    import tensorflow as tf

    dt = 1.0 / FREQ_WAYMO

    def g_from_v(i):
        tau = i * dt
        return core.pose_matrix([1.5 * tau, 0.2 * tau, 0.0],
                                _yaw_quat_wxyz(0.03 * i))

    with tf.io.TFRecordWriter(path) as w:
        for i in range(n_records):
            tau = i * dt
            pose = g_from_v(i)
            v_from_g = np.linalg.inv(pose)
            p_g = world.points_global(tau)
            p_v = (v_from_g[:3, :3] @ p_g.T).T + v_from_g[:3, 3]
            yaw_v = -0.03 * i    # global heading 0 seen from the vehicle

            def box(centre_g, lwh, heading_v):
                c_v = v_from_g[:3, :3] @ centre_g + v_from_g[:3, 3]
                return {"center_x": c_v[0], "center_y": c_v[1],
                        "center_z": c_v[2], "length": lwh[0],
                        "width": lwh[1], "height": lwh[2],
                        "heading": heading_v}

            labels = [
                {"id": "car_0", "type": 1,
                 "box": box(world.car_centre(tau), world.car_lwh, yaw_v)},
                {"id": "ped_0", "type": 2,
                 "box": box(world.ped_centre(tau), world.ped_lwh, yaw_v)},
                # a SIGN over the barrier points: must be dropped by the
                # converter's type filter, leaving those points background
                {"id": "sign_0", "type": _FakeFrame.TYPE_SIGN,
                 "box": box(world.bar_c, world.bar_lwh, yaw_v)},
            ]
            payload = {"pose": pose.reshape(-1).tolist(),
                       "points": [p_v[:100], p_v[100:]],  # 2 lidar returns
                       "labels": labels}
            w.write(pickle.dumps(payload))
    return g_from_v


@pytest.mark.parametrize("workers", [1, 2])
def test_waymo_convert_end_to_end(tmp_path, waymo_stub, workers):
    """workers=2 runs the segment-parallel Pool path over TWO real
    TFRecord files (reference: Pool over segments,
    dataset_toolbox/waymo/preprocess.py:61-74); output must be identical
    to the serial order (imap preserves file order)."""
    from tools.preprocess import waymo_convert

    world = _World(seed=1)
    rec_dir = str(tmp_path / "tfrecords")
    out = str(tmp_path / "out_waymo")
    os.makedirs(rec_dir)
    g_from_v = _write_waymo_tfrecord(
        os.path.join(rec_dir, "seg-000.tfrecord"), world, n_records=4)
    if workers == 2:  # a second segment = a second genuine unit of work
        _write_waymo_tfrecord(
            os.path.join(rec_dir, "seg-001.tfrecord"), world, n_records=4)

    waymo_convert.convert(rec_dir, out, n_sweeps=N_SWEEPS, freq=FREQ_WAYMO,
                          workers=workers)

    with open(os.path.join(out, "all_info.txt")) as f:
        infos = [l.strip() for l in f if l.strip()]
    # 4 records, window 3 -> samples at record indices 2 and 3
    want = [os.path.join("seg-000", "00002.npz"),
            os.path.join("seg-000", "00003.npz")]
    if workers == 2:
        want += [os.path.join("seg-001", "00002.npz"),
                 os.path.join("seg-001", "00003.npz")]
    assert infos == want

    # sample 0: window records [0, 1, 2], anchor = record 0 (oldest first)
    with np.load(os.path.join(out, infos[0])) as z:
        data = {k: z[k] for k in z.files}
    _check_contract_npz(
        data, world, N_SWEEPS,
        sensor_from_global=lambda t: np.linalg.inv(g_from_v(t)),
        expect_sign_excluded=True)


# --------------------------------------------------------------------------
# converted output -> SceneDataset -> forward
# --------------------------------------------------------------------------

def test_converted_sample_feeds_model(tmp_path, nusc_stub):
    """The stub-converted nuScenes output runs through the real runtime:
    SceneDataset -> collate -> one MotionNet forward with finite outputs
    (same shapes as tests/test_precision.py, sharing its compile cache)."""
    import jax
    import jax.numpy as jnp

    from pcaccumulation_tpu.config import derive, load_config
    from pcaccumulation_tpu.data.dataset import SceneDataset
    from pcaccumulation_tpu.data.loader import collate
    from pcaccumulation_tpu.models import MotionNet
    from tools.preprocess import nuscenes_convert

    world = _World(seed=2)
    root = str(tmp_path / "nusc")
    out = str(tmp_path / "converted")
    os.makedirs(root)
    scene, tables, velocity, _ = _build_nusc_world(root, world)
    _NUSC_WORLDS[root] = (scene, tables, velocity)
    try:
        nuscenes_convert.convert(root, out, version="v1.0-mini",
                                 n_sweeps=N_SWEEPS, freq=FREQ_NUSC)
    finally:
        _NUSC_WORLDS.pop(root)
    os.rename(os.path.join(out, "all_info.txt"),
              os.path.join(out, "val_info.txt"))

    cfg = load_config()
    cfg["voxel_generator"].update(
        {"range": [-8, -8, -5, 8, 8, 3], "voxel_size": [0.25, 0.25, 8],
         "n_sweeps": 3, "crop_range": [8, -5, 3]})
    cfg["capacity"] = {"max_points": 6000, "max_pillars": 4000,
                      "max_instances": 8, "max_fg_points": 1024}
    cfg["data"].update({"n_frames": 3, "freq": 10.0, "max_speed": 20})
    cfg["pose_estimation"]["n_kpts"] = 128
    cfg["tpointnet"].update({"n_iterations": 1, "min_points": 5})
    cfg["unet"]["depth"] = 3
    cfg["pillar_encoder"]["depth"] = 2
    cfg["pose_estimation"]["sinkhorn_iter"] = 2
    cfg["cluster"]["bfs_iters"] = 8
    cfg = derive(cfg)

    ds = SceneDataset(cfg, "val", augment=False, base_dir=out)
    assert ds.scenes() == ["scene-0001"] and len(ds) == 2
    batch = collate([ds[0]])
    assert int(np.asarray(batch["point_valid"]).sum()) > 300
    jbatch = jax.tree.map(jnp.asarray, batch)

    model = MotionNet(cfg)
    variables = jax.jit(
        lambda rngs, b: model.init(rngs, b, train=False, mode="val")
    )({"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch)
    res = jax.jit(lambda v, b: model.apply(
        v, b, train=False, mode="val", rngs={"sample": jax.random.key(2)}))(
        variables, jbatch)

    valid = np.asarray(batch["point_valid"][0], bool)
    for key in ("rec_est", "ego_motion_est", "mos_est", "fb_seg_est"):
        arr = np.asarray(res[key], np.float32)
        assert np.isfinite(arr).all(), key
    assert np.isfinite(np.asarray(res["rec_est"])[0][valid]).all()
    # the GT plumbing survived the trip: ego GT in the batch matches the
    # converter's chain (frame 0 identity)
    np.testing.assert_allclose(
        np.asarray(batch["ego_motion_gt"])[0, 0], np.eye(4), atol=1e-6)
