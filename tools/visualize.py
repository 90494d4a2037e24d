"""BEV visualization of dataset samples and reconstructions.

    python tools/visualize.py sample <sample.npz> <out.png>
    python tools/visualize.py flow <results/<exp>/<scene>/flow_error.npz> <out.png>

Matplotlib stand-in for the reference's Open3D inspection scripts
(dataset_toolbox check_data / check_accumulated_scenes — SURVEY.md §4.4):
`sample` renders four BEV panels from a training `.npz` (raw points by
frame, ego-compensated accumulation, instance labels, static/dynamic),
`flow` renders the per-point end-point-error of a test dump.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _bev(ax, xy, c, title, cmap="viridis", s=0.5, discrete=False):
    if discrete:
        c = np.asarray(c) % 20
        cmap = "tab20"
    sc = ax.scatter(xy[:, 0], xy[:, 1], c=c, s=s, cmap=cmap, linewidths=0)
    ax.set_title(title, fontsize=9)
    ax.set_aspect("equal")
    ax.tick_params(labelsize=6)
    return sc


def render_sample(npz_path: str, out_png: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = dict(np.load(npz_path, allow_pickle=True))
    pts = data["raw_points"]
    tid = data["time_indice"]
    ego = data["ego_motion_gt"]
    inst = data["inst_labels"]
    sd = data["sd_labels"]
    bbox = data["bbox_tsfm"]
    t_count = ego.shape[0]

    # ego compensation + GT instance reconstruction (register_utils.py:59,72)
    comp = np.empty_like(pts)
    for t in range(t_count):
        m = tid == t
        comp[m] = pts[m] @ ego[t, :3, :3].T + ego[t, :3, 3]
    rec = comp.copy()
    for k in range(1, bbox.shape[0]):
        for t in range(t_count):
            m = (inst == k) & (tid == t)
            if m.any():
                rec[m] = comp[m] @ bbox[k, t, :3, :3].T + bbox[k, t, :3, 3]

    fig, axes = plt.subplots(2, 2, figsize=(11, 10), dpi=130)
    _bev(axes[0, 0], pts, tid, f"raw sensor points by frame (T={t_count})")
    _bev(axes[0, 1], comp, tid, "ego-compensated accumulation (smear = motion)")
    _bev(axes[1, 0], rec, inst, "GT reconstruction by instance", discrete=True)
    _bev(axes[1, 1], rec, sd, "static (0) / dynamic (1)", cmap="coolwarm")
    fig.suptitle(os.path.basename(npz_path), fontsize=10)
    fig.tight_layout()
    fig.savefig(out_png)
    print(f"wrote {out_png}")


def render_flow(npz_path: str, out_png: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = dict(np.load(npz_path, allow_pickle=True))
    epe = data["epe_per_point"].astype(np.float32)
    sd = data["sd_label"].astype(bool)
    tid = data["time_indice"].astype(int)

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5), dpi=130)
    axes[0].hist(
        [epe[~sd], epe[sd]], bins=50, label=["static", "dynamic"],
        stacked=False, log=True,
    )
    axes[0].set_xlabel("end-point error [m]")
    axes[0].legend()
    axes[0].set_title("EPE distribution")
    means = [float(epe[tid == t].mean()) if (tid == t).any() else 0.0
             for t in range(int(tid.max()) + 1)]
    axes[1].bar(range(len(means)), means)
    axes[1].set_xlabel("frame index")
    axes[1].set_title("mean EPE per frame")
    fig.tight_layout()
    fig.savefig(out_png)
    print(f"wrote {out_png}")


def main(argv):
    if len(argv) < 4:
        print(__doc__)
        return 1
    mode, src, dst = argv[1], argv[2], argv[3]
    if mode == "sample":
        render_sample(src, dst)
    elif mode == "flow":
        render_flow(src, dst)
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
