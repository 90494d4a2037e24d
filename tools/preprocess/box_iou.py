"""Rotated-box overlap/IoU (BEV 2D and 3D) for the preprocessing toolbox.

Covers the reference's numba bbox kernels (/root/reference/toolbox/
bbox_utils.py: rotated IoU 2D/3D used by its dataset tooling) with plain
numpy: exact convex-polygon clipping (Sutherland-Hodgman) per surviving
pair after a vectorized circumradius prefilter.  These run offline on the
host — the reference also kept them out of the training loop — so clarity
beats device placement here.

Box convention matches tools/preprocess/core.py: [x, y, z, dx, dy, dz, yaw],
z is the box CENTER height.
"""

from __future__ import annotations

import numpy as np


def bev_corners(boxes: np.ndarray) -> np.ndarray:
    """[K, 7] -> [K, 4, 2] BEV rectangle corners in CCW order."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float64))
    half = boxes[:, 3:5] / 2.0
    signs = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
    local = signs[None] * half[:, None, :]            # [K, 4, 2]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    return np.einsum("kij,kvj->kvi", rot, local) + boxes[:, None, :2]


def _polygon_area(poly: np.ndarray) -> float:
    """Shoelace area of a CCW polygon [V, 2]."""
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _clip(poly: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Clip polygon to the half-plane left of directed edge a->b."""
    if len(poly) == 0:
        return poly
    d = b - a
    side = d[0] * (poly[:, 1] - a[1]) - d[1] * (poly[:, 0] - a[0])
    out = []
    n = len(poly)
    for i in range(n):
        j = (i + 1) % n
        if side[i] >= 0:
            out.append(poly[i])
        if (side[i] >= 0) != (side[j] >= 0):
            t = side[i] / (side[i] - side[j])
            out.append(poly[i] + t * (poly[j] - poly[i]))
    return np.asarray(out) if out else np.zeros((0, 2))


def _rect_intersection_area(p1: np.ndarray, p2: np.ndarray) -> float:
    """Exact intersection area of two convex CCW quads."""
    poly = p1
    for i in range(4):
        poly = _clip(poly, p2[i], p2[(i + 1) % 4])
        if len(poly) == 0:
            return 0.0
    return _polygon_area(poly)


def bev_overlap(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise BEV intersection areas: [N, 7] x [M, 7] -> [N, M]."""
    boxes1 = np.atleast_2d(boxes1)
    boxes2 = np.atleast_2d(boxes2)
    c1, c2 = bev_corners(boxes1), bev_corners(boxes2)
    # circumradius prefilter: centers farther than r1+r2 cannot overlap
    r1 = np.linalg.norm(boxes1[:, 3:5], axis=1) / 2.0
    r2 = np.linalg.norm(boxes2[:, 3:5], axis=1) / 2.0
    dist = np.linalg.norm(
        boxes1[:, None, :2] - boxes2[None, :, :2], axis=-1)
    cand = dist <= (r1[:, None] + r2[None, :])
    out = np.zeros((len(boxes1), len(boxes2)))
    for i, j in zip(*np.nonzero(cand)):
        out[i, j] = _rect_intersection_area(c1[i], c2[j])
    return out


def iou_bev(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise rotated IoU in BEV: [N, 7] x [M, 7] -> [N, M]."""
    boxes1 = np.atleast_2d(boxes1)
    boxes2 = np.atleast_2d(boxes2)
    inter = bev_overlap(boxes1, boxes2)
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    union = a1[:, None] + a2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def iou_3d(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise 3D IoU (BEV intersection x z-extent overlap)."""
    boxes1 = np.atleast_2d(boxes1)
    boxes2 = np.atleast_2d(boxes2)
    inter_bev = bev_overlap(boxes1, boxes2)
    lo1 = boxes1[:, 2] - boxes1[:, 5] / 2.0
    hi1 = boxes1[:, 2] + boxes1[:, 5] / 2.0
    lo2 = boxes2[:, 2] - boxes2[:, 5] / 2.0
    hi2 = boxes2[:, 2] + boxes2[:, 5] / 2.0
    zov = np.maximum(
        0.0,
        np.minimum(hi1[:, None], hi2[None, :])
        - np.maximum(lo1[:, None], lo2[None, :]),
    )
    inter = inter_bev * zov
    v1 = np.prod(boxes1[:, 3:6], axis=1)
    v2 = np.prod(boxes2[:, 3:6], axis=1)
    union = v1[:, None] + v2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
