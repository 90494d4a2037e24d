import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pcaccumulation_tpu.ops import segment as seg
from pcaccumulation_tpu.ops.sinkhorn import log_sinkhorn, square_distance
from pcaccumulation_tpu.ops import bilinear
from pcaccumulation_tpu.ops.lovasz import lovasz_softmax


# ---------------------------------------------------------------- segment ops
def test_segment_reductions(rng):
    n, s = 200, 16
    data = rng.normal(size=(n, 4)).astype(np.float32)
    ids = rng.integers(0, s, size=n)
    out_sum = np.asarray(seg.segment_sum(jnp.asarray(data), jnp.asarray(ids), s))
    out_max = np.asarray(seg.segment_max(jnp.asarray(data), jnp.asarray(ids), s))
    out_mean = np.asarray(seg.segment_mean(jnp.asarray(data), jnp.asarray(ids), s))
    for k in range(s):
        m = ids == k
        if m.sum():
            np.testing.assert_allclose(out_sum[k], data[m].sum(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(out_max[k], data[m].max(0), rtol=1e-5)
            np.testing.assert_allclose(out_mean[k], data[m].mean(0), rtol=1e-4, atol=1e-5)


def test_masked_segment_max_empty_fill(rng):
    data = np.ones((10, 2), np.float32)
    ids = np.zeros(10, np.int64)
    valid = np.zeros(10, bool)
    out = np.asarray(seg.masked_segment_max(jnp.asarray(data), jnp.asarray(ids), jnp.asarray(valid), 3, fill_value=0.0))
    np.testing.assert_allclose(out, np.zeros((3, 2)))


def test_masked_segment_max_grad_matches_torch_scatter_semantics(rng):
    """The winner-mask custom VJP must route gradients exactly like torch
    autograd through an index_reduce amax (distinct values: no ties)."""
    n, c, s = 64, 5, 7
    data = rng.permutation(n * c).reshape(n, c).astype(np.float32)  # distinct
    ids = rng.integers(0, s, size=n)
    valid = rng.random(n) > 0.3
    wgt = rng.normal(size=(s, c)).astype(np.float32)

    def loss(d):
        out = seg.masked_segment_max(d, jnp.asarray(ids), jnp.asarray(valid), s)
        return jnp.sum(out * jnp.asarray(wgt))

    g = np.asarray(jax.grad(loss)(jnp.asarray(data)))

    dt = torch.tensor(data, requires_grad=True)
    masked = torch.where(torch.tensor(valid)[:, None], dt,
                         torch.tensor(-1e30))
    out = torch.full((s, c), -1e30).index_reduce(
        0, torch.tensor(ids), masked, "amax", include_self=False
    )
    out = torch.where(out <= -5e29, torch.tensor(0.0), out)
    (out * torch.tensor(wgt)).sum().backward()
    np.testing.assert_allclose(g, dt.grad.numpy(), atol=1e-6)


def test_masked_segment_mean(rng):
    data = rng.normal(size=(50, 3)).astype(np.float32)
    ids = rng.integers(0, 4, size=50)
    valid = rng.random(50) > 0.3
    out = np.asarray(seg.masked_segment_mean(jnp.asarray(data), jnp.asarray(ids), jnp.asarray(valid), 4))
    for k in range(4):
        m = (ids == k) & valid
        if m.sum():
            np.testing.assert_allclose(out[k], data[m].mean(0), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- sinkhorn
def _torch_sinkhorn_slack(log_alpha, n_iters):
    """Literal re-execution of the reference algorithm in torch (egomotion.py:100-137)."""
    zero_pad = torch.nn.ZeroPad2d((0, 1, 0, 1))
    la = zero_pad(log_alpha[:, None, :, :]).squeeze(1)
    for _ in range(n_iters):
        la = torch.cat(
            (la[:, :-1, :] - torch.logsumexp(la[:, :-1, :], dim=2, keepdim=True), la[:, -1, None, :]), dim=1
        )
        la = torch.cat(
            (la[:, :, :-1] - torch.logsumexp(la[:, :, :-1], dim=1, keepdim=True), la[:, :, -1, None]), dim=2
        )
    return la[:, :-1, :-1]


def test_sinkhorn_matches_reference_semantics(rng):
    la = rng.normal(size=(2, 12, 12)).astype(np.float32)
    ours = np.asarray(log_sinkhorn(jnp.asarray(la), n_iters=3, slack=True))
    ref = _torch_sinkhorn_slack(torch.tensor(la), 3).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_square_distance(rng):
    a = rng.normal(size=(5, 8)).astype(np.float32)
    b = rng.normal(size=(7, 8)).astype(np.float32)
    d = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    expected = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- bilinear
def test_bilinear_sample_matches_torch_grid_sample(rng):
    c, h, w = 3, 16, 20
    img = rng.normal(size=(c, h, w)).astype(np.float32)
    n = 50
    uv = (rng.random((n, 2)) * 2.4 - 1.2).astype(np.float32)  # include OOB

    for mode in ("zeros", "border"):
        ours = np.asarray(
            bilinear.bilinear_sample(jnp.asarray(img).transpose(1, 2, 0), jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]), padding_mode=mode)
        )
        grid = torch.tensor(uv).view(1, 1, n, 2)
        ref = F.grid_sample(
            torch.tensor(img)[None], grid, mode="bilinear", padding_mode=mode, align_corners=False
        )[0, :, 0, :].T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=mode)


def test_warp_bev_identity(rng):
    c, h, w = 2, 8, 8
    img = rng.normal(size=(c, h, w)).astype(np.float32)
    pose = jnp.eye(4)
    out = np.asarray(bilinear.warp_bev(
        jnp.asarray(img).transpose(1, 2, 0), pose, 1.0, 1.0, -4.0, -4.0,
        method="gather"))
    np.testing.assert_allclose(out, img.transpose(1, 2, 0), atol=1e-5)


def test_warp_bev_matches_torch(rng):
    """Full parity with the reference grid construction + grid_sample."""
    c, h, w = 4, 32, 32
    x_reso = y_reso = 0.25
    x_min = y_min = -4.0
    img = rng.normal(size=(c, h, w)).astype(np.float32)
    theta = 0.2
    pose = np.eye(4, dtype=np.float32)
    pose[:2, :2] = [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    pose[0, 3] = 0.7

    ours = np.asarray(bilinear.warp_bev(
        jnp.asarray(img).transpose(1, 2, 0), jnp.asarray(pose), x_reso, y_reso,
        x_min, y_min, method="gather")).transpose(2, 0, 1)

    # reference: motionnet.py:45-114
    pose_inv = torch.linalg.inv(torch.tensor(pose))
    xx = (torch.arange(0, w).view(1, -1).repeat(h, 1) + 0.5).float()
    yy = (torch.arange(0, h).view(-1, 1).repeat(1, w) + 0.5).float()
    grid = torch.cat((xx.view(1, h, w), yy.view(1, h, w)), 0)
    grid[0] = grid[0] * x_reso + x_min
    grid[1] = grid[1] * y_reso + y_min
    g = grid.view(2, -1)
    tg = pose_inv[:2, :2] @ g + pose_inv[:2, 3:4]
    tg[0] = tg[0] / abs(x_min)
    tg[1] = tg[1] / abs(y_min)
    tg = tg.view(2, h, w).permute(1, 2, 0)[None]
    ref = F.grid_sample(torch.tensor(img)[None], tg, mode="bilinear", padding_mode="zeros", align_corners=False)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_scatter_gather_bev_roundtrip(rng):
    m, c2, size = 30, 5, 64
    feats = rng.normal(size=(m, c2)).astype(np.float32)
    idx = rng.choice(size, size=m, replace=False).astype(np.int32)
    valid = rng.random(m) > 0.2
    canvas = bilinear.scatter_bev(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(valid), size)
    back = np.asarray(bilinear.gather_bev(canvas, jnp.asarray(idx), jnp.asarray(valid)))
    expected = feats * valid[:, None]
    np.testing.assert_allclose(back, expected, atol=1e-6)


# ---------------------------------------------------------------- lovasz
def _torch_lovasz(probas, labels):
    """Literal reference implementation (libs/lovasz_softmax.py:56-100)."""
    C = probas.size(1)
    losses = []
    for c in range(C):
        fg = (labels == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - probas[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        p = len(fg_sorted)
        gts = fg_sorted.sum()
        intersection = gts - fg_sorted.cumsum(0)
        union = gts + (1 - fg_sorted).cumsum(0)
        jaccard = 1.0 - intersection / union
        if p > 1:
            jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
        losses.append(torch.dot(errors_sorted, jaccard))
    return torch.stack(losses).mean()


def test_lovasz_matches_reference(rng):
    n = 100
    logits = rng.normal(size=(n, 2)).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, 2, size=n)
    ours = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels)))
    ref = float(_torch_lovasz(torch.tensor(probas), torch.tensor(labels)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lovasz_mask_equals_subset(rng):
    n = 80
    logits = rng.normal(size=(n, 2)).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, 2, size=n)
    valid = rng.random(n) > 0.4
    ours = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels), jnp.asarray(valid)))
    ref = float(_torch_lovasz(torch.tensor(probas[valid]), torch.tensor(labels[valid])))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lovasz_grad_matches_torch_autograd(rng):
    """The sort-gather runs through a custom unique-scatter VJP; its
    gradient must equal torch autograd through the reference formulation."""
    n = 120
    logits = rng.normal(size=(n, 2)).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, 2, size=n)

    g_ours = jax.grad(
        lambda p: lovasz_softmax(p, jnp.asarray(labels))
    )(jnp.asarray(probas))

    pt = torch.tensor(probas, requires_grad=True)
    _torch_lovasz(pt, torch.tensor(labels)).backward()
    np.testing.assert_allclose(np.asarray(g_ours), pt.grad.numpy(), atol=1e-5)


def test_warp_bev_shear_matches_gather(rng):
    """The 3-pass shear warp must agree with the exact bilinear gather for
    rigid z-rotation + translation poses away from the border band swept
    by the shears (the zero padding propagates through 3 passes, so the
    contaminated band is wider than the gather path's by design)."""
    h = w = 96
    # smooth image: low-frequency sinusoids
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([
        np.sin(xx / 9.0) + np.cos(yy / 7.0),
        np.cos(xx / 5.0) * np.sin(yy / 11.0),
        (xx + yy) / (h + w),
    ], axis=-1).astype(np.float32)

    for theta, t in ((0.0, [0.0, 0.0]), (0.15, [0.6, -0.4]), (-0.3, [1.3, 0.8])):
        pose = np.eye(4, dtype=np.float32)
        pose[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]]
        pose[:2, 3] = t
        args = (jnp.asarray(img), jnp.asarray(pose), 0.25, 0.25, -12.0, -12.0)
        exact = np.asarray(bilinear.warp_bev(*args, method="gather"))
        fast = np.asarray(bilinear.warp_bev(*args, method="shear"))
        # margins = maximum shear sweep + translation in pixels
        alpha = abs(np.tan(theta / 2.0))
        beta = abs(np.sin(theta))
        t_pix = np.abs(t) / 0.25
        mx = int(np.ceil(alpha * h + t_pix[0])) + 3
        my = int(np.ceil(beta * w + t_pix[1])) + 3
        interior = (slice(my, h - my), slice(mx, w - mx))
        diff = np.abs(fast[interior] - exact[interior])
        assert np.mean(diff) < 8e-3, (theta, np.mean(diff))
        assert np.max(diff) < 0.06, (theta, np.max(diff))


def test_warp_bev_shear_identity(rng):
    img = rng.normal(size=(16, 16, 4)).astype(np.float32)
    out = np.asarray(bilinear.warp_bev(
        jnp.asarray(img), jnp.eye(4), 1.0, 1.0, -8.0, -8.0, method="shear"))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_row_shift_pallas_matches_xla(rng):
    """The Pallas row-shift kernel (interpret mode on CPU) must match the
    XLA fallback bit-for-bit, including OOB zeroing and the fractional
    lerp."""
    from pcaccumulation_tpu.ops.bilinear import _row_shift_pallas, _row_shift_xla

    r, w, c = 16, 32, 8
    img = jnp.asarray(rng.normal(size=(r, w, c)).astype(np.float32))
    shifts = jnp.asarray(
        (rng.random(r).astype(np.float32) - 0.5) * 2.5 * w
    )  # includes |shift| > W/2 and fractional parts
    k = jnp.floor(shifts)
    f = (shifts - k).astype(img.dtype)
    ki = jnp.clip(k.astype(jnp.int32), -w, w)
    ours = np.asarray(_row_shift_pallas(img, ki, f, interpret=True))
    ref = np.asarray(_row_shift_xla(img, ki, f))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_row_shift_vjp_transpose(rng):
    """custom_vjp: d_img equals the true linear transpose (checked against
    numerical JVP contraction identity <S(x), g> = <x, S^T(g)>)."""
    from pcaccumulation_tpu.ops.bilinear import _row_shift_sample

    r, w, c = 6, 12, 3
    x = jnp.asarray(rng.normal(size=(r, w, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(r, w, c)).astype(np.float32))
    shifts = jnp.asarray((rng.random(r).astype(np.float32) - 0.5) * 6)

    y, vjp = jax.vjp(lambda im: _row_shift_sample(im, shifts), x)
    (dx,) = vjp(g)
    lhs = float(jnp.sum(y * g))
    rhs = float(jnp.sum(x * dx))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_take_rows_unique_matches_take_along_axis(rng):
    """Value and gradient parity with take_along_axis for distinct
    per-row indices (the top_k case it is used for)."""
    from pcaccumulation_tpu.ops.segment import take_rows_unique

    b, n, s, c = 2, 32, 8, 5
    arr = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    idx = jnp.stack([
        jnp.asarray(rng.permutation(n)[:s].astype(np.int32)) for _ in range(b)
    ])
    out = take_rows_unique(arr, idx)
    ref = jnp.take_along_axis(arr, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))

    g = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    d_ours = jax.vjp(lambda a: take_rows_unique(a, idx), arr)[1](g)[0]
    d_ref = jax.vjp(lambda a: jnp.take_along_axis(a, idx[..., None], axis=1), arr)[1](g)[0]
    np.testing.assert_allclose(np.asarray(d_ours), np.asarray(d_ref))

    # 2-D variant (labels)
    arr2 = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    out2 = take_rows_unique(arr2, idx)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(jnp.take_along_axis(arr2, idx, axis=1))
    )


def test_compact_mask_indices_matches_topk(rng):
    """Stable-partition FG select == the old top_k-of-mask selection."""
    from pcaccumulation_tpu.ops.segment import compact_mask_indices

    b, n, s = 3, 200, 64
    mask = jnp.asarray(rng.random((b, n)) < 0.2)
    sel, sel_valid = compact_mask_indices(mask, s)
    # old path
    _, sel_ref = jax.lax.top_k(mask.astype(jnp.float32), s)
    valid_ref = jnp.take_along_axis(mask, sel_ref, axis=1)
    np.testing.assert_array_equal(np.asarray(sel_valid), np.asarray(valid_ref))
    # selected prefix must be identical (top_k ties resolve by index order)
    for i in range(b):
        k = int(mask[i].sum())
        np.testing.assert_array_equal(
            np.asarray(sel[i, :k]), np.asarray(sel_ref[i, :k])
        )
        # full row is a set of distinct in-range indices
        assert len(set(np.asarray(sel[i]).tolist())) == s
        assert int(sel[i].max()) < n

    # overflow: more True rows than capacity -> first s selected, all valid
    mask_full = jnp.ones((1, n), bool)
    sel2, valid2 = compact_mask_indices(mask_full, s)
    np.testing.assert_array_equal(np.asarray(sel2[0]), np.arange(s))
    assert bool(valid2.all())


def test_pillar_stats_matches_separate_ops(rng):
    """Fused mean+fb pass == pillar_means + pillar_label_max."""
    from pcaccumulation_tpu.models.pillar_encoder import (
        pillar_label_max,
        pillar_means,
        pillar_stats,
    )

    b, n, m = 2, 300, 40
    points = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    fb = jnp.asarray(rng.integers(0, 2, size=(b, n)).astype(np.int32))
    valid = jnp.asarray(rng.random((b, n)) < 0.8)
    p2v = jnp.asarray(
        np.sort(rng.integers(0, m + 1, size=(b, n)), axis=1).astype(np.int32)
    )
    mean, fbp = pillar_stats(points, fb, valid, p2v, m)
    mean_ref = pillar_means(points, valid, p2v, m)
    fb_ref = pillar_label_max(fb, valid, p2v, m)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fbp), np.asarray(fb_ref))


def test_warp_bev_batch_matches_per_frame(rng):
    """warp_bev_batch (frames folded into the row axis, one row-shift call
    per shear pass) must match per-frame warp_bev for both methods."""
    f, h, w, c = 3, 24, 24, 4
    img = rng.normal(size=(f, h, w, c)).astype(np.float32)
    poses = []
    for k, (theta, t) in enumerate(
        ((0.0, [0.0, 0.0]), (0.2, [0.5, -0.3]), (-0.35, [1.0, 0.7]))
    ):
        p = np.eye(4, dtype=np.float32)
        p[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                     [np.sin(theta), np.cos(theta)]]
        p[:2, 3] = t
        poses.append(p)
    poses = np.stack(poses)
    args = (0.25, 0.25, -3.0, -3.0)
    for method in ("shear", "gather"):
        batched = np.asarray(bilinear.warp_bev_batch(
            jnp.asarray(img), jnp.asarray(poses), *args, method=method))
        for k in range(f):
            single = np.asarray(bilinear.warp_bev(
                jnp.asarray(img[k]), jnp.asarray(poses[k]), *args,
                method=method))
            np.testing.assert_allclose(batched[k], single, atol=1e-5,
                                       err_msg=f"{method} frame {k}")


def test_row_shift_blocks_matches_xla(rng):
    """Per-(row, frame-block) Pallas shift (interpret mode) == per-block
    XLA fallback, including OOB zeroing + fractional lerp."""
    from pcaccumulation_tpu.ops.bilinear import (
        _row_shift_blocks_pallas,
        _row_shift_blocks_xla,
    )

    r, w, c, nb = 16, 32, 8, 3
    img = jnp.asarray(rng.normal(size=(r, w, nb * c)).astype(np.float32))
    shifts = (rng.random((r, nb)).astype(np.float32) - 0.5) * 2.5 * w
    k = np.floor(shifts)
    f = jnp.asarray((shifts - k).astype(np.float32))
    ki = jnp.asarray(np.clip(k.astype(np.int32), -w, w))
    ours = np.asarray(_row_shift_blocks_pallas(img, ki, f, nb, interpret=True))
    ref = np.asarray(_row_shift_blocks_xla(img, ki, f, nb))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_warp_bev_folded_matches_per_frame(rng):
    """warp_bev_folded on a [B,H,W,T*C] canvas == per-frame shear warp_bev
    on the unfolded [T,H,W,C] frames (frame 0 identity = pass-through)."""
    b, t, h, w, c = 1, 4, 24, 24, 4
    img = rng.normal(size=(t, h, w, c)).astype(np.float32)
    poses = [np.eye(4, dtype=np.float32)]
    for theta, tr in ((0.2, [0.5, -0.3]), (-0.35, [1.0, 0.7]), (0.1, [0, 1.1])):
        p = np.eye(4, dtype=np.float32)
        p[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                     [np.sin(theta), np.cos(theta)]]
        p[:2, 3] = tr
        poses.append(p)
    poses = np.stack(poses)
    args = (0.25, 0.25, -3.0, -3.0)

    folded = jnp.asarray(img.transpose(1, 2, 0, 3).reshape(1, h, w, t * c))
    out = np.asarray(bilinear.warp_bev_folded(
        folded, jnp.asarray(poses)[None], *args))
    out = out.reshape(h, w, t, c).transpose(2, 0, 1, 3)

    for k in range(t):
        single = np.asarray(bilinear.warp_bev(
            jnp.asarray(img[k]), jnp.asarray(poses[k]), *args,
            method="shear"))
        np.testing.assert_allclose(out[k], single, atol=1e-5,
                                   err_msg=f"frame {k}")
    # frame 0 (identity pose) is a pass-through up to the ~1e-7 float
    # residue of the pixel-affine shift derivation
    np.testing.assert_allclose(out[0], img[0], atol=1e-5)


def test_temporal_ungrid_folded_matches_unfolded(rng):
    t, h, w, c, n = 3, 16, 16, 6, 200
    feats = rng.normal(size=(t, h, w, c)).astype(np.float32)
    pts = (rng.random((n, 2)).astype(np.float32) - 0.5) * 7.5
    tid = rng.integers(0, t, size=n).astype(np.int32)
    ref = np.asarray(bilinear.temporal_ungrid(
        jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(tid), -4.0))
    folded = jnp.asarray(feats.transpose(1, 2, 0, 3).reshape(h, w, t * c))
    ours = np.asarray(bilinear.temporal_ungrid_folded(
        folded, jnp.asarray(pts), jnp.asarray(tid), -4.0, t))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_row_shift_blocks_nonaligned_lanes(rng):
    """T*C over 128 lanes (Waymo T=5, C=32 -> 160): row_shift_blocks must
    chunk into <=128-lane launches (Mosaic rejects wider scratches) and
    still match the single-pass XLA reference."""
    from pcaccumulation_tpu.ops.bilinear import (
        _row_shift_blocks_xla,
        row_shift_blocks,
    )

    r, w, c, nb = 16, 24, 32, 5
    img = jnp.asarray(rng.normal(size=(r, w, nb * c)).astype(np.float32))
    shifts_np = (rng.random((r, nb)).astype(np.float32) - 0.5) * 2.5 * w
    shifts = jnp.asarray(shifts_np)
    ours = np.asarray(row_shift_blocks(img, shifts, nb))
    assert ours.shape == (r, w, nb * c)
    k = np.floor(shifts_np)
    f = jnp.asarray((shifts_np - k).astype(np.float32))
    ki = jnp.asarray(np.clip(k.astype(np.int32), -w, w))
    ref = np.asarray(_row_shift_blocks_xla(img, ki, f, nb))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_gather_bev_at_pillars_grad_parity(rng):
    """The unique-scatter custom VJP must match the autodiff gradient of
    the plain take_along_axis formulation (incl. invalid rows)."""
    from pcaccumulation_tpu.models.pillar_encoder import (
        gather_bev_at_pillars,
        pillar_flat_index,
    )

    b, t, h, w, c, m = 2, 3, 8, 8, 4, 20
    canvas = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.integers(0, t, (b, m)), rng.integers(0, h, (b, m)),
                  rng.integers(0, w, (b, m))], -1).astype(np.int32))
    # make cells unique per sample (the voxelizer guarantees this)
    flat = np.asarray(pillar_flat_index(coords, (h, w)))
    for bi in range(b):
        _, first = np.unique(flat[bi], return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
    valid = jnp.asarray(np.stack([
        np.isin(np.arange(m), np.unique(flat[bi], return_index=True)[1])
        for bi in range(b)
    ]))

    def ref(cv):
        fc = cv.reshape(b, t * h * w, c)
        idx = jnp.clip(pillar_flat_index(coords, (h, w)), 0, t * h * w - 1)
        out = jnp.take_along_axis(fc, idx[..., None], axis=1)
        return out * valid[..., None].astype(out.dtype)

    cot = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    out_new, vjp_new = jax.vjp(
        lambda cv: gather_bev_at_pillars(cv, coords, valid), canvas)
    out_ref, vjp_ref = jax.vjp(ref, canvas)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp_new(cot)[0]),
                               np.asarray(vjp_ref(cot)[0]), atol=1e-6)


def test_densify_gather_matches_scatter_fwd_and_grad(rng):
    """scatter_pillars_to_bev_gather (inverse-map row gather, PROFILE_r07)
    must be value- AND gradient-identical to scatter_pillars_to_bev on
    unique valid cells, including invalid-pillar handling."""
    from pcaccumulation_tpu.models.pillar_encoder import (
        pillar_flat_index,
        scatter_pillars_to_bev,
        scatter_pillars_to_bev_gather,
    )

    b, t, h, w, c, m = 2, 4, 8, 8, 6, 24
    feats = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.integers(0, t, (b, m)), rng.integers(0, h, (b, m)),
                  rng.integers(0, w, (b, m))], -1).astype(np.int32))
    flat = np.asarray(pillar_flat_index(coords, (h, w)))
    # valid = first occurrence of each cell, minus a random 20% (the
    # voxelizer guarantees valid cells are unique; invalid rows may collide)
    valid = np.stack([
        np.isin(np.arange(m), np.unique(flat[bi], return_index=True)[1])
        for bi in range(b)
    ]) & (rng.random((b, m)) > 0.2)
    valid = jnp.asarray(valid)

    cot = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32))
    out_g, vjp_g = jax.vjp(
        lambda f: scatter_pillars_to_bev_gather(f, coords, valid, t, (h, w)),
        feats)
    out_s, vjp_s = jax.vjp(
        lambda f: scatter_pillars_to_bev(f, coords, valid, t, (h, w)), feats)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp_g(cot)[0]),
                               np.asarray(vjp_s(cot)[0]), atol=1e-6)
