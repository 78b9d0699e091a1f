"""Kernel-vs-reference numeric tests (mirrors the reference's
test_chamfer.py pattern: native op vs naive implementation, plus grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from multi_part_assembly_tpu.ops import (ball_query, chamfer_distance,
                                         chamfer_distance_ref, chamfer_parts,
                                         furthest_point_sample, gather_points,
                                         get_graph_feature, group_points, knn,
                                         match_parts, nn_distance, solve_lap,
                                         three_interpolate, three_nn)
from multi_part_assembly_tpu.ops.chamfer import (_nn_direction_pallas,
                                                 _nn_parts_ref,
                                                 _pairwise_sqdist)


# ---------------------------------------------------------------------------
# chamfer
# ---------------------------------------------------------------------------


def test_chamfer_matches_naive(rng):
    x = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randn(2, 96, 3), jnp.float32)
    d1, d2 = chamfer_distance(x, y)
    rd1, _, rd2, _ = chamfer_distance_ref(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), atol=1e-5)


def test_chamfer_transpose_and_sqrt(rng):
    x = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    d1, d2 = chamfer_distance(
        jnp.swapaxes(x, 1, 2), jnp.swapaxes(y, 1, 2), transpose=True,
        sqrt=True)
    rd1, _, rd2, _ = chamfer_distance_ref(x, y)
    np.testing.assert_allclose(
        np.asarray(d1), np.sqrt(np.asarray(rd1)), atol=1e-4)


def test_chamfer_pallas_interpret_matches(rng):
    x = jnp.asarray(rng.randn(2, 300, 3), jnp.float32)
    y = jnp.asarray(rng.randn(2, 200, 3), jnp.float32)
    rd1, ri1, _, _ = chamfer_distance_ref(x, y)
    pd1, pi1 = _nn_direction_pallas(x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(pd1), np.asarray(rd1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pi1), np.asarray(ri1))


def test_chamfer_grad_matches_naive(rng):
    x = jnp.asarray(rng.randn(2, 20, 3), jnp.float32)
    y = jnp.asarray(rng.randn(2, 30, 3), jnp.float32)

    def f_op(x, y):
        d1, d2 = chamfer_distance(x, y)
        return jnp.mean(d1) + jnp.mean(d2)

    def f_ref(x, y):
        d = _pairwise_sqdist(x, y)
        return jnp.mean(jnp.min(d, 2)) + jnp.mean(jnp.min(d, 1))

    g_op = jax.jit(jax.grad(f_op, argnums=(0, 1)))(x, y)
    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(x, y)
    np.testing.assert_allclose(
        np.asarray(g_op[0]), np.asarray(g_ref[0]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_op[1]), np.asarray(g_ref[1]), atol=1e-5)


def test_chamfer_parts_matches_padded_reference(rng):
    B, P, N = 3, 5, 64
    x = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32)
    y = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32)
    nparts = np.array([2, 5, 3])
    valids = jnp.asarray(
        (np.arange(P)[None] < nparts[:, None]).astype(np.float32))
    d1, d2 = chamfer_parts(x, y, valids)
    # reference semantics: pad to 1e3, full chamfer, mask
    pv = jnp.repeat(valids, N, axis=1)
    xf = jnp.where(pv[..., None] > 0, x.reshape(B, P * N, 3), 1e3)
    yf = jnp.where(pv[..., None] > 0, y.reshape(B, P * N, 3), 1e3)
    rd1, _, rd2, _ = chamfer_distance_ref(xf, yf)
    np.testing.assert_allclose(
        np.asarray(d1 * pv), np.asarray(rd1 * pv), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(d2 * pv), np.asarray(rd2 * pv), atol=1e-4)


def test_chamfer_parts_grads(rng):
    B, P, N = 2, 4, 32
    x = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32)
    y = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32)
    nparts = np.array([2, 4])
    valids = jnp.asarray(
        (np.arange(P)[None] < nparts[:, None]).astype(np.float32))
    pv = jnp.repeat(valids, N, axis=1)

    def f_op(x, y):
        d1, d2 = chamfer_parts(x, y, valids)
        return jnp.sum(d1 * pv) + jnp.sum(d2 * pv)

    def f_ref(x, y):
        xf = jnp.where(pv[..., None] > 0, x.reshape(B, P * N, 3), 1e3)
        yf = jnp.where(pv[..., None] > 0, y.reshape(B, P * N, 3), 1e3)
        d = _pairwise_sqdist(xf, yf)
        return jnp.sum(jnp.min(d, 2) * pv) + jnp.sum(jnp.min(d, 1) * pv)

    g_op = jax.jit(jax.grad(f_op, argnums=(0, 1)))(x, y)
    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(x, y)
    np.testing.assert_allclose(
        np.asarray(g_op[0]), np.asarray(g_ref[0]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_op[1]), np.asarray(g_ref[1]), atol=1e-4)


def test_nn_distance_indices(rng):
    x = jnp.asarray(rng.randn(1, 40, 3), jnp.float32)
    y = jnp.asarray(rng.randn(1, 50, 3), jnp.float32)
    d1, i1, d2, i2 = nn_distance(x, y)
    rd1, ri1, rd2, ri2 = chamfer_distance_ref(x, y)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))


# ---------------------------------------------------------------------------
# knn / graph features
# ---------------------------------------------------------------------------


def test_knn_vs_bruteforce(rng):
    x = jnp.asarray(rng.randn(2, 100, 3), jnp.float32)
    idx = np.asarray(knn(x, 8))
    xn = np.asarray(x)
    for b in range(2):
        d = ((xn[b][:, None] - xn[b][None])**2).sum(-1)
        ref = np.argsort(d, axis=1)[:, :8]
        # compare as sets (ties may reorder)
        for i in range(100):
            assert set(idx[b, i]) == set(ref[i]), (b, i)


def test_get_graph_feature_shape_and_content(rng):
    x = jnp.asarray(rng.randn(2, 50, 4), jnp.float32)
    feats = get_graph_feature(x, k=5)
    assert feats.shape == (2, 50, 5, 8)
    idx = np.asarray(knn(x, 5))
    fn = np.asarray(feats)
    xn = np.asarray(x)
    b, i, kk = 1, 17, 3
    j = idx[b, i, kk]
    np.testing.assert_allclose(fn[b, i, kk, :4], xn[b, j] - xn[b, i],
                               atol=1e-6)
    np.testing.assert_allclose(fn[b, i, kk, 4:], xn[b, i], atol=1e-6)


# ---------------------------------------------------------------------------
# sampling ops
# ---------------------------------------------------------------------------


def _fps_numpy(xyz, m):
    """Literal port of the CUDA FPS semantics for testing."""
    N = xyz.shape[0]
    mag = (xyz**2).sum(-1)
    idxs = [0]
    temp = np.full(N, 1e10)
    for _ in range(1, m):
        last = xyz[idxs[-1]]
        best, besti = -1.0, 0
        for k in range(N):
            if mag[k] <= 1e-3:
                continue
            d = ((xyz[k] - last)**2).sum()
            temp[k] = min(temp[k], d)
            if temp[k] > best:
                best, besti = temp[k], k
        idxs.append(besti)
    return np.array(idxs)


def test_fps_matches_cuda_semantics(rng):
    xyz = rng.randn(2, 60, 3).astype(np.float32)
    xyz[0, 10:20] = 0.0  # padding points must never be selected
    out = np.asarray(furthest_point_sample(jnp.asarray(xyz), 12))
    for b in range(2):
        ref = _fps_numpy(xyz[b], 12)
        np.testing.assert_array_equal(out[b], ref)


def test_gather_and_group(rng):
    pts = jnp.asarray(rng.randn(2, 30, 5), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 30, (2, 7)), jnp.int32)
    out = np.asarray(gather_points(pts, idx))
    for b in range(2):
        np.testing.assert_allclose(out[b], np.asarray(pts)[b, np.asarray(idx)[b]])
    gidx = jnp.asarray(rng.randint(0, 30, (2, 7, 4)), jnp.int32)
    gout = np.asarray(group_points(pts, gidx))
    assert gout.shape == (2, 7, 4, 5)
    b, m, s = 1, 3, 2
    np.testing.assert_allclose(
        gout[b, m, s], np.asarray(pts)[b, np.asarray(gidx)[b, m, s]])


def test_ball_query_semantics(rng):
    xyz = rng.randn(1, 50, 3).astype(np.float32)
    centers = xyz[:, :4]
    r, S = 0.8, 6
    out = np.asarray(ball_query(r, S, jnp.asarray(xyz), jnp.asarray(centers)))
    d = ((centers[0][:, None] - xyz[0][None])**2).sum(-1)
    for m in range(4):
        hits = np.where(d[m] < r * r)[0]
        expect = list(hits[:S])
        if len(expect) == 0:
            expect = [0] * S
        else:
            expect = expect + [expect[0]] * (S - len(expect))
        np.testing.assert_array_equal(out[0, m], expect)


def test_three_nn_interpolate(rng):
    unknown = jnp.asarray(rng.randn(2, 20, 3), jnp.float32)
    known = jnp.asarray(rng.randn(2, 8, 3), jnp.float32)
    dist, idx = three_nn(unknown, known)
    d = np.asarray(
        ((np.asarray(unknown)[:, :, None] -
          np.asarray(known)[:, None])**2).sum(-1))
    ref_idx = np.argsort(d, axis=-1)[:, :, :3]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                  np.sort(ref_idx, -1))
    feats = jnp.asarray(rng.randn(2, 8, 6), jnp.float32)
    w = jax.nn.softmax(-dist, axis=-1)
    out = three_interpolate(feats, idx, w)
    assert out.shape == (2, 20, 6)


# ---------------------------------------------------------------------------
# LAP / matching
# ---------------------------------------------------------------------------


def test_lap_matches_scipy_random(rng):
    for n in [2, 5, 13, 20]:
        cost = rng.rand(8, n, n).astype(np.float32)
        ours = np.asarray(solve_lap(jnp.asarray(cost)))
        for b in range(8):
            rind, cind = linear_sum_assignment(cost[b])
            ref_total = cost[b][rind, cind].sum()
            our_total = cost[b][np.arange(n), ours[b]].sum()
            # optimal assignments may differ, totals must agree
            assert abs(ref_total - our_total) < 1e-4, (n, b)
            assert len(set(ours[b].tolist())) == n  # is a permutation


def test_lap_block_structure(rng):
    # mimic group-masked cost: identity for ungrouped, blocks for groups
    n = 8
    cost = np.full((n, n), 1e9, np.float32)
    for i in [0, 5, 6, 7]:
        cost[i, i] = 0.0
    block = rng.rand(4, 4).astype(np.float32)
    rows = [1, 2, 3, 4]
    for a, i in enumerate(rows):
        for b, j in enumerate(rows):
            cost[i, j] = block[a, b]
    ours = np.asarray(solve_lap(jnp.asarray(cost[None])))[0]
    for i in [0, 5, 6, 7]:
        assert ours[i] == i
    rind, cind = linear_sum_assignment(block)
    ref_total = block[rind, cind].sum()
    our_total = sum(cost[i, ours[i]] for i in rows)
    assert abs(ref_total - our_total) < 1e-4


def test_match_parts_reduces_cost(rng):
    """Matching should permute GT within groups and lower the chamfer cost."""
    B, P, N = 2, 6, 40
    key = jax.random.PRNGKey(0)
    part_pcs = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32)
    pred_trans = jnp.asarray(rng.randn(B, P, 3), jnp.float32) * 0.1
    gt_trans = jnp.asarray(rng.randn(B, P, 3), jnp.float32) * 0.1
    q = rng.randn(B, P, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    pred_rot = jnp.asarray(q)
    gt_rot = jnp.asarray(q)  # same rotation; translation drives cost
    match_ids = jnp.asarray(
        np.array([[1, 1, 0, 2, 2, 2], [0, 0, 1, 1, 0, 0]]), jnp.int32)

    new_trans, new_rot = match_parts(part_pcs, pred_trans, pred_rot, gt_trans,
                                     gt_rot, match_ids, key, 'quat')
    # ungrouped rows unchanged
    nt = np.asarray(new_trans)
    gt = np.asarray(gt_trans)
    assert np.allclose(nt[0, 2], gt[0, 2])
    assert np.allclose(nt[1, [0, 1, 4, 5]], gt[1, [0, 1, 4, 5]])
    # grouped rows are a permutation of the group's GT rows
    assert sorted(map(tuple, nt[0, [0, 1]].tolist())) == \
        sorted(map(tuple, gt[0, [0, 1]].tolist()))
    # matched cost <= unmatched cost
    cost_new = np.sum((np.asarray(pred_trans) - nt)**2)
    cost_old = np.sum((np.asarray(pred_trans) - gt)**2)
    assert cost_new <= cost_old + 1e-6


def test_match_parts_under_jit_vmap(rng):
    B, P, N = 2, 4, 16
    part_pcs = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32)
    trans = jnp.asarray(rng.randn(B, P, 3), jnp.float32)
    q = jnp.asarray([1., 0., 0., 0.]) * jnp.ones((B, P, 1))
    match_ids = jnp.zeros((B, P), jnp.int32)

    @jax.jit
    def f(key):
        return match_parts(part_pcs, trans, q, trans, q, match_ids, key,
                           'quat')

    nt, nr = f(jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(nt), np.asarray(trans))


def test_chamfer_pairs_matches_ref(rng):
    from multi_part_assembly_tpu.ops import chamfer_pairs
    M, N = 6, 40
    p1 = jnp.asarray(rng.randn(M, N, 3), jnp.float32)
    p2 = jnp.asarray(rng.randn(M, N, 3), jnp.float32)
    pval = jnp.asarray([1, 1, 0, 1, 0, 1], jnp.float32)
    d1, d2 = chamfer_pairs(p1, p2, pval)
    rd1, _, rd2, _ = chamfer_distance_ref(p1, p2)
    m = np.asarray(pval)[:, None]
    np.testing.assert_allclose(np.asarray(d1) * m, np.asarray(rd1) * m,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2) * m, np.asarray(rd2) * m,
                               atol=1e-4)
    # invalid pairs are zeroed
    np.testing.assert_allclose(np.asarray(d1)[2], 0.0)


def test_neighborhood_reduce_matches_gather(rng):
    """neighborhood_reduce (one-hot-dot gather + custom_vjp; the TPU
    EdgeConv core, ops/knn.py) matches a plain take_along_axis reference
    in values AND gradients, including the with_stats sum/sumsq paths."""
    from multi_part_assembly_tpu.ops.knn import knn, neighborhood_reduce

    B, N, K, C = 3, 32, 5, 8
    x = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    idx = knn(x, K)

    def ref(u):
        g = jnp.take_along_axis(u[:, :, None, :], idx[..., None], axis=1)
        return (jnp.max(g, 2), jnp.min(g, 2), jnp.sum(g, 2),
                jnp.sum(g * g, 2))

    for with_stats in (True, False):
        out = neighborhood_reduce(x, idx, with_stats)
        r = ref(x)
        n_check = 4 if with_stats else 2
        for a, b in zip(out[:n_check], r[:n_check]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    # gradients through all four outputs (random cotangent weights make
    # every bwd term load-bearing); ties are absent on random data so the
    # first-winner rule agrees with autodiff through the reference
    w = [jnp.asarray(rng.randn(B, N, C), jnp.float32) for _ in range(4)]

    def f_new(u):
        mx, mn, s, q = neighborhood_reduce(u, idx, True)
        return sum((t * ww).sum() for t, ww in zip((mx, mn, s, q), w))

    def f_ref(u):
        return sum((t * ww).sum() for t, ww in zip(ref(u), w))

    g_new = jax.grad(f_new)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
