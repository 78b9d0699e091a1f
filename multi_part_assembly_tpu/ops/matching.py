"""Device-side linear sum assignment + equivalent-part matching.

The reference matches geometrically-equivalent parts per batch element by
running `scipy.optimize.linear_sum_assignment` on the CPU inside the train
step (reference: multi_part_assembly/models/modules/base_model.py:146-238),
forcing a device->host sync every batch.  Here the LAP solves on-device with
a jittable shortest-augmenting-path (Jonker-Volgonant style) solver, so the
whole MoN loss (including matching) stays inside one compiled step and vmaps
over both the batch and the MoN sample axes.

P <= 20 makes the O(P^3) solve trivial; the inner Dijkstra scans are
vectorized over columns.
"""

import jax
import jax.numpy as jnp

from ..utils.transforms import transform_pc

__all__ = ['solve_lap', 'hungarian_scipy', 'match_parts']

_BIG = 1e9


def _solve_lap_single(cost):
    """Exact LAP on an [n, n] float cost matrix.

    Returns col4row: for each row i, the assigned column.  Shortest
    augmenting path with dual variables; all column scans vectorized.
    """
    n = cost.shape[0]
    INF = jnp.float32(jnp.inf)
    arange = jnp.arange(n, dtype=jnp.int32)

    def assign_one_row(carry, cur_row):
        u, v, col4row, row4col = carry

        # --- Dijkstra from cur_row until an unassigned column is reached ---
        def dj_cond(s):
            return s[-1] < 0  # sink == -1

        def dj_body(s):
            i, min_val, shortest, pathback, SR, SC, _ = s
            SR = SR.at[i].set(True)
            r = min_val + cost[i] - u[i] - v  # [n]
            upd = (r < shortest) & (~SC)
            shortest = jnp.where(upd, r, shortest)
            pathback = jnp.where(upd, i, pathback)
            masked = jnp.where(SC, INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            lowest = masked[j]
            SC = SC.at[j].set(True)
            sink = jnp.where(row4col[j] < 0, j, -1)
            return (row4col[j], lowest, shortest, pathback, SR, SC, sink)

        init = (cur_row, jnp.float32(0.0), jnp.full((n, ), INF),
                jnp.full((n, ), -1, jnp.int32), jnp.zeros((n, ), bool),
                jnp.zeros((n, ), bool), jnp.int32(-1))
        _, min_val, shortest, pathback, SR, SC, sink = jax.lax.while_loop(
            dj_cond, dj_body, init)

        # --- dual updates ---
        u = u.at[cur_row].add(min_val)
        sr_other = SR & (arange != cur_row)
        u = jnp.where(sr_other, u + min_val - shortest[col4row], u)
        v = jnp.where(SC, v - (min_val - shortest), v)

        # --- augment along the alternating path ---
        def aug_cond(s):
            return ~s[-1]

        def aug_body(s):
            j, col4row, row4col, _ = s
            i = pathback[j]
            row4col = row4col.at[j].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return (nxt, col4row, row4col, i == cur_row)

        _, col4row, row4col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, jnp.bool_(False)))
        return (u, v, col4row, row4col), None

    init = (jnp.zeros((n, )), jnp.zeros((n, )),
            jnp.full((n, ), -1, jnp.int32), jnp.full((n, ), -1, jnp.int32))
    (u, v, col4row, row4col), _ = jax.lax.scan(assign_one_row, init, arange)
    return col4row


@jax.jit
def solve_lap(cost):
    """Batched exact LAP.  cost: [..., n, n] -> col4row [..., n] int32."""
    flat = cost.reshape((-1, ) + cost.shape[-2:]).astype(jnp.float32)
    out = jax.vmap(_solve_lap_single)(flat)
    return out.reshape(cost.shape[:-1])


def hungarian_scipy(cost):
    """Host scipy solver (validation baseline; matches reference semantics)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment
    cost = np.asarray(cost)
    flat = cost.reshape((-1, ) + cost.shape[-2:])
    out = np.zeros(flat.shape[:2], np.int32)
    for i, c in enumerate(flat):
        _, cind = linear_sum_assignment(c)
        out[i] = cind
    return out.reshape(cost.shape[:-1])


def _pair_chamfer_cost(pts1, pts2):
    """Symmetric chamfer cost matrix between two sets of posed parts.

    pts1/pts2: [B, P, n, 3] -> [B, P, P] where [b, i, j] is the mean
    bidirectional chamfer between pts1[b, i] and pts2[b, j]
    (reference base_model.py:163-176).

    The cross-product matmul packs 3-term bf16 mantissa splits along the
    contraction (K=3 -> K=18, still ONE MXU pass; ~2^-24 relative accuracy
    like the chamfer kernel's X48 packing, ops/chamfer.py:_pack_x48) --
    ~6x cheaper than the HIGHEST (6-pass) f32 einsum it replaces, and this
    runs per MoN sample per train step (bench_semantic 'cost').

    Precision contract (ADVICE r4): the ~2^-24 relative error (plus
    cancellation in x2 + y2 - 2xy for near-coincident points) can flip the
    Hungarian assignment between NEAR-TIE parts relative to an exact f32
    cost.  That is accepted by design: ties only arise between parts in
    the same `match_ids` group, i.e. geometrically-equivalent ones, and
    the downstream loss is invariant under permutations within a group
    (the reference itself breaks such ties by scipy's arbitrary row
    order, base_model.py:175).
    """
    from .chamfer import _split3
    x2 = jnp.sum(pts1 * pts1, axis=-1)  # [B, P, n]
    y2 = jnp.sum(pts2 * pts2, axis=-1)
    a1, a2, a3 = _split3(pts1)
    b1, b2, b3 = _split3(pts2)
    xpack = jnp.concatenate([a1, a1, a1, a2, a2, a3], axis=-1)  # [B,P,n,18]
    ypack = jnp.concatenate([b1, b2, b3, b1, b2, b1], axis=-1)
    xy = jnp.einsum('bins,bjms->bijnm', xpack, ypack,
                    preferred_element_type=jnp.float32)  # [B, P, P, n, n]
    d = jnp.maximum(
        x2[:, :, None, :, None] + y2[:, None, :, None, :] - 2 * xy, 0.0)
    d1 = jnp.min(d, axis=4).mean(axis=3)  # [B, P, P]
    d2 = jnp.min(d, axis=3).mean(axis=3)
    return d1 + d2


def match_parts(part_pcs, pred_trans, pred_rot, gt_trans, gt_rot, match_ids,
                sample_key, rot_type, n_sample=100):
    """Permute GT poses so equivalent parts match predictions at min cost.

    Semantic-assembly Hungarian matching (reference base_model.py:181-238):
    for each group of geometrically-equivalent parts (same nonzero
    `match_ids` label), reorder the GT poses to minimize the chamfer cost
    against the predicted poses.  Implemented as ONE P x P LAP per batch
    element with cross-group entries masked to a large constant -- the block
    structure makes it decompose into the reference's per-group LAPs, but it
    stays fully on-device and vmappable.

    Args:
        part_pcs: [B, P, N, 3] canonical part points
        pred_trans / gt_trans: [B, P, 3]
        pred_rot / gt_rot: [B, P, 4] or [B, P, 3, 3] raw rotation tensors
        match_ids: [B, P] int group labels (0 = unique/padded part)
        sample_key: PRNG key for the 100-point subsample (reference
            base_model.py:163-166 uses torch.randperm)
        rot_type: 'quat' | 'rmat'

    Returns:
        (new_gt_trans, new_gt_rot) with rows permuted within groups.
    """
    # matching is not differentiated (reference wraps it in no_grad,
    # base_model.py:146); stop gradients so the LAP while_loops never see
    # cotangents
    part_pcs, pred_trans, pred_rot, gt_trans, gt_rot = map(
        jax.lax.stop_gradient,
        (part_pcs, pred_trans, pred_rot, gt_trans, gt_rot))
    B, P, N, _ = part_pcs.shape
    match_ids = match_ids.astype(jnp.int32)

    # subsample points for speed (same subsample for every part, as in ref).
    # The row pick is a one-hot selection matmul: XLA lowers a fancy-index
    # gather of whole [3] rows to a sequential per-index loop on TPU (same
    # hazard as datasets/geometry.py `unpack_parts`); HIGHEST precision
    # keeps the selected coordinates bit-exact (products with 0/1 only).
    sample_idx = jax.random.permutation(sample_key, N)[:n_sample]
    sel = (sample_idx[:, None] ==
           jnp.arange(N, dtype=sample_idx.dtype)[None]).astype(jnp.float32)
    pts = jnp.einsum('sn,bpnc->bpsc', sel, part_pcs,
                     precision=jax.lax.Precision.HIGHEST)  # [B, P, n, 3]

    pts_pred = transform_pc(pred_trans, pred_rot, pts, rot_type=rot_type)
    pts_gt = transform_pc(gt_trans, gt_rot, pts, rot_type=rot_type)

    cost = _pair_chamfer_cost(pts_pred, pts_gt)  # [B, P, P]

    same_group = (match_ids[:, :, None] == match_ids[:, None, :])
    grouped = match_ids > 0  # [B, P]
    in_block = same_group & grouped[:, :, None]
    diag = jnp.eye(P, dtype=bool)[None]
    # grouped rows: chamfer cost within the group, BIG elsewhere
    # ungrouped rows: 0 on the diagonal, BIG elsewhere -> identity assignment
    lap_cost = jnp.where(in_block, cost, _BIG)
    lap_cost = jnp.where(diag & ~grouped[:, :, None], 0.0, lap_cost)

    perm = solve_lap(lap_cost)  # [B, P] col for each row
    perm = jax.lax.stop_gradient(perm)

    new_gt_trans = jnp.take_along_axis(gt_trans, perm[..., None], axis=1)
    if gt_rot.ndim == 3:  # quat [B, P, 4]
        new_gt_rot = jnp.take_along_axis(gt_rot, perm[..., None], axis=1)
    else:  # rmat [B, P, 3, 3]
        new_gt_rot = jnp.take_along_axis(gt_rot, perm[..., None, None],
                                         axis=1)
    return jax.lax.stop_gradient(new_gt_trans), \
        jax.lax.stop_gradient(new_gt_rot)
