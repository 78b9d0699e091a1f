"""Assembly losses, vmappable end-to-end (MoN samples x batch).

Counterpart of reference multi_part_assembly/utils/loss.py with identical
masked semantics, but built on the part-structured pallas chamfer so the
whole-shape term skips padded parts on device instead of pushing them 1e3
away (loss.py:172-182).
"""

import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer_diag, chamfer_distance, chamfer_parts
from .transforms import rot_pc, transform_pc

__all__ = [
    '_valid_mean', 'trans_l2_loss', 'rot_l2_loss', 'rot_cosine_loss',
    'rot_points_l2_loss', 'rot_points_cd_loss', 'shape_cd_loss',
    'repulsion_cd_loss',
]


def _valid_mean(loss_per_part, valids):
    """Per-shape mean over valid parts (reference loss.py:7-19).

    Args:
        loss_per_part: [B, P];  valids: [B, P] 1/0

    Returns: [B]
    """
    valids = jax.lax.stop_gradient(valids.astype(loss_per_part.dtype))
    return jnp.sum(loss_per_part * valids, axis=1) / jnp.sum(valids, axis=1)


def trans_l2_loss(trans1, trans2, valids):
    """Squared-L2 translation loss (reference loss.py:22-35). -> [B]"""
    loss_per_part = jnp.sum((trans1 - trans2)**2, axis=-1)
    return _valid_mean(loss_per_part, valids)


def rot_l2_loss(rot1, rot2, valids):
    """min(|q1-q2|^2, |q1+q2|^2) since q == -q (reference loss.py:38-56)."""
    assert rot1.rot_type == rot2.rot_type == 'quat'
    q1, q2 = rot1.rot, rot2.rot
    l2_1 = jnp.sum((q1 - q2)**2, axis=-1)
    l2_2 = jnp.sum((q1 + q2)**2, axis=-1)
    return _valid_mean(jnp.minimum(l2_1, l2_2), valids)


def rot_cosine_loss(rot1, rot2, valids):
    """Cosine rotation loss (reference loss.py:59-86).

    quat: 1 - |<q1, q2>|;  rmat: mean |I - R1^T R2|^2.
    """
    assert rot1.rot_type == rot2.rot_type
    if rot1.rot_type == 'quat':
        loss_per_part = 1.0 - jnp.abs(jnp.sum(rot1.rot * rot2.rot, axis=-1))
    elif rot1.rot_type == 'rmat':
        r1, r2 = rot1.rot, rot2.rot  # [B, P, 3, 3]
        rtr = jnp.einsum('...ji,...jk->...ik', r1, r2,
                         precision=jax.lax.Precision.HIGHEST)
        iden = jnp.eye(3, dtype=rtr.dtype)
        loss_per_part = jnp.mean((iden - rtr)**2, axis=(-1, -2))
    else:
        raise NotImplementedError(
            f'cosine loss not supported for {rot1.rot_type}')
    return _valid_mean(loss_per_part, valids)


def rot_points_l2_loss(pts, rot1, rot2, valids, ret_pts=False):
    """Per-point L2 between differently-rotated parts (loss.py:89-110)."""
    pts1 = rot_pc(rot1, pts)
    pts2 = rot_pc(rot2, pts)
    loss_per_part = jnp.mean(jnp.sum((pts1 - pts2)**2, axis=-1), axis=-1)
    loss_per_data = _valid_mean(loss_per_part, valids)
    if ret_pts:
        return loss_per_data, pts1, pts2
    return loss_per_data


def rot_points_cd_loss(pts, rot1, rot2, valids, ret_pts=False):
    """Per-part chamfer between differently-rotated parts (loss.py:113-138)."""
    pts1 = rot_pc(rot1, pts)
    pts2 = rot_pc(rot2, pts)
    # per-part chamfer with padded parts skipped (their loss is masked out
    # by _valid_mean anyway)
    dist1, dist2 = chamfer_diag(pts1, pts2, valids)  # [B, P, N]
    loss_per_part = jnp.mean(dist1, axis=2) + jnp.mean(dist2, axis=2)
    loss_per_data = _valid_mean(loss_per_part, valids)
    if ret_pts:
        return loss_per_data, pts1, pts2
    return loss_per_data


def shape_cd_loss(pts, trans1, trans2, rot1, rot2, valids, ret_pts=False,
                  training=True):
    """Whole-shape chamfer after posing all parts (reference loss.py:141-202).

    training=True divides by the fixed padded part count P (hard-negative
    weighting, loss.py:184-192); training=False divides by the true per-shape
    part count (the correct SCD, loss.py:194-198).  Padded parts are skipped
    by the part-structured kernel instead of being pushed 1e3 away.
    """
    B, P, N, _ = pts.shape
    pts = jax.lax.stop_gradient(pts)
    pts1 = transform_pc(trans1, rot1, pts)
    pts2 = transform_pc(trans2, rot2, pts)

    dist1, dist2 = chamfer_parts(pts1, pts2, valids)  # [B, P*N] each

    valids_f = jax.lax.stop_gradient(valids.astype(dist1.dtype))
    point_valids = jnp.repeat(valids_f, N, axis=1)  # [B, P*N]
    dist1 = dist1 * point_valids
    dist2 = dist2 * point_valids
    if training:
        loss_per_data = jnp.mean(dist1, axis=1) + jnp.mean(dist2, axis=1)
    else:
        dist = (dist1 + dist2).reshape(B, P, N).mean(-1)  # [B, P]
        loss_per_data = _valid_mean(dist, valids_f)

    if ret_pts:
        return loss_per_data, pts1, pts2
    return loss_per_data


def repulsion_cd_loss(part_pcs, valids, thre, dense_limit=2 ** 27):
    """Chamfer repulsion pushing parts apart (reference loss.py:205-225).

    Pairwise chamfer over all P x P part pairs.  Small problems take one
    dense call; past `dense_limit` pair-distance elements the P^2 input
    broadcast (~300MB of [B, P, P, N, 3] x2 at default train shapes) is
    traded for a lax.scan over the i-part axis, which materializes only
    [B, P, N, 3] per step while computing the identical cd matrix.
    """
    B, P, N, _ = part_pcs.shape
    if B * P * P * N * N <= dense_limit:
        pts1 = jnp.broadcast_to(part_pcs[:, :, None], (B, P, P, N, 3))
        pts2 = jnp.broadcast_to(part_pcs[:, None, :], (B, P, P, N, 3))
        d1, d2 = chamfer_distance(
            pts1.reshape(B * P * P, N, 3), pts2.reshape(B * P * P, N, 3))
        cd = (jnp.mean(d1, 1) + jnp.mean(d2, 1)).reshape(B, P, P)
    else:
        flat = part_pcs.reshape(B * P, N, 3)

        def row(_, pts_i):  # pts_i: [B, N, 3] = part i of every sample
            tiled = jnp.broadcast_to(pts_i[:, None], (B, P, N, 3))
            d1, d2 = chamfer_distance(tiled.reshape(B * P, N, 3), flat)
            return None, (jnp.mean(d1, 1) + jnp.mean(d2, 1)).reshape(B, P)

        _, cd = jax.lax.scan(row, None, jnp.swapaxes(part_pcs, 0, 1))
        cd = jnp.transpose(cd, (1, 0, 2))  # [P, B, P] -> [B, P, P]
    cd = jnp.maximum(thre - cd, 0.0)
    valid_mask = valids[:, :, None] * valids[:, None, :]
    return jnp.sum(cd * valid_mask, axis=(1, 2)) / \
        jnp.sum(valid_mask, axis=(1, 2))
