"""Evaluation metrics, all jittable (no host loops).

Counterpart of reference multi_part_assembly/utils/eval_utils.py.  The
reference's connectivity accuracy collects contact pairs with a Python
triple loop (eval_utils.py:85-99); here it is a dense masked computation
over the [B, P, P] contact matrix, which is trivially small.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer_diag
from .loss import _valid_mean
from .transforms import transform_pc

__all__ = [
    'calc_part_acc', 'calc_connectivity_acc', 'trans_metrics', 'rot_metrics',
]


def calc_part_acc(pts, trans1, trans2, rot1, rot2, valids):
    """Part Accuracy: per-part chamfer < 0.01 counted per shape
    (reference eval_utils.py:12-46). -> [B]"""
    pts1 = transform_pc(trans1, rot1, pts)
    pts2 = transform_pc(trans2, rot2, pts)
    dist1, dist2 = chamfer_diag(pts1, pts2, valids)  # [B, P, N]
    loss_per_part = jnp.mean(dist1, 2) + jnp.mean(dist2, 2)

    thre = 0.01
    acc = (loss_per_part < thre) & (valids == 1)
    return jnp.sum(acc, axis=-1) / jnp.sum(valids == 1, axis=-1)


def calc_connectivity_acc(trans, rot, contact_points):
    """Connectivity Accuracy (reference eval_utils.py:49-141).

    Pre-computed contact point pairs are transformed by the predicted poses
    of their two parts; a contact is correct if the min distance over all
    8 x 8 axis-mirror images is < 0.01.  The average is over all contacts in
    the batch, tiled to [B] (matching the reference's behavior).

    Args:
        trans: [B, P, 3]; rot: Rotation3D [B, P, .]; contact_points [B, P, P, 4]
    """
    B, P = trans.shape[:2]
    thre = 0.01
    rot_type = rot.rot_type
    r = rot.rot

    mask = contact_points[..., 0] == 1  # [B, P, P]
    p1 = contact_points[..., 1:]  # [B, P, P, 3] point in part i's frame
    p2 = jnp.swapaxes(contact_points, 1, 2)[..., 1:]  # partner point (j, i)

    # all 8 sign-mirror images (reference get_sym_point_list with sym=None,
    # eval_utils.py:113-141)
    signs = jnp.asarray(
        [[(-1.0)**x, (-1.0)**y, (-1.0)**z] for x in range(2)
         for y in range(2) for z in range(2)])  # [8, 3]
    sp1 = p1[..., None, :] * signs  # [B, P, P, 8, 3]
    sp2 = p2[..., None, :] * signs

    # pose of part i applies to p1[b, i, j]; pose of part j to p2[b, i, j]
    t1 = jnp.broadcast_to(trans[:, :, None, None, :], sp1.shape)
    t2 = jnp.broadcast_to(trans[:, None, :, None, :], sp2.shape)
    if rot_type == 'quat':
        r1 = jnp.broadcast_to(r[:, :, None, None, :], sp1.shape[:-1] + (4, ))
        r2 = jnp.broadcast_to(r[:, None, :, None, :], sp2.shape[:-1] + (4, ))
    else:
        r1 = jnp.broadcast_to(r[:, :, None, None, :, :],
                              sp1.shape[:-1] + (3, 3))
        r2 = jnp.broadcast_to(r[:, None, :, None, :, :],
                              sp2.shape[:-1] + (3, 3))
    tp1 = transform_pc(t1, r1, sp1[..., None, :], rot_type=rot_type)[..., 0, :]
    tp2 = transform_pc(t2, r2, sp2[..., None, :], rot_type=rot_type)[..., 0, :]

    # min over the 8 x 8 image pairs
    d = jnp.sum((tp1[..., :, None, :] - tp2[..., None, :, :])**2, axis=-1)
    min_d = jnp.min(d, axis=(-1, -2))  # [B, P, P]

    correct = (min_d < thre) & mask
    total = jnp.maximum(jnp.sum(mask), 1)
    acc = jnp.sum(correct) / total
    return jnp.ones((B, ), trans.dtype) * acc


def trans_metrics(trans1, trans2, valids, metric='rmse'):
    """Translation mse/rmse/mae (reference eval_utils.py:144-167). -> [B]"""
    assert metric in ['mse', 'rmse', 'mae']
    if metric == 'mse':
        per_part = jnp.mean((trans1 - trans2)**2, axis=-1)
    elif metric == 'rmse':
        per_part = jnp.sqrt(jnp.mean((trans1 - trans2)**2, axis=-1))
    else:
        per_part = jnp.mean(jnp.abs(trans1 - trans2), axis=-1)
    return _valid_mean(per_part, valids)


def rot_metrics(rot1, rot2, valids, metric='rmse'):
    """Rotation mse/rmse/mae on euler degrees with 360 wraparound
    (reference eval_utils.py:170-199). -> [B]"""
    assert metric in ['mse', 'rmse', 'mae']
    deg1 = rot1.to_euler(to_degree=True)  # [B, P, 3]
    deg2 = rot2.to_euler(to_degree=True)
    diff1 = jnp.abs(deg1 - deg2)
    diff = jnp.minimum(diff1, 360.0 - diff1)
    if metric == 'mse':
        per_part = jnp.mean(diff**2, axis=-1)
    elif metric == 'rmse':
        per_part = jnp.sqrt(jnp.mean(diff**2, axis=-1))
    else:
        per_part = jnp.mean(diff, axis=-1)
    return _valid_mean(per_part, valids)
