"""Pose / point-cloud transformation functions in pure jnp.

TPU-native counterpart of reference multi_part_assembly/utils/transforms.py.
All functions are traceable, differentiable, and fuse into surrounding XLA
programs (no host round-trips).  Quaternions are w-first throughout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .rotation import (Rotation3D, matrix_to_quaternion, quaternion_apply,
                       quaternion_invert, quaternion_multiply,
                       quaternion_to_matrix)

__all__ = [
    'random_quaternions', 'qmul', 'qrot', 'qtransform', 'qtransform_invert',
    'qrmat', 'rmatq', 'rmat_rot', 'rmat_transform', 'random_rotation_matrixs',
    'rot_pc', 'transform_pc', 'quaternion_to_rmat', 'trans_rmat_to_pmat',
    'trans_quat_to_pmat', 'qrot_np', 'qtransform_np', 'rmat_rot_np',
    'rmat_transform_np',
]


def random_quaternions(key, shape, dtype=jnp.float32):
    """Uniform random unit quaternions with non-negative real part.

    Marsaglia-style: normalize 4D gaussians (uniform on S^3 == uniform
    rotations).  Extends reference transforms.py:32-52 to arbitrary shape,
    but keyed by JAX PRNG instead of global torch RNG.
    """
    if isinstance(shape, int):
        shape = (shape, )
    q = jax.random.normal(key, tuple(shape) + (4, ), dtype=dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def random_rotation_matrixs(key, shape, dtype=jnp.float32):
    """Random rotation matrices via random quaternions (transforms.py:129-141)."""
    return quaternion_to_matrix(random_quaternions(key, shape, dtype))


def qmul(q, r):
    """Hamilton product (reference transforms.py:55-62)."""
    return quaternion_multiply(q, r)


def qrmat(q):
    assert q.shape[-1] == 4
    return quaternion_to_matrix(q)


def rmatq(r):
    assert r.shape[-1] == r.shape[-2] == 3
    return matrix_to_quaternion(r)


def qrot(q, v):
    """Rotate points v (..., 3) by quaternions q (reference transforms.py:65-77)."""
    if q.ndim == v.ndim - 1:
        q = q[..., None, :]
    return quaternion_apply(q, v)


def qtransform(t, q, v):
    """qrot then translate (reference transforms.py:80-101)."""
    assert t.shape[-1] == 3
    if t.ndim == v.ndim - 1:
        t = t[..., None, :]
    return qrot(q, v) + t


def qtransform_invert(t, q, tqv):
    """Inverse of qtransform (reference transforms.py:104-115)."""
    assert t.shape[-1] == 3
    if t.ndim == tqv.ndim - 1:
        t = t[..., None, :]
    return qrot(quaternion_invert(q), tqv - t)


def rmat_rot(r, v):
    """Rotate points v (..., 3) by matrices r (..., 3, 3) (transforms.py:156-173).

    Implemented as broadcast multiply + sum (VPU): a K=3 contraction would
    waste the MXU and, on TPU, default-matmul precision is bf16 which is not
    acceptable for geometry math.
    """
    assert r.shape[-1] == r.shape[-2] == 3
    assert v.shape[-1] == 3
    if r.ndim == v.ndim:
        r = r[..., None, :, :]
    return jnp.sum(r * v[..., None, :], axis=-1)


def rmat_transform(t, r, v):
    """rmat_rot then translate (transforms.py:176-193)."""
    assert t.shape[-1] == 3
    if t.ndim == v.ndim - 1:
        t = t[..., None, :]
    return rmat_rot(r, v) + t


def rot_pc(rot, pc, rot_type=None):
    """Rotate a point cloud by a Rotation3D or raw tensor (transforms.py:199-221)."""
    if rot_type is None:
        assert isinstance(rot, Rotation3D)
        r, rot_type = rot.rot, rot.rot_type
    else:
        r = rot
    if rot_type == 'quat':
        return qrot(r, pc)
    if rot_type == 'rmat':
        return rmat_rot(r, pc)
    raise NotImplementedError(f'{rot_type} is not supported')


def transform_pc(trans, rot, pc, rot_type=None):
    """Rotate + translate a point cloud (transforms.py:224-244)."""
    if rot_type is None:
        assert isinstance(rot, Rotation3D)
        r, rot_type = rot.rot, rot.rot_type
    else:
        r = rot
    if rot_type == 'quat':
        return qtransform(trans, r, pc)
    if rot_type == 'rmat':
        return rmat_transform(trans, r, pc)
    raise NotImplementedError(f'{rot_type} is not supported')


# numpy-convenience variants (host-side plumbing; transforms.py:250-273)


def qrot_np(q, v):
    return np.asarray(qrot(jnp.asarray(q), jnp.asarray(v)))


def qtransform_np(t, q, v):
    return np.asarray(
        qtransform(jnp.asarray(t), jnp.asarray(q), jnp.asarray(v)))


def rmat_rot_np(r, v):
    return np.asarray(rmat_rot(jnp.asarray(r), jnp.asarray(v)))


def rmat_transform_np(t, r, v):
    return np.asarray(
        rmat_transform(jnp.asarray(t), jnp.asarray(r), jnp.asarray(v)))


def quaternion_to_rmat(quat):
    """Single w-first quat [4] -> 3x3 matrix, numpy (transforms.py:276-279)."""
    return np.asarray(quaternion_to_matrix(jnp.asarray(quat)))


def trans_rmat_to_pmat(trans, rmat):
    """Translation + rotation matrix -> homogeneous 4x4 (transforms.py:282-287)."""
    pose_mat = np.eye(4)
    pose_mat[:3, :3] = np.asarray(rmat)
    pose_mat[:3, -1] = np.asarray(trans)
    return pose_mat


def trans_quat_to_pmat(trans, quat):
    """Translation + quaternion -> homogeneous 4x4 (transforms.py:290-295)."""
    return trans_rmat_to_pmat(trans, quaternion_to_rmat(quat))
