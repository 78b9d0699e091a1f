"""3D rotation representations as JAX pytrees.

TPU-native re-design of the reference's `Rotation3D` wrapper
(reference: multi_part_assembly/utils/rotation.py:91-309).  The reference
wraps a torch.Tensor and dispatches conversions to pytorch3d; here the
conversions are pure-jnp closed forms so everything traces and fuses under
`jax.jit`, and `Rotation3D` itself is a registered pytree, so it can flow
through `jit` / `vmap` / `grad` boundaries and live inside model outputs.

Supported representations (same as the reference):
  - ``quat``: (..., 4) w-first unit quaternion
  - ``rmat``: (..., 3, 3) rotation matrix; the constructor auto-converts a
    6D input (..., 6) or (..., 2, 3) via Gram-Schmidt (reference
    rotation.py:147-163)
  - ``axis``: (..., 3) axis-angle
Euler angles are an output-only conversion (``to_euler``), matching
reference rotation.py:201-204.
"""

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6

__all__ = [
    'Rotation3D', 'qeuler', 'quaternion_to_matrix', 'matrix_to_quaternion',
    'axis_angle_to_quaternion', 'quaternion_to_axis_angle',
    'axis_angle_to_matrix', 'matrix_to_axis_angle', 'rot6d_to_matrix',
    'standardize_quaternion', 'quaternion_multiply', 'quaternion_invert',
    'quaternion_apply',
]


# ---------------------------------------------------------------------------
# conversion primitives (pure jnp, w-first quaternions)
# ---------------------------------------------------------------------------


def quaternion_to_matrix(quat):
    """Convert w-first quaternion(s) (..., 4) to rotation matrices (..., 3, 3).

    Standard closed form for unit quaternions (left-multiply convention,
    matching pytorch3d / reference transforms).
    """
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.maximum(jnp.sum(quat * quat, axis=-1), EPS)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def _sqrt_positive_part(x):
    """sqrt(max(0, x)) with a subgradient of 0 at x=0."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix):
    """Convert rotation matrices (..., 3, 3) to w-first quaternions (..., 4).

    Branchless variant of the Shepperd / pytorch3d method: build all four
    candidate quaternions (one per largest diagonal element) and select the
    best-conditioned one, so the function is stable and jit/vmap friendly.
    """
    batch_shape = matrix.shape[:-2]
    m = matrix.reshape(batch_shape + (9, ))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        ))

    # candidate quaternions for each dominant component (unscaled)
    quat_by_w = jnp.stack(
        [q_abs[..., 0]**2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack(
        [m21 - m12, q_abs[..., 1]**2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack(
        [m02 - m20, m10 + m01, q_abs[..., 2]**2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack(
        [m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3]**2], axis=-1)
    quat_candidates = jnp.stack(
        [quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)  # (..., 4, 4)
    # normalize each candidate by 2*|q_i|
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    quat_candidates = quat_candidates / denom

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1),
        axis=-2)[..., 0, :]
    return quat


def standardize_quaternion(quat):
    """Flip sign so the real part is non-negative (q and -q are equal)."""
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def quaternion_multiply(a, b):
    """Hamilton product of w-first quaternions, broadcasting over batch."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(quat):
    """Conjugate of a unit quaternion."""
    return quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quaternion_apply(quat, point):
    """Rotate points (..., 3) by w-first quaternions (..., 4).

    Uses the expanded Rodrigues-like form (no intermediate pure quaternion),
    which is cheaper and fuses well on the VPU.
    """
    w = quat[..., :1]
    v = quat[..., 1:]
    # q p q* = p + 2 w (v x p) + 2 v x (v x p)
    cross1 = jnp.cross(v, point)
    cross2 = jnp.cross(v, cross1)
    return point + 2.0 * (w * cross1 + cross2)


def axis_angle_to_quaternion(axis_angle):
    """(..., 3) axis-angle to w-first quaternion, stable near zero angle."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angle * 0.5
    # sin(x/2)/x, with Taylor fallback near 0
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angle * angle) / 48.0,
        jnp.sin(half) / jnp.maximum(angle, 1e-12),
    )
    return jnp.concatenate(
        [jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quat):
    """w-first quaternion to (..., 3) axis-angle, stable near identity.

    angle = 2*atan2(|v|, w) is always in [0, 2pi), so sin(angle/2)/angle is
    well defined away from 0 and handled by a Taylor series near 0.
    """
    norm = jnp.linalg.norm(quat[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm, quat[..., :1])
    angle = 2.0 * half
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angle * angle) / 48.0,
        jnp.sin(half) / jnp.maximum(angle, 1e-12),
    )
    return quat[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle):
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix):
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rot6d_to_matrix(d6):
    """6D rotation representation (CVPR'19) to a 3x3 matrix via Gram-Schmidt.

    Input (..., 6) = two 3D row vectors; output rows are (b1, b2, b1 x b2)
    (matches pytorch3d's rotation_6d_to_matrix used at reference
    rotation.py:147-163).
    """
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


# quaternion -> euler formulas per axis order, from the reference's qeuler
# (rotation.py:35-88), re-expressed in jnp.  `epsilon` clamps asin inputs.
def qeuler(q, order='zyx', epsilon=0.0, to_degree=False):
    """Convert w-first quaternions (..., 4) to euler angles (..., 3)."""
    assert q.shape[-1] == 4
    q0, q1, q2, q3 = jnp.moveaxis(q, -1, 0)

    def _asin(x):
        return jnp.arcsin(jnp.clip(x, -1 + epsilon, 1 - epsilon))

    if order == 'xyz':
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = _asin(2 * (q1 * q3 + q0 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == 'yzx':
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = _asin(2 * (q1 * q2 + q0 * q3))
    elif order == 'zxy':
        x = _asin(2 * (q0 * q1 + q2 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == 'xzy':
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = _asin(2 * (q0 * q3 - q1 * q2))
    elif order == 'yxz':
        x = _asin(2 * (q0 * q1 - q2 * q3))
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == 'zyx':
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = _asin(2 * (q0 * q2 - q1 * q3))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError(f'unknown euler order {order}')

    euler = jnp.stack([x, y, z], axis=-1)
    if to_degree:
        euler = euler * (180.0 / np.pi)
    return euler


# ---------------------------------------------------------------------------
# Rotation3D pytree
# ---------------------------------------------------------------------------

_CONVERT = {
    ('quat', 'rmat'): quaternion_to_matrix,
    ('quat', 'axis'): quaternion_to_axis_angle,
    ('rmat', 'quat'): matrix_to_quaternion,
    ('rmat', 'axis'): matrix_to_axis_angle,
    ('axis', 'quat'): axis_angle_to_quaternion,
    ('axis', 'rmat'): axis_angle_to_matrix,
}


@jax.tree_util.register_pytree_node_class
class Rotation3D:
    """Immutable rotation wrapper; `rot_type` is static pytree metadata.

    API mirrors the reference Rotation3D (rotation.py:91-309) minus the
    torch-specific device plumbing: `convert`, `to_quat/to_rmat/to_axis_angle`,
    `to_euler`, `apply_rotation`, shape ops, indexing, `cat`/`stack`.
    """

    ROT_TYPE = ('quat', 'rmat', 'axis')

    def __init__(self, rot, rot_type='quat'):
        assert rot_type in self.ROT_TYPE, f'unsupported rot_type {rot_type}'
        rot = jnp.asarray(rot)
        if rot.dtype not in (jnp.float32, jnp.float64, jnp.bfloat16):
            rot = rot.astype(jnp.float32)
        if rot_type == 'quat':
            assert rot.shape[-1] == 4, 'wrong quaternion shape'
            # zero-norm (padded) quats -> identity (reference
            # rotation.py:121-128); harmless for real quats
            sq_norm = jnp.sum(rot * rot, axis=-1, keepdims=True)
            iden = jnp.zeros_like(rot).at[..., 0].set(1.0)
            rot = jnp.where(sq_norm > 0.25, rot, iden)
        elif rot_type == 'rmat':
            if rot.shape[-1] == 3 and rot.shape[-2] == 3:
                pass
            elif rot.shape[-1] == 3 and rot.shape[-2] == 2:
                rot = rot6d_to_matrix(rot.reshape(rot.shape[:-2] + (6, )))
            elif rot.shape[-1] == 6:
                rot = rot6d_to_matrix(rot)
            else:
                raise ValueError(f'wrong rotation matrix shape {rot.shape}')
        else:
            assert rot.shape[-1] == 3, 'wrong axis-angle shape'
        object.__setattr__(self, '_rot', rot)
        object.__setattr__(self, '_rot_type', rot_type)

    # pytree protocol: `rot_type` is aux data, the tensor is the leaf.
    def tree_flatten(self):
        return (self._rot, ), self._rot_type

    @classmethod
    def tree_unflatten(cls, rot_type, children):
        obj = object.__new__(cls)
        object.__setattr__(obj, '_rot', children[0])
        object.__setattr__(obj, '_rot_type', rot_type)
        return obj

    @classmethod
    def _wrap(cls, rot, rot_type):
        """Build without re-running constructor normalization."""
        obj = object.__new__(cls)
        object.__setattr__(obj, '_rot', rot)
        object.__setattr__(obj, '_rot_type', rot_type)
        return obj

    # --- core ---
    @property
    def rot(self):
        return self._rot

    @property
    def rot_type(self):
        return self._rot_type

    def convert(self, rot_type):
        assert rot_type in self.ROT_TYPE, f'unknown target {rot_type}'
        if rot_type == self._rot_type:
            return self
        fn = _CONVERT[(self._rot_type, rot_type)]
        return self._wrap(fn(self._rot), rot_type)

    def to_quat(self):
        return self.convert('quat').rot

    def to_rmat(self):
        return self.convert('rmat').rot

    def to_axis_angle(self):
        return self.convert('axis').rot

    def to_euler(self, order='zyx', to_degree=True):
        return qeuler(self.to_quat(), order=order, to_degree=to_degree)

    def apply_rotation(self, rot):
        """Left-multiply by another Rotation3D (reference rotation.py:169-177)."""
        assert rot.rot_type in ('quat', 'rmat')
        rot = rot.convert(self._rot_type)
        if self._rot_type == 'quat':
            new_rot = quaternion_multiply(rot.rot, self._rot)
        elif self._rot_type == 'rmat':
            new_rot = rot.rot @ self._rot
        else:
            raise NotImplementedError('apply_rotation on axis-angle')
        return self._wrap(new_rot, self._rot_type)

    # --- tensor-mirror API ---
    @property
    def shape(self):
        return self._rot.shape

    @property
    def dtype(self):
        return self._rot.dtype

    def astype(self, dtype):
        return self._wrap(self._rot.astype(dtype), self._rot_type)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return self._wrap(self._rot.reshape(shape), self._rot_type)

    def squeeze(self, axis=None):
        return self._wrap(jnp.squeeze(self._rot, axis), self._rot_type)

    def unsqueeze(self, axis):
        return self._wrap(jnp.expand_dims(self._rot, axis), self._rot_type)

    def __getitem__(self, key):
        return self._wrap(self._rot[key], self._rot_type)

    def __len__(self):
        return self._rot.shape[0]

    def detach(self):
        return self._wrap(jax.lax.stop_gradient(self._rot), self._rot_type)

    def clone(self):
        return self._wrap(self._rot, self._rot_type)

    @staticmethod
    def cat(rot_lst, axis=0):
        rot_type = rot_lst[0].rot_type
        assert all(r.rot_type == rot_type for r in rot_lst)
        return Rotation3D._wrap(
            jnp.concatenate([r.rot for r in rot_lst], axis=axis), rot_type)

    @staticmethod
    def stack(rot_lst, axis=0):
        rot_type = rot_lst[0].rot_type
        assert all(r.rot_type == rot_type for r in rot_lst)
        return Rotation3D._wrap(
            jnp.stack([r.rot for r in rot_lst], axis=axis), rot_type)

    def __repr__(self):
        return f'Rotation3D(rot_type={self._rot_type}, shape={self.shape})'
