"""Golden tests for rotation conversions against scipy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from multi_part_assembly_tpu.utils import (Rotation3D, matrix_to_quaternion,
                                           qeuler, quaternion_apply,
                                           quaternion_multiply,
                                           quaternion_to_axis_angle,
                                           quaternion_to_matrix,
                                           random_quaternions,
                                           rot6d_to_matrix)


def _scipy_quats(rng, n):
    """Random unit quats, returned w-first."""
    q = R.random(n, random_state=rng).as_quat()  # xyzw
    return np.concatenate([q[:, 3:], q[:, :3]], axis=-1)  # wxyz


def test_quaternion_to_matrix_vs_scipy(rng):
    q = _scipy_quats(rng, 64)
    ours = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    ref = R.from_quat(np.concatenate([q[:, 1:], q[:, :1]], -1)).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_quaternion_roundtrip(rng):
    q = _scipy_quats(rng, 128)
    m = quaternion_to_matrix(jnp.asarray(q, jnp.float32))
    q2 = np.asarray(matrix_to_quaternion(m))
    # q == -q; compare up to sign
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    q = _scipy_quats(rng, 64)
    aa = quaternion_to_axis_angle(jnp.asarray(q, jnp.float32))
    ref_aa = R.from_quat(np.concatenate([q[:, 1:], q[:, :1]], -1)).as_rotvec()
    # axis-angle is unique up to 2pi; scipy returns angle in [0, pi]
    ours = np.asarray(aa)
    norm_ours = np.linalg.norm(ours, axis=-1, keepdims=True)
    norm_ref = np.linalg.norm(ref_aa, axis=-1, keepdims=True)
    # wrap ours into [0, pi] representation for comparison
    wrapped = np.where(norm_ours > np.pi,
                       ours * (1 - 2 * np.pi / np.maximum(norm_ours, 1e-9)),
                       ours)
    np.testing.assert_allclose(wrapped, ref_aa, atol=1e-4)
    del norm_ref


def test_quaternion_apply_vs_scipy(rng):
    q = _scipy_quats(rng, 32).astype(np.float32)
    v = rng.randn(32, 3).astype(np.float32)
    ours = np.asarray(quaternion_apply(jnp.asarray(q), jnp.asarray(v)))
    ref = R.from_quat(np.concatenate([q[:, 1:], q[:, :1]], -1)).apply(v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quaternion_multiply_vs_scipy(rng):
    qa = _scipy_quats(rng, 16)
    qb = _scipy_quats(rng, 16)
    ours = np.asarray(
        quaternion_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    ra = R.from_quat(np.concatenate([qa[:, 1:], qa[:, :1]], -1))
    rb = R.from_quat(np.concatenate([qb[:, 1:], qb[:, :1]], -1))
    ref = (ra * rb).as_quat()
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], -1)
    dots = np.abs(np.sum(ours * ref, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_rot6d_to_matrix_orthogonal(rng):
    d6 = rng.randn(40, 6).astype(np.float32)
    m = np.asarray(rot6d_to_matrix(jnp.asarray(d6)))
    eye = np.einsum('bij,bkj->bik', m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (40, 1, 1)), atol=1e-5)
    det = np.linalg.det(m)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


@pytest.mark.parametrize('order', ['xyz', 'yzx', 'zxy', 'xzy', 'yxz', 'zyx'])
def test_qeuler_vs_scipy(rng, order):
    q = _scipy_quats(rng, 64)
    ours = np.asarray(qeuler(jnp.asarray(q), order=order, to_degree=True))
    r = R.from_quat(np.concatenate([q[:, 1:], q[:, :1]], -1))
    # qeuler(q, order) == scipy intrinsic `order.upper()`, with the three
    # returned angles always stacked as (x, y, z) (reference rotation.py:86).
    euler = r.as_euler(order.upper(), degrees=True)
    perm = [order.index(ax) for ax in 'xyz']
    ref = euler[:, perm]
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_rotation3d_pytree_roundtrip(rng):
    q = jnp.asarray(_scipy_quats(rng, 8), jnp.float32)
    rot = Rotation3D(q, 'quat')
    leaves, treedef = jax.tree_util.tree_flatten(rot)
    rot2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rot2.rot_type == 'quat'
    np.testing.assert_array_equal(np.asarray(rot2.rot), np.asarray(q))

    # works under jit
    @jax.jit
    def f(r):
        return r.convert('rmat').rot

    m = f(rot)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(quaternion_to_matrix(q)), atol=1e-6)


def test_rotation3d_zero_quat_padding():
    q = jnp.zeros((4, 4))
    rot = Rotation3D(q, 'quat')
    np.testing.assert_allclose(
        np.asarray(rot.rot), np.tile([1., 0., 0., 0.], (4, 1)))


def test_rotation3d_convert_cycle(rng):
    q = jnp.asarray(_scipy_quats(rng, 10), jnp.float32)
    rot = Rotation3D(q, 'quat')
    back = rot.convert('rmat').convert('axis').convert('quat').rot
    dots = np.abs(np.sum(np.asarray(back) * np.asarray(q), -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_rotation3d_6d_input(rng):
    d6 = jnp.asarray(rng.randn(5, 6), jnp.float32)
    rot = Rotation3D(d6, 'rmat')
    assert rot.rot.shape == (5, 3, 3)
    rot2 = Rotation3D(d6.reshape(5, 2, 3), 'rmat')
    np.testing.assert_allclose(
        np.asarray(rot.rot), np.asarray(rot2.rot), atol=1e-6)


def test_rotation3d_apply_rotation(rng):
    qa = jnp.asarray(_scipy_quats(rng, 6), jnp.float32)
    qb = jnp.asarray(_scipy_quats(rng, 6), jnp.float32)
    ra, rb = Rotation3D(qa), Rotation3D(qb)
    composed = rb.apply_rotation(ra)  # ra applied on top of rb
    v = jnp.asarray(rng.randn(6, 3), jnp.float32)
    out1 = quaternion_apply(composed.rot, v)
    out2 = quaternion_apply(qa, quaternion_apply(qb, v))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_random_quaternions_uniform():
    key = jax.random.PRNGKey(0)
    q = random_quaternions(key, (2048, ))
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert (np.asarray(q)[:, 0] >= 0).all()
    # rough uniformity check: mean rotation angle of uniform SO(3) ~ 126.47 deg
    angles = 2 * np.degrees(np.arccos(np.clip(np.asarray(q)[:, 0], -1, 1)))
    assert 115 < angles.mean() < 140
