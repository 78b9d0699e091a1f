"""Tests for pose/point-cloud transforms."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from multi_part_assembly_tpu.utils import (Rotation3D, qrot, qtransform,
                                           qtransform_invert, rmat_rot,
                                           rmat_transform, rot_pc,
                                           transform_pc, trans_quat_to_pmat)


def _wxyz(rng, n):
    q = R.random(n, random_state=rng).as_quat()
    return np.concatenate([q[:, 3:], q[:, :3]], axis=-1).astype(np.float32)


def test_qrot_broadcast_pointcloud(rng):
    B, P, N = 2, 3, 50
    q = _wxyz(rng, B * P).reshape(B, P, 4)
    v = rng.randn(B, P, N, 3).astype(np.float32)
    out = np.asarray(qrot(jnp.asarray(q), jnp.asarray(v)))
    for b in range(B):
        for p in range(P):
            rq = np.concatenate([q[b, p, 1:], q[b, p, :1]])
            ref = R.from_quat(rq).apply(v[b, p])
            np.testing.assert_allclose(out[b, p], ref, atol=1e-5)


def test_qtransform_invert_roundtrip(rng):
    B, N = 4, 100
    q = jnp.asarray(_wxyz(rng, B))
    t = jnp.asarray(rng.randn(B, 3), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    tqv = qtransform(t, q, v)
    back = qtransform_invert(t, q, tqv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_rmat_matches_quat_path(rng):
    B, P, N = 2, 5, 20
    q = _wxyz(rng, B * P).reshape(B, P, 4)
    t = rng.randn(B, P, 3).astype(np.float32)
    v = rng.randn(B, P, N, 3).astype(np.float32)
    rot = Rotation3D(jnp.asarray(q))
    out_q = transform_pc(jnp.asarray(t), rot, jnp.asarray(v))
    out_m = transform_pc(jnp.asarray(t), rot.convert('rmat'), jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_m), atol=1e-5)


def test_rot_pc_tensor_dispatch(rng):
    q = jnp.asarray(_wxyz(rng, 4))
    v = jnp.asarray(rng.randn(4, 10, 3), jnp.float32)
    out1 = rot_pc(Rotation3D(q), v)
    out2 = rot_pc(q, v, rot_type='quat')
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_transform_pc_jit_grad(rng):
    q = jnp.asarray(_wxyz(rng, 3))
    t = jnp.asarray(rng.randn(3, 3), jnp.float32)
    v = jnp.asarray(rng.randn(3, 8, 3), jnp.float32)

    def loss(t, q, v):
        return jnp.sum(qtransform(t, q, v)**2)

    g = jax.jit(jax.grad(loss))(t, q, v)
    assert g.shape == t.shape
    assert np.isfinite(np.asarray(g)).all()


def test_pmat_consistency(rng):
    q = _wxyz(rng, 1)[0]
    t = rng.randn(3).astype(np.float32)
    pmat = trans_quat_to_pmat(t, q)
    v = rng.randn(10, 3).astype(np.float32)
    hom = np.concatenate([v, np.ones((10, 1))], -1)
    ref = (pmat @ hom.T).T[:, :3]
    out = np.asarray(
        qtransform(jnp.asarray(t), jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_rmat_rot_broadcast(rng):
    m = R.random(6, random_state=rng).as_matrix().astype(np.float32)
    m = m.reshape(2, 3, 3, 3)
    v = rng.randn(2, 3, 7, 3).astype(np.float32)
    out = np.asarray(rmat_rot(jnp.asarray(m), jnp.asarray(v)))
    ref = np.einsum('bpij,bpnj->bpni', m, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    t = rng.randn(2, 3, 3).astype(np.float32)
    out2 = np.asarray(
        rmat_transform(jnp.asarray(t), jnp.asarray(m), jnp.asarray(v)))
    np.testing.assert_allclose(out2, ref + t[:, :, None], atol=1e-5)
