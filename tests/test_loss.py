"""Tests for the loss suite and eval metrics (golden semantics vs naive)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from multi_part_assembly_tpu.ops.chamfer import _pairwise_sqdist
from multi_part_assembly_tpu.utils import (Rotation3D, _valid_mean,
                                           calc_connectivity_acc,
                                           calc_part_acc, rot_cosine_loss,
                                           rot_l2_loss, rot_metrics,
                                           rot_points_cd_loss,
                                           rot_points_l2_loss, shape_cd_loss,
                                           trans_l2_loss, trans_metrics)


def _quats(rng, shape):
    q = rng.randn(*shape, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[..., 0] = np.abs(q[..., 0])
    return q


def _setup(rng, B=2, P=4, N=50):
    pts = jnp.asarray(rng.randn(B, P, N, 3), jnp.float32) * 0.3
    valids = np.ones((B, P), np.float32)
    valids[0, 2:] = 0.0
    q1 = Rotation3D(jnp.asarray(_quats(rng, (B, P))))
    q2 = Rotation3D(jnp.asarray(_quats(rng, (B, P))))
    t1 = jnp.asarray(rng.randn(B, P, 3), jnp.float32) * 0.2
    t2 = jnp.asarray(rng.randn(B, P, 3), jnp.float32) * 0.2
    return pts, jnp.asarray(valids), q1, q2, t1, t2


def test_valid_mean(rng):
    loss = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 6.0, 0.0]])
    valids = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0]])
    out = np.asarray(_valid_mean(loss, valids))
    np.testing.assert_allclose(out, [1.5, 5.0])


def test_trans_l2(rng):
    _, valids, _, _, t1, t2 = _setup(rng)
    out = np.asarray(trans_l2_loss(t1, t2, valids))
    per_part = np.sum((np.asarray(t1) - np.asarray(t2))**2, -1)
    v = np.asarray(valids)
    ref = (per_part * v).sum(1) / v.sum(1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_rot_l2_sign_invariance(rng):
    _, valids, q1, _, _, _ = _setup(rng)
    q_neg = Rotation3D(-q1.rot)
    out = np.asarray(rot_l2_loss(q1, q_neg, valids))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_rot_cosine_quat_vs_rmat_zero_for_same(rng):
    _, valids, q1, _, _, _ = _setup(rng)
    out_q = np.asarray(rot_cosine_loss(q1, q1, valids))
    np.testing.assert_allclose(out_q, 0.0, atol=1e-5)
    r1 = q1.convert('rmat')
    out_r = np.asarray(rot_cosine_loss(r1, r1, valids))
    np.testing.assert_allclose(out_r, 0.0, atol=1e-5)


def test_rot_points_l2_zero_for_same_rotation(rng):
    pts, valids, q1, _, _, _ = _setup(rng)
    out = np.asarray(rot_points_l2_loss(pts, q1, q1, valids))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
    # nonzero for different
    _, _, _, q2, _, _ = _setup(rng)
    out2 = np.asarray(rot_points_l2_loss(pts, q1, q2, valids))
    assert (out2 > 1e-4).all()


def test_rot_points_cd_rotation_invariant_vs_l2(rng):
    """CD loss must be <= L2 loss (CD relaxes correspondence)."""
    pts, valids, q1, q2, _, _ = _setup(rng)
    cd = np.asarray(rot_points_cd_loss(pts, q1, q2, valids))
    l2 = np.asarray(rot_points_l2_loss(pts, q1, q2, valids))
    assert (cd <= l2 + 1e-5).all()


def test_shape_cd_training_vs_eval_division(rng):
    pts, valids, q1, q2, t1, t2 = _setup(rng, B=2, P=4, N=32)
    tr = np.asarray(shape_cd_loss(pts, t1, t2, q1, q2, valids, training=True))
    ev = np.asarray(
        shape_cd_loss(pts, t1, t2, q1, q2, valids, training=False))
    # batch elem 0 has 2/4 valid parts: training divides by P*N, eval by p
    # => eval >= training for that element
    assert ev[0] > tr[0]

    # reference-semantics check: emulate the 1e3-padding path
    B, P, N, _ = pts.shape
    from multi_part_assembly_tpu.utils.transforms import transform_pc
    pts_pad = jnp.where(
        np.asarray(valids)[..., None, None] > 0, pts, 1e3)
    pts1 = transform_pc(t1, q1, pts_pad).reshape(B, P * N, 3)
    pts2 = transform_pc(t2, q2, pts_pad).reshape(B, P * N, 3)
    d = _pairwise_sqdist(pts1, pts2)
    d1, d2 = jnp.min(d, 2), jnp.min(d, 1)
    pv = jnp.repeat(valids, N, axis=1)
    ref_tr = np.asarray(
        jnp.mean(d1 * pv, 1) + jnp.mean(d2 * pv, 1))
    np.testing.assert_allclose(tr, ref_tr, rtol=1e-4, atol=1e-6)


def test_shape_cd_zero_for_identical(rng):
    pts, valids, q1, _, t1, _ = _setup(rng)
    out = np.asarray(shape_cd_loss(pts, t1, t1, q1, q1, valids))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_part_acc_perfect_and_shifted(rng):
    pts, valids, q1, _, t1, _ = _setup(rng)
    acc = np.asarray(calc_part_acc(pts, t1, t1, q1, q1, valids))
    np.testing.assert_allclose(acc, 1.0)
    t_shift = t1 + 10.0
    acc0 = np.asarray(calc_part_acc(pts, t1, t_shift, q1, q1, valids))
    np.testing.assert_allclose(acc0, 0.0)


def test_trans_metrics(rng):
    _, valids, _, _, t1, t2 = _setup(rng)
    for metric in ['mse', 'rmse', 'mae']:
        out = np.asarray(trans_metrics(t1, t2, valids, metric))
        d = np.asarray(t1) - np.asarray(t2)
        if metric == 'mse':
            pp = (d**2).mean(-1)
        elif metric == 'rmse':
            pp = np.sqrt((d**2).mean(-1))
        else:
            pp = np.abs(d).mean(-1)
        v = np.asarray(valids)
        np.testing.assert_allclose(out, (pp * v).sum(1) / v.sum(1), rtol=1e-5)


def test_rot_metrics_zero_and_wraparound(rng):
    _, valids, q1, _, _, _ = _setup(rng)
    out = np.asarray(rot_metrics(q1, q1, valids, 'mae'))
    np.testing.assert_allclose(out, 0.0, atol=1e-3)
    # wraparound: euler +179 vs -179 should be 2 degrees apart, not 358
    e1 = np.zeros((1, 1, 3), np.float32)
    e1[..., 2] = np.deg2rad(179.0)
    e2 = np.zeros((1, 1, 3), np.float32)
    e2[..., 2] = np.deg2rad(-179.0)
    qa = np.atleast_2d(R.from_euler('z', 179, degrees=True).as_quat())
    qb = np.atleast_2d(R.from_euler('z', -179, degrees=True).as_quat())
    qa = np.concatenate([qa[:, 3:], qa[:, :3]], -1)[None].astype(np.float32)
    qb = np.concatenate([qb[:, 3:], qb[:, :3]], -1)[None].astype(np.float32)
    out = np.asarray(
        rot_metrics(Rotation3D(jnp.asarray(qa)), Rotation3D(jnp.asarray(qb)),
                    jnp.ones((1, 1)), 'mae'))
    assert out[0] < 3.0


def test_connectivity_acc(rng):
    B, P = 2, 3
    # identity poses, contacts at shared points -> all correct
    trans = jnp.zeros((B, P, 3))
    rot = Rotation3D(
        jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, P, 4)))
    cp = np.zeros((B, P, P, 4), np.float32)
    pt = rng.randn(3).astype(np.float32)
    cp[:, 0, 1, 0] = 1
    cp[:, 0, 1, 1:] = pt
    cp[:, 1, 0, 0] = 1
    cp[:, 1, 0, 1:] = pt
    acc = np.asarray(calc_connectivity_acc(trans, rot, jnp.asarray(cp)))
    np.testing.assert_allclose(acc, 1.0)
    # move part 1 far away -> contact broken
    trans2 = jnp.zeros((B, P, 3)).at[:, 1].set(5.0)
    acc2 = np.asarray(calc_connectivity_acc(trans2, rot, jnp.asarray(cp)))
    np.testing.assert_allclose(acc2, 0.0)


def test_losses_vmappable_over_samples(rng):
    """MoN: losses must vmap over a leading sample axis."""
    pts, valids, q1, q2, t1, t2 = _setup(rng, B=2, P=3, N=16)
    S = 3
    t1s = jnp.stack([t1 + 0.01 * i for i in range(S)])
    q1s = Rotation3D(jnp.stack([q1.rot] * S))

    def loss_fn(t, q):
        rot = Rotation3D(q)
        return shape_cd_loss(pts, t, t2, rot, q2, valids, training=True)

    out = jax.vmap(loss_fn)(t1s, q1s.rot)
    assert out.shape == (S, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_repulsion_chunked_matches_dense(rng):
    """The scan-over-parts path (engaged past the dense memory cutoff)
    computes the identical repulsion loss as the one-call dense path."""
    from multi_part_assembly_tpu.utils.loss import repulsion_cd_loss
    pts, valids, *_ = _setup(rng, B=2, P=4, N=24)
    dense = np.asarray(repulsion_cd_loss(pts, valids, thre=0.05))
    chunked = np.asarray(
        repulsion_cd_loss(pts, valids, thre=0.05, dense_limit=0))
    np.testing.assert_allclose(chunked, dense, rtol=1e-5, atol=1e-6)
