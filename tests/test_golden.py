"""Golden parity: pin loss/metric outputs to values recorded from the
TORCH REFERENCE implementation (VERDICT r1 #8).

`tests/golden/reference_values.npz` was produced by running
/root/reference/multi_part_assembly/utils/{loss,eval_utils}.py on frozen
inputs (see tests/golden/make_golden.py).  These tests fail if any masked
semantics drift: the shape_cd train-divide-by-P vs eval-divide-by-p split
(ref loss.py:184-198), rot metric euler wraparound (eval_utils.py:186-199),
the q vs -q handling, per-contact connectivity averaging, etc.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multi_part_assembly_tpu.utils import (Rotation3D, calc_connectivity_acc,
                                           calc_part_acc, rot_cosine_loss,
                                           rot_l2_loss, rot_metrics,
                                           rot_points_cd_loss,
                                           rot_points_l2_loss,
                                           repulsion_cd_loss, shape_cd_loss,
                                           trans_l2_loss, trans_metrics)

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'golden',
                      'reference_values.npz')


@pytest.fixture(scope='module')
def g():
    data = dict(np.load(GOLDEN))
    data['r1'] = Rotation3D(jnp.asarray(data['quat1']), 'quat')
    data['r2'] = Rotation3D(jnp.asarray(data['quat2']), 'quat')
    for k in ('pts', 'trans1', 'trans2', 'valids', 'contact_points'):
        data[k + '_j'] = jnp.asarray(data[k])
    return data


def _check(ours, golden, atol=1e-4):
    np.testing.assert_allclose(np.asarray(ours), golden, atol=atol,
                               rtol=1e-4)


def test_trans_l2_golden(g):
    _check(trans_l2_loss(g['trans1_j'], g['trans2_j'], g['valids_j']),
           g['trans_l2_loss'])


def test_rot_l2_golden(g):
    _check(rot_l2_loss(g['r1'], g['r2'], g['valids_j']), g['rot_l2_loss'])


def test_rot_cosine_golden_quat_and_rmat(g):
    _check(rot_cosine_loss(g['r1'], g['r2'], g['valids_j']),
           g['rot_cosine_loss_quat'])
    _check(rot_cosine_loss(g['r1'].convert('rmat'), g['r2'].convert('rmat'),
                           g['valids_j']), g['rot_cosine_loss_rmat'],
           atol=1e-3)


def test_rot_points_losses_golden(g):
    _check(rot_points_l2_loss(g['pts_j'], g['r1'], g['r2'], g['valids_j']),
           g['rot_points_l2_loss'])
    _check(rot_points_cd_loss(g['pts_j'], g['r1'], g['r2'], g['valids_j']),
           g['rot_points_cd_loss'])


def test_shape_cd_train_eval_divide_golden(g):
    """The foot-gun called out in SURVEY §7: training divides by fixed P
    (hard-negative weighting), eval by the true part count."""
    train = shape_cd_loss(g['pts_j'], g['trans1_j'], g['trans2_j'],
                          g['r1'], g['r2'], g['valids_j'], training=True)
    ev = shape_cd_loss(g['pts_j'], g['trans1_j'], g['trans2_j'],
                       g['r1'], g['r2'], g['valids_j'], training=False)
    _check(train, g['shape_cd_loss_train'])
    _check(ev, g['shape_cd_loss_eval'])


def test_repulsion_cd_golden(g):
    _check(repulsion_cd_loss(g['pts_j'], g['valids_j'], thre=0.01),
           g['repulsion_cd_loss'], atol=1e-5)


def test_part_acc_golden(g):
    _check(calc_part_acc(g['pts_j'], g['trans1_j'], g['trans2_j'],
                         g['r1'], g['r2'], g['valids_j']), g['part_acc'])


@pytest.mark.parametrize('metric', ['mse', 'rmse', 'mae'])
def test_trans_metrics_golden(g, metric):
    _check(trans_metrics(g['trans1_j'], g['trans2_j'], g['valids_j'],
                         metric=metric), g[f'trans_{metric}'])


@pytest.mark.parametrize('metric', ['mse', 'rmse', 'mae'])
def test_rot_metrics_golden(g, metric):
    """Euler-degree metrics incl. the 360-wraparound (ref :186-199)."""
    _check(rot_metrics(g['r1'], g['r2'], g['valids_j'], metric=metric),
           g[f'rot_{metric}'], atol=0.05)  # euler conversion fp32 noise


def test_connectivity_acc_golden(g):
    _check(calc_connectivity_acc(g['trans1_j'], g['r1'],
                                 g['contact_points_j']),
           g['connectivity_acc'])


LR_CASES = {
    # mirrors make_golden.py LR_CASES (epoch-stepped reference scheduler)
    'lr_cos_plain': dict(first_cycle_steps=400, cycle_mult=1.0,
                         max_lr=1e-3, min_lr=1e-6, warmup_steps=20,
                         gamma=1.0),
    'lr_cos_restart': dict(first_cycle_steps=50, cycle_mult=1.0,
                           max_lr=1e-3, min_lr=1e-5, warmup_steps=5,
                           gamma=0.5),
    'lr_cos_geom': dict(first_cycle_steps=50, cycle_mult=2.0,
                        max_lr=1e-3, min_lr=1e-5, warmup_steps=5,
                        gamma=0.8),
}


@pytest.mark.parametrize('name', sorted(LR_CASES))
def test_cosine_lr_trajectory_golden(g, name):
    """Per-epoch LR trajectory vs the reference scheduler stepped once per
    epoch (base_model.py:404-424): warmup ramp, restart wrap, gamma decay
    of the cycle max, and cycle_mult geometric growth.  (The reference's
    LinearAnnealingWarmup is un-instantiable upstream -- lr.py:156-157
    calls super(CosineAnnealingWarmupRestarts, self) -- so only the cosine
    family has a recordable trajectory.)"""
    from multi_part_assembly_tpu.train.schedules import cosine_warmup_restarts
    ref = g[name]
    sched = cosine_warmup_restarts(**LR_CASES[name])
    ours = np.asarray([sched(e) for e in range(len(ref))])
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=1e-9)
