"""Loss engine: reference BaseModel semantics as pure functions.

Replaces the reference's LightningModule plumbing
(multi_part_assembly/models/modules/base_model.py) with a functional core:

  - `calc_loss`: matching + loss suite + eval metrics for ONE prediction
    (reference `_calc_loss`, base_model.py:240-314)
  - `mon_loss`: precompute-once, vmap `sample` over `sample_iter` RNG keys,
    per-element argmin selection (reference `loss_function`,
    base_model.py:348-387 -- but the samples run in parallel on device
    instead of a sequential Python loop)

Everything here is jit/grad/vmap-safe and runs inside the single compiled
train step.
"""

import jax
import jax.numpy as jnp

from ..ops.matching import match_parts
from ..utils.eval_utils import (calc_connectivity_acc, calc_part_acc,
                                rot_metrics, trans_metrics)
from ..utils.loss import (rot_cosine_loss, rot_points_cd_loss,
                          rot_points_l2_loss, shape_cd_loss, trans_l2_loss)
from ..utils.rotation import Rotation3D

__all__ = ['calc_loss', 'loss_one_sample', 'mon_loss', 'loss_weights_from_cfg']


def loss_weights_from_cfg(cfg_loss):
    """Static dict of loss-name -> weight (reference base_model.py:365-372
    fetches `cfg.loss.{k}_w` by name)."""
    weights = {
        'trans_loss': cfg_loss.trans_loss_w,
        'rot_pt_cd_loss': cfg_loss.rot_pt_cd_loss_w,
        'transform_pt_cd_loss': cfg_loss.transform_pt_cd_loss_w,
    }
    if cfg_loss.get('use_rot_loss', False):
        weights['rot_loss'] = cfg_loss.rot_loss_w
    if cfg_loss.get('use_rot_pt_l2_loss', False):
        weights['rot_pt_l2_loss'] = cfg_loss.rot_pt_l2_loss_w
    return weights


def calc_loss(pred_rot_raw, pred_trans, data_dict, *, rot_type, semantic,
              training, use_rot_loss, use_rot_pt_l2_loss, match_key=None,
              with_metrics=False):
    """Losses (+ optional eval metrics) for a single prediction.

    Mirrors reference `_calc_loss` (base_model.py:240-314): semantic
    assembly first Hungarian-matches GT to predictions; then
    trans-l2 / rot-point-CD / shape-CD always, cosine & rot-point-l2
    per config; metrics only at eval.

    Args:
        pred_rot_raw: [B, P, 4] quat or [B, P, 6] 6d
        pred_trans: [B, P, 3]
        data_dict: batch with part_pcs/part_valids/part_trans/part_rot_raw
            (GT rotation already converted to `rot_type` raw form)

    Returns:
        dict of [B] tensors
    """
    part_pcs = data_dict['part_pcs']
    valids = data_dict['part_valids']
    gt_trans = data_dict['part_trans']
    gt_rot_raw = data_dict['part_rot_raw']

    pred_rot = Rotation3D(pred_rot_raw, rot_type)  # normalizes 6d -> rmat

    if semantic:
        new_trans, new_rot_raw = match_parts(
            part_pcs, pred_trans, pred_rot.rot, gt_trans, gt_rot_raw,
            data_dict['match_ids'], match_key, rot_type)
    else:
        new_trans = jax.lax.stop_gradient(gt_trans)
        new_rot_raw = jax.lax.stop_gradient(gt_rot_raw)
    new_rot = Rotation3D(new_rot_raw, rot_type)

    loss_dict = {
        'trans_loss': trans_l2_loss(pred_trans, new_trans, valids),
        'rot_pt_cd_loss': rot_points_cd_loss(part_pcs, pred_rot, new_rot,
                                             valids),
        'transform_pt_cd_loss': shape_cd_loss(
            part_pcs, pred_trans, new_trans, pred_rot, new_rot, valids,
            # semantic always divides by the padded P; geometric divides by
            # the true part count at eval (base_model.py:272-284)
            training=semantic or training),
    }
    if use_rot_loss:
        loss_dict['rot_loss'] = rot_cosine_loss(pred_rot, new_rot, valids)
    if use_rot_pt_l2_loss:
        loss_dict['rot_pt_l2_loss'] = rot_points_l2_loss(
            part_pcs, pred_rot, new_rot, valids)

    if with_metrics:  # eval only (base_model.py:316-339)
        loss_dict['part_acc'] = calc_part_acc(part_pcs, pred_trans, new_trans,
                                              pred_rot, new_rot, valids)
        if semantic and 'contact_points' in data_dict:
            loss_dict['connectivity_acc'] = calc_connectivity_acc(
                pred_trans, pred_rot, data_dict['contact_points'])
        if not semantic:
            for metric in ('mse', 'rmse', 'mae'):
                loss_dict[f'trans_{metric}'] = trans_metrics(
                    pred_trans, new_trans, valids, metric)
                loss_dict[f'rot_{metric}'] = rot_metrics(
                    pred_rot, new_rot, valids, metric)
    return loss_dict


def loss_one_sample(pred, data_dict, *, rot_type, semantic, training,
                    use_rot_loss, use_rot_pt_l2_loss, match_key,
                    with_metrics):
    """Handle single-step and all-steps-supervised predictions.

    Multi-step models (DGL/RGL/Refine) emit [T, B, P, ...] in training;
    losses sum over steps with per-step aux entries `{k}_{i}` (reference
    dgl/network.py:284-293 -- the `_{i}` suffix keeps them out of the
    weighted total).
    """
    kw = dict(rot_type=rot_type, semantic=semantic, training=training,
              use_rot_loss=use_rot_loss, use_rot_pt_l2_loss=use_rot_pt_l2_loss,
              with_metrics=with_metrics)
    rot, trans = pred['rot'], pred['trans']
    multi_step = trans.ndim == 4
    if not multi_step:
        return calc_loss(rot, trans, data_dict, match_key=match_key, **kw)

    T = trans.shape[0]
    keys = jax.random.split(match_key, T) if match_key is not None else \
        [None] * T
    all_loss = None
    for i in range(T):
        ld = calc_loss(rot[i], trans[i], data_dict, match_key=keys[i], **kw)
        if all_loss is None:
            all_loss = {k: 0.0 for k in ld}
        for k, v in ld.items():
            all_loss[k] = all_loss[k] + v
            all_loss[f'{k}_{i}'] = v
    return all_loss


def mon_loss(model, params, batch_stats, data_dict, rng, *, cfg, training,
             reduce=True):
    """Minimum-over-N loss (reference base_model.py:348-387), vmapped.

    Returns (scalar total loss, dict of logs, new batch_stats).  With
    reduce=False the logs are per-element [B] vectors (used by eval so
    host-side padding rows can be sliced off before averaging).
    """
    semantic = cfg.data.dataset != 'geometry'
    sample_iter = cfg.loss.get('sample_iter', 1)
    rot_type = cfg.model.rot_type
    weights = loss_weights_from_cfg(cfg.loss)
    use_rot_loss = cfg.loss.get('use_rot_loss', False)
    use_rot_pt_l2 = cfg.loss.get('use_rot_pt_l2_loss', False)

    # GT rotation in the model's rot_type (reference base_model.py:129-132)
    gt_rot = Rotation3D(data_dict['part_quat'], 'quat').convert(rot_type)
    data_dict = dict(data_dict)
    data_dict['part_rot_raw'] = gt_rot.rot

    variables = {'params': params, 'batch_stats': batch_stats}
    pre_key, key = jax.random.split(rng)

    feats, mut = model.apply(
        variables, data_dict, train=training, method='precompute',
        mutable=['batch_stats'], rngs={'dropout': pre_key})
    stats_pre = mut.get('batch_stats', batch_stats)
    var_sample = {'params': params, 'batch_stats': stats_pre}

    def one_sample(k):
        nkey, dkey, mkey = jax.random.split(k, 3)
        pred, smut = model.apply(
            var_sample, feats, data_dict, train=training, method='sample',
            mutable=['batch_stats'], rngs={'noise': nkey, 'dropout': dkey})
        ld = loss_one_sample(
            pred, data_dict, rot_type=rot_type, semantic=semantic,
            training=training, use_rot_loss=use_rot_loss,
            use_rot_pt_l2_loss=use_rot_pt_l2, match_key=mkey,
            with_metrics=not training)
        return ld, smut.get('batch_stats', stats_pre)

    keys = jax.random.split(key, sample_iter)
    loss_dicts, sample_stats = jax.vmap(one_sample)(keys)  # each [S, B]

    total = sum(loss_dicts[k] * w for k, w in weights.items())  # [S, B]
    loss_dicts['loss'] = total

    # per-element argmin over samples (base_model.py:374-381)
    min_idx = jnp.argmin(total, axis=0)  # [B]
    B = min_idx.shape[0]

    def sel(v):
        picked = v[min_idx, jnp.arange(B)]
        return picked.mean() if reduce else picked

    log_dict = {k: sel(v) for k, v in loss_dicts.items()}

    # one combined batch-stats update per step (samples ran in parallel)
    if training:
        new_stats = jax.tree_util.tree_map(lambda s: s.mean(0), sample_stats)
    else:
        new_stats = batch_stats
    loss = log_dict['loss'] if reduce else log_dict['loss'].mean()
    return loss, log_dict, new_stats
