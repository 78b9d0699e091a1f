"""End-to-end train/eval step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_part_assembly_tpu.models import build_model
from multi_part_assembly_tpu.parallel import (make_eval_step, make_mesh,
                                              make_train_step, shard_batch)
from multi_part_assembly_tpu.train import (create_train_state,
                                           cosine_warmup_restarts, mon_loss)
from multi_part_assembly_tpu.utils import CN


def _make_cfg(model_name='pn_transformer', dataset='geometry',
              sample_iter=1, noise_dim=0, P=4):
    cfg = CN()
    cfg.exp = CN({'batch_size': 8, 'num_epochs': 10, 'val_every': 1})
    cfg.data = CN({
        'dataset': dataset, 'max_num_part': P, 'num_pc_points': 32,
        'data_keys': ('part_ids', ),
    })
    cfg.optimizer = CN({
        'lr': 1e-3, 'weight_decay': 0., 'warmup_ratio': 0.05,
        'clip_grad': None, 'lr_scheduler': 'cosine', 'lr_decay_factor': 100.,
    })
    cfg.model = CN({
        'name': model_name, 'rot_type': 'quat', 'pc_feat_dim': 32,
        'encoder': 'pointnet', 'transformer_feat_dim': 64,
        'transformer_heads': 4, 'transformer_layers': 1,
        'transformer_pre_ln': True, 'gnn_iter': 2, 'merge_node': True,
        'lstm_hidden_size': 32, 'transformer_pos_enc': (32, 32),
        'pose_pc_feat': True, 'refine_steps': 2,
    })
    cfg.loss = CN({
        'noise_dim': noise_dim, 'sample_iter': sample_iter,
        'trans_loss_w': 1., 'rot_pt_cd_loss_w': 10.,
        'transform_pt_cd_loss_w': 10., 'use_rot_loss': True,
        'rot_loss_w': 0.2, 'use_rot_pt_l2_loss': True,
        'rot_pt_l2_loss_w': 1.,
    })
    return cfg


def _fake_batch(rng, B=8, P=4, N=32, semantic=False):
    nparts = rng.randint(2, P + 1, B)
    valids = (np.arange(P)[None] < nparts[:, None]).astype(np.float32)
    q = rng.randn(B, P, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = q * valids[..., None]  # padded -> zero quat (fixed by Rotation3D)
    batch = {
        'part_pcs': (rng.randn(B, P, N, 3) * 0.3).astype(np.float32),
        'part_quat': q.astype(np.float32),
        'part_trans': (rng.randn(B, P, 3) * 0.1).astype(np.float32),
        'part_valids': valids,
        'part_label': np.zeros((B, P, 0), np.float32),
        'instance_label': np.zeros((B, P, P if semantic else 0), np.float32),
        'part_ids': rng.randint(0, 3, (B, P)).astype(np.int32),
        'valid_matrix': (valids[:, :, None] * valids[:, None, :]),
    }
    if semantic:
        mi = np.zeros((B, P), np.int32)
        mi[:, 0] = 1
        mi[:, 1] = 1  # parts 0, 1 equivalent
        batch['match_ids'] = mi
        batch['contact_points'] = np.zeros((B, P, P, 4), np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize('model_name,sample_iter,semantic', [
    ('pn_transformer', 1, False),
    ('global', 3, True),
    ('dgl', 2, True),
])
def test_train_step_on_mesh(rng, model_name, sample_iter, semantic):
    dataset = 'partnet' if semantic else 'geometry'
    cfg = _make_cfg(model_name, dataset, sample_iter,
                    noise_dim=8 if sample_iter > 1 else 0)
    model = build_model(cfg)
    batch = _fake_batch(rng, semantic=semantic)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    state, tx, _ = create_train_state(
        model, cfg, batch, jax.random.PRNGKey(0), steps_per_epoch=2)
    train_step = make_train_step(model, tx, cfg, mesh, donate=False)
    sharded = shard_batch(batch, mesh)

    state1, logs = train_step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs['loss']))
    assert int(state1.step) == 1
    # params changed
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(state1.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))

    eval_step = make_eval_step(model, cfg, mesh)
    eval_logs = eval_step(state1, sharded, jax.random.PRNGKey(2))
    assert 'part_acc' in eval_logs
    if semantic:
        assert 'connectivity_acc' in eval_logs
    else:
        assert 'rot_rmse' in eval_logs and 'trans_mae' in eval_logs
    for k, v in eval_logs.items():
        assert np.asarray(v).shape == (8, ), k  # per-element vectors
        assert np.isfinite(np.asarray(v)).all(), k


def test_dp_step_matches_single_device(rng):
    """Data parallelism is semantically invisible: loss, gradients and
    sync-BN statistics over the 8-device mesh equal the same global batch
    on a 1-device mesh (the XLA partitioner's cross-device mean must equal
    the serial reduction).

    Gradients are compared in EVAL mode (tight, ~1e-6): train-mode BN
    batch statistics route gradients through sums of ~1e5 cancelling
    terms, whose serial-vs-tree f32 reduction order alone shifts elements
    by ~1e-3 (verified on a minimal Dense+BN repro) -- ill-conditioned,
    not a partitioning property.  Train mode is covered by the tight loss
    and BN-statistics comparisons.  Runs under f32 compute; bf16 adds
    one-ULP noise on ~36% of elements."""
    from multi_part_assembly_tpu.utils.precision import set_compute_dtype
    cfg = _make_cfg('pn_transformer')
    batch = _fake_batch(rng)
    model = build_model(cfg)
    set_compute_dtype(jnp.float32)
    try:
        results = []
        for devs in (jax.devices()[:1], jax.devices()):
            mesh = make_mesh(devices=devs, batch_size=8)
            db = shard_batch(batch, mesh)
            state, tx, _ = create_train_state(
                model, cfg, db, jax.random.PRNGKey(0), steps_per_epoch=10)

            def eval_loss(params, db):
                loss, _, _ = mon_loss(
                    model, params, state.batch_stats, db,
                    jax.random.PRNGKey(1), cfg=cfg, training=False)
                return loss

            grads = jax.jit(jax.grad(eval_loss))(state.params, db)

            def train_loss(params, db):
                return mon_loss(model, params, state.batch_stats, db,
                                jax.random.PRNGKey(1), cfg=cfg,
                                training=True)

            tloss, _, new_stats = jax.jit(train_loss)(state.params, db)
            results.append((float(tloss), jax.device_get(grads),
                            jax.device_get(new_stats)))
    finally:
        set_compute_dtype(jnp.bfloat16)  # restore the session default

    (l1, g1, s1), (l8, g8, s8) = results
    # partitioned global-mean train loss == serial one
    assert abs(l1 - l8) < 1e-5 * max(1.0, abs(l1))
    # eval-mode gradients: tight elementwise equality
    gscale = max(float(np.abs(np.asarray(x)).max())
                 for x in jax.tree_util.tree_leaves(g1))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5 * gscale)
    # sync-BN batch statistics (means/vars over the global batch): tight
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_training_reduces_loss_overfit(rng):
    """Mini overfit smoke (reference's cfg.data.overfit knob analogue)."""
    cfg = _make_cfg('global', 'geometry', sample_iter=1, noise_dim=0)
    cfg.optimizer.lr = 1e-3
    model = build_model(cfg)
    batch = _fake_batch(rng, B=8)
    state, tx, _ = create_train_state(
        model, cfg, batch, jax.random.PRNGKey(0), steps_per_epoch=100)
    train_step = make_train_step(model, tx, cfg, mesh=None, donate=False)
    losses = []
    for i in range(30):
        state, logs = train_step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(logs['loss']))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_mon_selects_min_sample(rng):
    """With stochastic sampling, MoN loss <= mean single-sample loss."""
    cfg1 = _make_cfg('global', 'geometry', sample_iter=1, noise_dim=16)
    cfg5 = _make_cfg('global', 'geometry', sample_iter=5, noise_dim=16)
    model = build_model(cfg1)
    batch = _fake_batch(rng, B=8)
    state, _, _ = create_train_state(
        model, cfg1, batch, jax.random.PRNGKey(0))

    def loss_of(cfg, key):
        loss, _, _ = mon_loss(model, state.params, state.batch_stats, batch,
                              key, cfg=cfg, training=True)
        return float(loss)

    l1 = np.mean([loss_of(cfg1, jax.random.PRNGKey(i)) for i in range(5)])
    l5 = loss_of(cfg5, jax.random.PRNGKey(0))
    assert l5 <= l1 + 1e-4


def test_multi_step_matches_sequential(rng):
    """`make_train_step_multi` (G steps in one lax.scan'd executable) is
    semantically identical to G sequential stacked-step calls with the
    same epoch rng: the body folds in state.step, which advances through
    the scan carry exactly as across separate dispatches.  Covers the
    in-scan device augmentation path (batches carry part_pcs_raw)."""
    from multi_part_assembly_tpu.parallel.mesh import (
        make_train_step_multi, make_train_step_stacked)
    cfg = _make_cfg('pn_transformer')
    model = build_model(cfg)
    G = 3
    raws = []
    for _ in range(G):
        b = _fake_batch(rng)
        raw = {k: v for k, v in b.items()
               if k not in ('part_pcs', 'part_quat', 'part_trans')}
        raw['part_pcs_raw'] = jnp.asarray(
            (rng.randn(8, 4, 32, 3) * 0.3).astype(np.float32))
        raws.append(raw)
    state0, tx, _ = create_train_state(
        model, cfg, _fake_batch(rng), jax.random.PRNGKey(0),
        steps_per_epoch=10)
    epoch_rng = jax.random.PRNGKey(7)

    step1, keys1 = make_train_step_stacked(model, tx, cfg, mesh=None,
                                           donate=False)
    st = state0
    seq = []
    for b in raws:
        st, v = step1(st, b, epoch_rng)
        seq.append(np.asarray(v))

    stepG, keysG = make_train_step_multi(model, tx, cfg, mesh=None,
                                         donate=False)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *raws)
    stG, logsG = stepG(state0, stacked, epoch_rng)

    assert keys1 == keysG
    assert int(stG.step) == G
    np.testing.assert_allclose(np.asarray(logsG), np.stack(seq),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(stG.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_expand_geometry_batch_multi_matches_per_batch(rng):
    """The grouped [G, Kpad, N, 3] expand equals G per-batch expands."""
    from multi_part_assembly_tpu.datasets.geometry import (
        expand_geometry_batch, expand_geometry_batch_multi)
    G, B, P, N = 2, 4, 4, 16
    packed = (rng.randn(G, B * P, N, 3) * 0.3).astype(np.float16)
    counts = rng.randint(1, P + 1, (G, B)).astype(np.int32)
    multi = expand_geometry_batch_multi(
        jnp.asarray(packed), jnp.asarray(counts), max_parts=P,
        data_keys=('part_ids', ))
    for g in range(G):
        one = expand_geometry_batch(
            jnp.asarray(packed[g]), jnp.asarray(counts[g]), max_parts=P,
            data_keys=('part_ids', ))
        assert set(one) == set(multi)
        for k in one:
            np.testing.assert_array_equal(np.asarray(multi[k][g]),
                                          np.asarray(one[k]), err_msg=k)


def test_cosine_schedule_shape():
    sched = cosine_warmup_restarts(1.0, 0.01, first_cycle_steps=100,
                                   warmup_steps=10)
    vals = [float(sched(s)) for s in [0, 5, 10, 50, 99, 100, 105]]
    assert vals[0] < vals[1] < vals[2]  # warmup rising
    assert abs(vals[2] - 1.0) < 1e-5  # peak at end of warmup
    assert vals[3] < vals[2] and vals[4] < vals[3]  # cosine falling
    assert vals[5] < 0.2  # restart begins at min
    assert vals[6] > vals[5]  # rising again


def test_eval_deterministic_across_mon_keys(rng):
    """noise_dim=0 models: MoN samples identical -> loss equals 1-sample."""
    cfg1 = _make_cfg('pn_transformer', 'geometry', 1, noise_dim=0)
    cfg3 = _make_cfg('pn_transformer', 'geometry', 3, noise_dim=0)
    model = build_model(cfg1)
    batch = _fake_batch(rng)
    state, _, _ = create_train_state(model, cfg1, batch,
                                     jax.random.PRNGKey(0))
    _, logs1, _ = mon_loss(model, state.params, state.batch_stats, batch,
                           jax.random.PRNGKey(5), cfg=cfg1, training=False)
    _, logs3, _ = mon_loss(model, state.params, state.batch_stats, batch,
                           jax.random.PRNGKey(5), cfg=cfg3, training=False)
    np.testing.assert_allclose(float(logs1['loss']), float(logs3['loss']),
                               rtol=1e-5)


def test_train_step_rmat_rot_type(rng):
    """6D-rotation models: forward, matching, losses, metrics under rmat."""
    cfg = _make_cfg('pn_transformer', 'geometry', sample_iter=1, noise_dim=0)
    cfg.model.rot_type = 'rmat'
    model = build_model(cfg)
    batch = _fake_batch(rng)
    state, tx, _ = create_train_state(
        model, cfg, batch, jax.random.PRNGKey(0), steps_per_epoch=2)
    train_step = make_train_step(model, tx, cfg, mesh=None, donate=False)
    state1, logs = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs['loss']))
    eval_step = make_eval_step(model, cfg, mesh=None)
    eval_logs = eval_step(state1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(eval_logs['rot_rmse'])).all()

    # semantic + rmat (matching path with 3x3 rotations)
    cfg2 = _make_cfg('global', 'partnet', sample_iter=2, noise_dim=8)
    cfg2.model.rot_type = 'rmat'
    model2 = build_model(cfg2)
    batch2 = _fake_batch(rng, semantic=True)
    state2, tx2, _ = create_train_state(
        model2, cfg2, batch2, jax.random.PRNGKey(0), steps_per_epoch=2)
    step2 = make_train_step(model2, tx2, cfg2, mesh=None, donate=False)
    _, logs2 = step2(state2, batch2, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs2['loss']))
