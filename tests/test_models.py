"""Model forward-pass smoke + semantics tests on fake batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_part_assembly_tpu.models import (DGLModel, GlobalModel,
                                            IdentityModel, LSTMModel,
                                            MaskedBatchNorm, MaskedGRU,
                                            PNTransformer,
                                            PNTransformerRefine, RGLNet,
                                            build_encoder)
from multi_part_assembly_tpu.models.dgl import merge_equiv_nodes


def _fake_batch(rng, B=2, P=5, N=64, semantic=True, n_cat=0):
    nparts = np.array([3, 5][:B] + [P] * max(0, B - 2))
    valids = (np.arange(P)[None] < nparts[:, None]).astype(np.float32)
    batch = {
        'part_pcs': jnp.asarray(rng.randn(B, P, N, 3), jnp.float32) * 0.3,
        'part_valids': jnp.asarray(valids),
        'part_label': jnp.zeros((B, P, n_cat), jnp.float32),
        'instance_label': jnp.zeros((B, P, P if semantic else 0),
                                    jnp.float32),
        'part_ids': jnp.asarray(rng.randint(0, 3, (B, P)), jnp.int32),
        'valid_matrix': jnp.asarray(valids[:, :, None] * valids[:, None, :]),
    }
    return batch


def _init_and_run(model, batch, train=True):
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, train=train)
    out, mutated = model.apply(
        variables, batch, train=train,
        rngs={'noise': jax.random.PRNGKey(3),
              'dropout': jax.random.PRNGKey(4)},
        mutable=['batch_stats'])
    return variables, out


@pytest.mark.parametrize('cls,kwargs,multi_step', [
    (IdentityModel, {}, False),
    (GlobalModel, dict(pc_feat_dim=32, noise_dim=8), False),
    (PNTransformer,
     dict(pc_feat_dim=32, noise_dim=8, transformer_feat_dim=64,
          transformer_heads=4, transformer_layers=2), False),
    (PNTransformerRefine,
     dict(pc_feat_dim=32, noise_dim=0, transformer_feat_dim=64,
          transformer_heads=4, transformer_layers=1,
          transformer_pos_enc=(32, 32), refine_steps=2), True),
    (LSTMModel, dict(pc_feat_dim=32, noise_dim=8, lstm_hidden_size=32),
     False),
    (DGLModel, dict(pc_feat_dim=32, noise_dim=8, gnn_iter=2,
                    merge_node=True, semantic=True), True),
    (RGLNet, dict(pc_feat_dim=32, noise_dim=8, gnn_iter=2, merge_node=False,
                  semantic=False), True),
])
def test_model_forward_shapes(rng, cls, kwargs, multi_step):
    B, P = 2, 5
    batch = _fake_batch(rng, B=B, P=P)
    model = cls(**kwargs)
    variables, out = _init_and_run(model, batch, train=True)
    rot, trans = out['rot'], out['trans']
    if multi_step:
        assert rot.ndim == 4 and rot.shape[1:3] == (B, P)
        assert trans.shape[1:] == (B, P, 3)
    else:
        assert rot.shape[:2] == (B, P)
        assert trans.shape == (B, P, 3)
    # quat rows normalized
    q = rot[..., :4].reshape(-1, 4) if rot.shape[-1] == 4 else None
    if q is not None and not isinstance(model, IdentityModel):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    # eval mode gives single-step output
    out_eval, _ = model.apply(
        variables, batch, train=False,
        rngs={'noise': jax.random.PRNGKey(5),
              'dropout': jax.random.PRNGKey(6)},
        mutable=['batch_stats'])
    assert out_eval['rot'].shape[:2] == (B, P)
    assert np.isfinite(np.asarray(out_eval['trans'])).all()


def test_precompute_sample_split(rng):
    """MoN reuse: precompute once, sample twice with different noise."""
    batch = _fake_batch(rng)
    model = GlobalModel(pc_feat_dim=32, noise_dim=8)
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    feats, _ = model.apply(variables, batch, train=True,
                           method='precompute', mutable=['batch_stats'])
    out1 = model.apply(variables, feats, batch, train=True, method='sample',
                       rngs={'noise': jax.random.PRNGKey(10)})
    out2 = model.apply(variables, feats, batch, train=True, method='sample',
                       rngs={'noise': jax.random.PRNGKey(20)})
    # different noise -> different poses
    assert not np.allclose(np.asarray(out1['trans']),
                           np.asarray(out2['trans']))


def test_sample_vmappable(rng):
    """sample() must vmap over MoN keys."""
    batch = _fake_batch(rng)
    model = PNTransformer(pc_feat_dim=32, noise_dim=8,
                          transformer_feat_dim=64, transformer_heads=4,
                          transformer_layers=1)
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, train=True)
    feats, _ = model.apply(variables, batch, train=True,
                           method='precompute', mutable=['batch_stats'],
                           rngs={'dropout': jax.random.PRNGKey(3)})

    def one(key):
        return model.apply(variables, feats, batch, train=True,
                           method='sample', rngs={'noise': key})

    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    outs = jax.vmap(one)(keys)
    assert outs['trans'].shape == (3, 2, 5, 3)


def test_masked_batchnorm_matches_compact_bn(rng):
    """Masked BN stats == BN over the compacted valid subset."""
    x = jnp.asarray(rng.randn(6, 10, 4), jnp.float32)
    mask = jnp.asarray([1, 1, 0, 1, 0, 0], jnp.float32)
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x, mask[:, None], True)
    y, _ = bn.apply(variables, x, mask[:, None], True,
                    mutable=['batch_stats'])
    xv = np.asarray(x)[[0, 1, 3]].reshape(-1, 4)
    mean, var = xv.mean(0), xv.var(0)
    ref = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y)[[0, 1, 3]],
                               ref[[0, 1, 3]], atol=1e-4)


def test_masked_batchnorm_per_replica_groups(rng):
    """set_bn_groups(D) (cfg.exp.sync_bn = False): train-mode statistics
    per leading-axis block == torch DDP's per-GPU BN; running stats track
    the across-group mean (documented deviation)."""
    from multi_part_assembly_tpu.models.modules.norm import set_bn_groups
    x = jnp.asarray(rng.randn(8, 10, 4), jnp.float32)
    mask = jnp.asarray([1, 1, 0, 1, 1, 1, 0, 1], jnp.float32)
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x, mask[:, None], True)
    set_bn_groups(2)
    try:
        y, mut = bn.apply(variables, x, mask[:, None], True,
                          mutable=['batch_stats'])
    finally:
        set_bn_groups(1)
    means, vars_ = [], []
    for rows in ([0, 1, 3], [4, 5, 7]):  # valid rows per half
        half = slice(0, 4) if rows[0] == 0 else slice(4, 8)
        xv = np.asarray(x)[rows].reshape(-1, 4)
        mean, var = xv.mean(0), xv.var(0)
        ref = (np.asarray(x)[half] - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(
            np.asarray(y)[half][[r - half.start for r in rows]],
            ref[[r - half.start for r in rows]], atol=1e-4)
        means.append(mean)
        vars_.append(var * xv.shape[0] / (xv.shape[0] - 1))
    np.testing.assert_allclose(
        np.asarray(mut['batch_stats']['mean']),
        0.1 * np.mean(means, axis=0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut['batch_stats']['var']),
        0.9 + 0.1 * np.mean(vars_, axis=0), rtol=1e-5)


def test_masked_gru_prefix_equivalence(rng):
    """Masked GRU over a padded sequence == GRU over the valid prefix."""
    B, T, C, H = 2, 6, 8, 16
    x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    valids = jnp.asarray(
        np.stack([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]]), jnp.float32)
    gru = MaskedGRU(hidden_size=H, num_layers=1, bidirectional=True)
    variables = gru.init(jax.random.PRNGKey(0), x, None, valids, False)
    out, hid = gru.apply(variables, x, None, valids, False)
    # batch elem 0: run only the 4 valid steps
    out4, hid4 = gru.apply(variables, x[:1, :4], None,
                           jnp.ones((1, 4)), False)
    np.testing.assert_allclose(np.asarray(out)[0, :4],
                               np.asarray(out4)[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[0, 4:], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hid)[:, :, 0],
                               np.asarray(hid4)[:, :, 0], atol=1e-5)


def test_merge_equiv_nodes(rng):
    feats = jnp.asarray(rng.randn(1, 4, 3), jnp.float32)
    part_ids = jnp.asarray([[1, 1, 2, 2]], jnp.int32)
    valids = jnp.asarray([[1., 1., 1., 0.]])
    merged = np.asarray(merge_equiv_nodes(feats, part_ids, valids))
    f = np.asarray(feats)[0]
    np.testing.assert_allclose(merged[0, 0], np.maximum(f[0], f[1]),
                               atol=1e-6)
    np.testing.assert_allclose(merged[0, 1], np.maximum(f[0], f[1]),
                               atol=1e-6)
    # part 2's group-mate (3) is invalid -> only itself
    np.testing.assert_allclose(merged[0, 2], f[2], atol=1e-6)


@pytest.mark.parametrize('arch', ['pointnet', 'dgcnn', 'pointnet2_ssg',
                                  'pointnet2_msg'])
def test_encoders(rng, arch):
    # pointnet2 needs enough points for FPS-512; use fewer via small clouds
    N = 600 if 'pointnet2' in arch else 64
    x = jnp.asarray(rng.randn(4, N, 3), jnp.float32)
    enc = build_encoder(arch, feat_dim=32)
    variables = enc.init(jax.random.PRNGKey(0), x, None, True)
    out, _ = enc.apply(variables, x, None, True, mutable=['batch_stats'])
    assert out.shape == (4, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_feature_propagation(rng):
    from multi_part_assembly_tpu.models.modules.encoders import \
        FeaturePropagation
    fp = FeaturePropagation(mlp=(16, 16))
    unknown = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    known = jnp.asarray(rng.randn(2, 8, 3), jnp.float32)
    kf = jnp.asarray(rng.randn(2, 8, 5), jnp.float32)
    uf = jnp.asarray(rng.randn(2, 32, 4), jnp.float32)
    v = fp.init(jax.random.PRNGKey(0), unknown, known, uf, kf, None, True)
    out, _ = fp.apply(v, unknown, known, uf, kf, None, True,
                      mutable=['batch_stats'])
    assert out.shape == (2, 32, 16)
    # global-feature broadcast path (known=None)
    gf = jnp.asarray(rng.randn(2, 1, 5), jnp.float32)
    v2 = fp.init(jax.random.PRNGKey(0), unknown, None, uf, gf, None, True)
    out2, _ = fp.apply(v2, unknown, None, uf, gf, None, True,
                       mutable=['batch_stats'])
    assert out2.shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out2)).all()


def test_dgcnn_collapsed_matches_naive(rng):
    """The collapsed EdgeConv path (u_j + w_i decomposition + monotone
    max/min pull-through + moment-form BN stats; encoders.py DGCNN
    docstring) matches the reference-shaped edge-tensor path in both
    modes, including running-stat updates and gradients.  The collapsed
    form is what makes the everyday flagship shape fit a 16GB chip at
    all (the edge tensor alone is 26GB f32)."""
    from multi_part_assembly_tpu.models.modules.encoders import DGCNN

    x = jnp.asarray(rng.randn(6, 64, 3), jnp.float32)
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    m = DGCNN(feat_dim=32, compute_dtype=jnp.float32)
    m_naive = DGCNN(feat_dim=32, compute_dtype=jnp.float32, naive=True)
    v = m.init(jax.random.PRNGKey(0), x, mask, train=True)

    for train in (True, False):
        y_full, st_full = m_naive.apply(v, x, mask, train=train,
                                        mutable=['batch_stats'])
        y_new, st_new = m.apply(v, x, mask, train=train,
                                mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_new),
                                   atol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(st_full),
                        jax.tree_util.tree_leaves(st_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    # gradient comparison in EVAL mode (the running-stats affine makes
    # the two forwards agree to f32 reassociation): any custom_vjp bug in
    # neighborhood_reduce shows up here.  Train-mode grads can
    # legitimately differ at k-max near-ties (the moment-form ~1e-6
    # difference flips which of two equal-distance neighbors wins).
    def loss_with(mdl):
        def loss(params):
            out = mdl.apply({**v, 'params': params}, x, mask, train=False)
            return (out**2).sum()
        return loss

    g_full = jax.grad(loss_with(m_naive))(v['params'])
    g_new = jax.grad(loss_with(m))(v['params'])
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
