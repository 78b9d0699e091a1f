"""Forward-parity goldens: transplant torch-reference weights into the
flax models and pin the composed eval-mode forward outputs (VERDICT r2 #4).

`tests/golden/forward_values.npz` holds randomized reference weights,
frozen inputs, and the torch outputs of the composed PN-Transformer
(reference pn_transformer/network.py:59-104) and B-Global
(b_global/network.py:45-99) forwards -- see
tests/golden/make_forward_golden.py.  These tests catch encoder/correlator
drift (BN eps, LN placement, attention head layout, gate order) that the
loss/metric goldens cannot see.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_part_assembly_tpu.models.modules.encoders import PointNet
from multi_part_assembly_tpu.models.pn_transformer import PNTransformer
from multi_part_assembly_tpu.models.global_ import GlobalModel

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'golden',
                      'forward_values.npz')
B, P, N, C = 2, 4, 24, 16
HEADS, FFN, LAYERS = 4, 32, 2


@pytest.fixture(scope='module', autouse=True)
def _f32_compute():
    """Bitwise-meaningful parity needs f32 compute (the default bf16
    compute dtype quantizes matmuls to ~3e-4, above the 1e-4 pin)."""
    from multi_part_assembly_tpu.utils import precision
    prev = precision.compute_dtype()
    precision.set_compute_dtype(jnp.float32)
    yield
    precision.set_compute_dtype(prev)


@pytest.fixture(scope='module')
def g():
    # DGL weights are stored as f16 (rounded before the torch run) to
    # bound the fixture size; upcast so flax computes from the identical
    # f32 values torch did
    return {k: v.astype(np.float32) if v.dtype == np.float16 else v
            for k, v in np.load(GOLDEN).items()}


def _map_pointnet(sd, prefix):
    """torch PointNet state_dict -> (flax params, batch_stats)."""
    params, stats = {}, {}
    for i in range(1, 6):
        w = sd[f'{prefix}.conv{i}.weight']  # [out, in, 1]
        params[f'conv{i}'] = {'kernel': jnp.asarray(w[:, :, 0].T)}
        params[f'bn{i}'] = {
            'scale': jnp.asarray(sd[f'{prefix}.bn{i}.weight']),
            'bias': jnp.asarray(sd[f'{prefix}.bn{i}.bias']),
        }
        stats[f'bn{i}'] = {
            'mean': jnp.asarray(sd[f'{prefix}.bn{i}.running_mean']),
            'var': jnp.asarray(sd[f'{prefix}.bn{i}.running_var']),
        }
    return params, stats


def _lin(sd, key):
    return {'kernel': jnp.asarray(sd[f'{key}.weight'].T),
            'bias': jnp.asarray(sd[f'{key}.bias'])}


def _ln(sd, key):
    return {'scale': jnp.asarray(sd[f'{key}.weight']),
            'bias': jnp.asarray(sd[f'{key}.bias'])}


def _map_transformer(sd, prefix):
    """torch nn.TransformerEncoder state_dict -> flax TransformerEncoder
    params.  torch packs qkv as in_proj_weight [3C, C] (y = x W^T); flax
    DenseGeneral kernels are [in, H, hd] with heads concatenated in torch
    order, so the mapping is a transpose + reshape."""
    hd = C // HEADS
    p = {}
    for i in range(LAYERS):
        base = f'{prefix}.transformer_encoder.layers.{i}'
        ipw = sd[f'{base}.self_attn.in_proj_weight']  # [3C, C]
        ipb = sd[f'{base}.self_attn.in_proj_bias']

        def qkv(w, b):
            return {'kernel': jnp.asarray(w.T.reshape(C, HEADS, hd)),
                    'bias': jnp.asarray(b.reshape(HEADS, hd))}

        opw = sd[f'{base}.self_attn.out_proj.weight']  # [C, C]
        p[f'layer{i}'] = {
            'self_attn': {
                'query': qkv(ipw[0:C], ipb[0:C]),
                'key': qkv(ipw[C:2 * C], ipb[C:2 * C]),
                'value': qkv(ipw[2 * C:3 * C], ipb[2 * C:3 * C]),
                'out': {'kernel': jnp.asarray(opw.T.reshape(HEADS, hd, C)),
                        'bias': jnp.asarray(
                            sd[f'{base}.self_attn.out_proj.bias'])},
            },
            'linear1': _lin(sd, f'{base}.linear1'),
            'linear2': _lin(sd, f'{base}.linear2'),
            'norm1': _ln(sd, f'{base}.norm1'),
            'norm2': _ln(sd, f'{base}.norm2'),
        }
    p['norm'] = _ln(sd, f'{prefix}.transformer_encoder.norm')
    return p


def _map_head(sd, prefix):
    """torch StocasticPoseRegressor (noise_dim=0) -> flax head params."""
    return {'head': {
        'fc1': _lin(sd, f'{prefix}.fc_layers.0'),
        'fc2': _lin(sd, f'{prefix}.fc_layers.2'),
        'rot_head': _lin(sd, f'{prefix}.rot_head'),
        'trans_head': _lin(sd, f'{prefix}.trans_head'),
    }}


def _batch(g):
    return {
        'part_pcs': jnp.asarray(g['part_pcs']),
        'part_valids': jnp.asarray(g['valids']),
        'part_label': jnp.zeros((B, P, 0), jnp.float32),
        'instance_label': jnp.zeros((B, P, 0), jnp.float32),
    }


def _check_valid(ours, ref, valids, atol):
    mask = valids > 0
    np.testing.assert_allclose(np.asarray(ours)[mask], ref[mask],
                               atol=atol, rtol=1e-4)


def test_pointnet_forward_parity(g):
    """Encoder alone on the compacted valid parts."""
    params, stats = _map_pointnet(g, 'enc')
    enc = PointNet(feat_dim=C, global_feat=True)
    mask = g['valids'].reshape(-1) > 0
    flat = jnp.asarray(g['part_pcs'].reshape(B * P, N, 3)[mask])
    feats = enc.apply({'params': params, 'batch_stats': stats}, flat,
                      train=False)
    ref = g['pn_pc_feats'].reshape(B * P, C)[mask]
    np.testing.assert_allclose(np.asarray(feats), ref, atol=1e-4, rtol=1e-4)


def test_pointnet_train_bn_parity(g):
    """TRAIN-mode encoder parity: MaskedBatchNorm's weighted statistics
    over the padded [B*P] layout must equal torch BN over the reference's
    compacted valid parts -- outputs AND the post-step running stats
    (biased normalization, UNBIASED tracking, momentum 0.1)."""
    params, stats = _map_pointnet(g, 'tenc')
    enc = PointNet(feat_dim=C, global_feat=True)
    flat = jnp.asarray(g['part_pcs'].reshape(B * P, N, 3))
    mask = jnp.asarray(g['valids'].reshape(B * P))
    feats, mut = enc.apply({'params': params, 'batch_stats': stats}, flat,
                           mask=mask, train=True, mutable=['batch_stats'])
    vmask = g['valids'].reshape(B * P) > 0
    np.testing.assert_allclose(np.asarray(feats)[vmask], g['tenc_feats'],
                               atol=3e-4, rtol=1e-4)
    for i in range(1, 6):
        for ours, theirs in (('mean', 'running_mean'),
                             ('var', 'running_var')):
            np.testing.assert_allclose(
                np.asarray(mut['batch_stats'][f'bn{i}'][ours]),
                g[f'tenc_post.bn{i}.{theirs}'], atol=1e-5, rtol=1e-4)


def test_edge_mlp_train_bn_parity(g):
    """TRAIN-mode MLP3 parity (mask=None path): BN statistics over every
    [B*P, P] pair entry, outputs and running-stat updates."""
    from multi_part_assembly_tpu.models.dgl import EdgeMLP
    params, stats = _map_mlp34(g, 'tedge')
    mlp = EdgeMLP(C)
    o, mut = mlp.apply({'params': params, 'batch_stats': stats},
                       jnp.asarray(g['tedge_in']), train=True,
                       mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(o), g['tedge_out'],
                               atol=3e-4, rtol=1e-4)
    for i in range(1, 4):
        for ours, theirs in (('mean', 'running_mean'),
                             ('var', 'running_var')):
            np.testing.assert_allclose(
                np.asarray(mut['batch_stats'][f'bn{i}'][ours]),
                g[f'tedge_post.bn{i}.{theirs}'], atol=1e-5, rtol=1e-4)


def test_pn_transformer_forward_parity(g):
    model = PNTransformer(
        rot_type='quat', pc_feat_dim=C, encoder_arch='pointnet',
        noise_dim=0, transformer_feat_dim=FFN, transformer_heads=HEADS,
        transformer_layers=LAYERS, transformer_pre_ln=True)
    enc_p, enc_s = _map_pointnet(g, 'enc')
    params = {
        'encoder': enc_p,
        'corr_module': _map_transformer(g, 'corr'),
        'pose_predictor': _map_head(g, 'head'),
    }
    stats = {'encoder': enc_s}
    out = model.apply({'params': params, 'batch_stats': stats}, _batch(g),
                      train=False)
    _check_valid(out['rot'], g['pn_rot'], g['valids'], 1e-4)
    _check_valid(out['trans'], g['pn_trans'], g['valids'], 1e-4)


def _map_gru(sd, prefix, num_layers=2, bidirectional=True):
    """torch nn.GRU state_dict -> flax MaskedGRU params."""
    p = {}
    for layer in range(num_layers):
        for d in range(2 if bidirectional else 1):
            sfx = f'_l{layer}' + ('_reverse' if d else '')
            p[f'l{layer}_d{d}'] = _map_gru_cell(sd, prefix, sfx)
    return p


def _map_gru_cell(sd, prefix, sfx):
    """One torch GRU layer/direction -> FusedGRUCell params.

    torch packs gates as rows (r|z|n) of weight_ih/weight_hh [3H, in]
    with separate b_ih/b_hh; FusedGRUCell keeps the same r|z|n packing as
    fused [in, 3H] kernels, merges the r/z biases (b_ih+b_hh, those
    linears are summed) into wi.bias, and keeps b_hn apart (-> bhn)
    because r multiplies the hidden linear before the sum."""
    wi = sd[f'{prefix}.weight_ih{sfx}']  # [3H, in]
    wh = sd[f'{prefix}.weight_hh{sfx}']  # [3H, H]
    bi = sd[f'{prefix}.bias_ih{sfx}']
    bh = sd[f'{prefix}.bias_hh{sfx}']
    H = wh.shape[1]
    bias = np.concatenate([bi[:H] + bh[:H],          # r (merged)
                           bi[H:2 * H] + bh[H:2 * H],  # z (merged)
                           bi[2 * H:]])                # n (input half)
    return {
        'wi': {'kernel': jnp.asarray(np.asarray(wi).T),
               'bias': jnp.asarray(bias)},
        'wh': {'kernel': jnp.asarray(np.asarray(wh).T)},
        'bhn': jnp.asarray(bh[2 * H:]),
    }


def test_seq2seq_forward_parity(g):
    """Composed Seq2Seq eval forward (reference b_lstm/seq2seq.py:126-223,
    teacher_forcing_ratio=0, recorded hidden noise injected): pins the
    packed Bi-GRU encoder hidden wiring, the autoregressive 2-layer
    decoder, the identity-activation linear1 head (the reference's
    LeakyReLU(True) == slope 1.0) and the stop-sign head."""
    from multi_part_assembly_tpu.models.lstm import Seq2Seq
    s2s = Seq2Seq(feat_dim=C, hidden_size=20)
    params = {
        'encoder': _map_gru(g, 'ls2s.encoder.rnn.gru'),
        'decoder': {
            'cell0': _map_gru_cell(g, 'ls2s.decoder.gru', '_l0'),
            'cell1': _map_gru_cell(g, 'ls2s.decoder.gru', '_l1'),
            'lin1a': _lin(g, 'ls2s.decoder.linear1.0'),
            'lin1b': _lin(g, 'ls2s.decoder.linear1.2'),
            'lin3a': _lin(g, 'ls2s.decoder.linear3.0'),
            'lin3b': _lin(g, 'ls2s.decoder.linear3.3'),
        },
    }
    x = jnp.asarray(g['gru_x'])
    valids = jnp.asarray(g['valids'])
    outputs, stop_signs = s2s.apply(
        {'params': params}, x, x, valids=valids, train=False,
        hidden_noise=jnp.asarray(g['ls2s_noise']))
    np.testing.assert_allclose(np.asarray(outputs), g['ls2s_out'],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stop_signs), g['ls2s_stop'],
                               atol=1e-4, rtol=1e-4)


def test_masked_gru_forward_parity(g):
    """MaskedGRU vs torch packed bidirectional 2-layer nn.GRU (the
    RNNWrapper path of the LSTM / RGL-NET families): pins gate order,
    bias split, packed-sequence output zeros and per-direction h_n."""
    from multi_part_assembly_tpu.models.modules.rnn import MaskedGRU
    gru = MaskedGRU(hidden_size=C, num_layers=2, bidirectional=True)
    params = _map_gru(g, 'gru')
    x = jnp.asarray(g['gru_x'])
    valids = jnp.asarray(g['valids'])
    out, h_n = gru.apply({'params': params}, x, valids=valids, train=False)
    np.testing.assert_allclose(np.asarray(out), g['gru_out'],
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_n), g['gru_hn'],
                               atol=1e-5, rtol=1e-4)


def _map_mlp34(sd, prefix):
    """torch MLP3/MLP4 (conv1d + BN stacks) -> flax EdgeMLP/NodeMLP."""
    params, stats = {}, {}
    for i in range(1, 4):
        w = sd[f'{prefix}.conv{i}.weight']  # [out, in, 1]
        params[f'conv{i}'] = {'kernel': jnp.asarray(w[:, :, 0].T),
                              'bias': jnp.asarray(sd[f'{prefix}.conv{i}.bias'])}
        params[f'bn{i}'] = {
            'scale': jnp.asarray(sd[f'{prefix}.bn{i}.weight']),
            'bias': jnp.asarray(sd[f'{prefix}.bn{i}.bias']),
        }
        stats[f'bn{i}'] = {
            'mean': jnp.asarray(sd[f'{prefix}.bn{i}.running_mean']),
            'var': jnp.asarray(sd[f'{prefix}.bn{i}.running_var']),
        }
    return params, stats


def test_dgl_forward_parity(g):
    """Composed DGL eval forward (reference dgl/network.py:153-240): the
    3-iter GNN loop incl. the semantic merge (dense masked merge vs the
    reference's class_list CPU loop), both RelationNets, edge/node MLPs
    with BN, pose extractor, and per-iter pose predictors."""
    from multi_part_assembly_tpu.models.dgl import DGLModel
    model = DGLModel(rot_type='quat', pc_feat_dim=C,
                     encoder_arch='pointnet', noise_dim=0, gnn_iter=3,
                     merge_node=True, semantic=True)
    enc_p, enc_s = _map_pointnet(g, 'denc')
    params = {'encoder': enc_p}
    stats = {'encoder': enc_s}
    for i in range(3):
        for role, pre in (('edge_mlp', 'dedge'), ('node_mlp', 'dnode')):
            p, s = _map_mlp34(g, f'{pre}{i}')
            params[f'{role}{i}'] = p
            stats[f'{role}{i}'] = s
        params[f'pose{i}'] = _map_head(g, f'dhead{i}')
    for name, pre in (('relation_dense', 'drel_dense'),
                      ('relation_merge', 'drel_merge')):
        params[name] = {f'mlp{i}': _lin(g, f'{pre}.mlp{i}')
                        for i in (1, 2, 3)}
    params['pose_extractor'] = {f'mlp{i}': _lin(g, f'dpose_enc.mlp{i}')
                                for i in (1, 2)}
    batch = {
        'part_pcs': jnp.asarray(g['part_pcs']),
        'part_valids': jnp.asarray(g['valids']),
        'part_label': jnp.zeros((B, P, 0), jnp.float32),
        'instance_label': jnp.asarray(g['dgl_instance_label']),
        'part_ids': jnp.asarray(g['dgl_part_ids']),
        'valid_matrix': jnp.asarray(g['dgl_valid_matrix']),
    }
    out = model.apply({'params': params, 'batch_stats': stats}, batch,
                      train=False)
    _check_valid(out['rot'], g['dgl_rot'], g['valids'], 3e-4)
    _check_valid(out['trans'], g['dgl_trans'], g['valids'], 3e-4)


def test_rgl_forward_parity(g):
    """Composed RGL-Net eval forward (reference rgl_net/network.py:70-162):
    the DGL GNN loop with packed-GRU progressive node updates (recorded
    init hiddens injected) and the no-final-relu RGL node MLP."""
    from multi_part_assembly_tpu.models.rgl_net import RGLNet
    hidden = jnp.asarray(g['rgl_hidden']).reshape(3, 1, 2, B, 2 * C)
    model = RGLNet(rot_type='quat', pc_feat_dim=C,
                   encoder_arch='pointnet', noise_dim=0, gnn_iter=3,
                   merge_node=True, semantic=True,
                   hidden_noise_override=hidden)
    enc_p, enc_s = _map_pointnet(g, 'denc')
    params = {'encoder': enc_p}
    stats = {'encoder': enc_s}
    for i in range(3):
        p, s = _map_mlp34(g, f'dedge{i}')
        params[f'edge_mlp{i}'], stats[f'edge_mlp{i}'] = p, s
        p, s = _map_mlp34(g, f'rnode{i}')
        params[f'node_mlp{i}'], stats[f'node_mlp{i}'] = p, s
        params[f'pose{i}'] = _map_head(g, f'dhead{i}')
        params[f'gru{i}'] = _map_gru(g, f'rgru{i}', num_layers=1)
    for name, pre in (('relation_dense', 'drel_dense'),
                      ('relation_merge', 'drel_merge')):
        params[name] = {f'mlp{i}': _lin(g, f'{pre}.mlp{i}')
                        for i in (1, 2, 3)}
    params['pose_extractor'] = {f'mlp{i}': _lin(g, f'dpose_enc.mlp{i}')
                                for i in (1, 2)}
    batch = {
        'part_pcs': jnp.asarray(g['part_pcs']),
        'part_valids': jnp.asarray(g['valids']),
        'part_label': jnp.zeros((B, P, 0), jnp.float32),
        'instance_label': jnp.asarray(g['dgl_instance_label']),
        'part_ids': jnp.asarray(g['dgl_part_ids']),
        'valid_matrix': jnp.asarray(g['dgl_valid_matrix']),
    }
    out = model.apply({'params': params, 'batch_stats': stats}, batch,
                      train=False)
    _check_valid(out['rot'], g['rgl_rot'], g['valids'], 3e-4)
    _check_valid(out['trans'], g['rgl_trans'], g['valids'], 3e-4)


def test_pn_transformer_refine_forward_parity(g):
    """Composed PN-Transformer-Refine eval forward (reference
    network_refine.py:79-142): per-step transformer (with out_fc) + head
    clones, pose fed back as an additive learned positional encoding,
    pose_pc_feat concat."""
    from multi_part_assembly_tpu.models.pn_transformer import \
        PNTransformerRefine
    model = PNTransformerRefine(
        rot_type='quat', pc_feat_dim=C, encoder_arch='pointnet',
        noise_dim=0, transformer_feat_dim=FFN, transformer_heads=HEADS,
        transformer_layers=LAYERS, transformer_pre_ln=True,
        transformer_pos_enc=(C, C), pose_pc_feat=True, refine_steps=2)
    enc_p, enc_s = _map_pointnet(g, 'enc')
    params = {
        'encoder': enc_p,
        'corr_pos_enc': {'fc0': _lin(g, 'rf_pos.layers.0'),
                         'fc1': _lin(g, 'rf_pos.layers.2')},
    }
    for i in range(2):
        corr = _map_transformer(g, f'rf_corr{i}')
        corr['out_fc'] = _lin(g, f'rf_corr{i}.out_fc')
        params[f'corr{i}'] = corr
        params[f'pose{i}'] = _map_head(g, f'rf_head{i}')
    out = model.apply({'params': params, 'batch_stats': {'encoder': enc_s}},
                      _batch(g), train=False)
    _check_valid(out['rot'], g['rf_rot'], g['valids'], 3e-4)
    _check_valid(out['trans'], g['rf_trans'], g['valids'], 3e-4)


def test_dgcnn_forward_parity(g):
    """Composed DGCNN eval forward (reference encoder/dgcnn.py:41-109):
    4 EdgeConv stages (kNN graph, 1x1 conv, BN, LeakyReLU 0.2, max over
    k), fuse conv5, max||avg global pool + out_fc.  Pins the kNN set
    semantics (max over k is permutation-invariant, so topk ORDER ties
    cannot mask drift) and the conv/BN weight mapping."""
    from multi_part_assembly_tpu.models.modules.encoders import DGCNN
    params, stats = {}, {}
    for i in range(1, 6):
        w = g[f'dgc.conv{i}.0.weight']  # conv1-4: [out,in,1,1]; conv5: [out,in,1]
        params[f'conv{i}'] = {'kernel': jnp.asarray(
            w.reshape(w.shape[0], w.shape[1]).T)}
        params[f'bn{i}'] = {'scale': jnp.asarray(g[f'dgc.bn{i}.weight']),
                            'bias': jnp.asarray(g[f'dgc.bn{i}.bias'])}
        stats[f'bn{i}'] = {
            'mean': jnp.asarray(g[f'dgc.bn{i}.running_mean']),
            'var': jnp.asarray(g[f'dgc.bn{i}.running_var'])}
    params['out_fc'] = _lin(g, 'dgc.out_fc')
    enc = DGCNN(feat_dim=C, global_feat=True)
    mask = g['valids'].reshape(-1) > 0
    flat = jnp.asarray(g['part_pcs'].reshape(B * P, N, 3)[mask])
    feats = enc.apply({'params': params, 'batch_stats': stats}, flat,
                      train=False)
    np.testing.assert_allclose(np.asarray(feats), g['dgc_feats'],
                               atol=3e-4, rtol=1e-4)


def _map_shared_mlp(g, prefix, n_layers):
    """torch Sequential(Linear/BN1d/ReLU ...) -> flax _SharedMLP params.
    Linear at Sequential index 3i, BN at 3i+1 (make_forward_golden
    build_shared_mlp_eval; the reference's Conv2d(k=1) == this Linear,
    pointnet2_modules.py:9-19)."""
    params, stats = {}, {}
    for i in range(n_layers):
        params[f'mlp{i}'] = {
            'kernel': jnp.asarray(g[f'{prefix}.{3 * i}.weight'].T)}
        params[f'bn{i}'] = {
            'scale': jnp.asarray(g[f'{prefix}.{3 * i + 1}.weight']),
            'bias': jnp.asarray(g[f'{prefix}.{3 * i + 1}.bias'])}
        stats[f'bn{i}'] = {
            'mean': jnp.asarray(g[f'{prefix}.{3 * i + 1}.running_mean']),
            'var': jnp.asarray(g[f'{prefix}.{3 * i + 1}.running_var'])}
    return params, stats


def _map_pointnet2(g, tag, n_scales):
    """Assemble sa1-sa3 params/stats from the fixture's per-scale shared
    MLPs (n_scales per SA stage; the last stage is always group_all with
    one MLP)."""
    params, stats = {}, {}
    for si in range(3):
        p_sa, s_sa = {}, {}
        for mi in range(n_scales if si < 2 else 1):
            p, s = _map_shared_mlp(g, f'{tag}_sa{si}_m{mi}', 3)
            p_sa[f'mlp{mi}'] = p
            s_sa[f'mlp{mi}'] = s
        params[f'sa{si + 1}'] = p_sa
        stats[f'sa{si + 1}'] = s_sa
    return params, stats


def test_pointnet2_ssg_forward_parity(g):
    """Composed PointNet2SSG eval forward (reference pointnet2_ssg.py:19-66
    + the pointnet2_ops CUDA kernels, whose FPS / ball-query indices the
    fixture generator reimplemented and cross-checked INDEX-FOR-INDEX
    against ops/sampling.py -- see make_forward_golden.py)."""
    from multi_part_assembly_tpu.models.modules.encoders import PointNet2SSG
    params, stats = _map_pointnet2(g, 'p2s', 1)
    enc = PointNet2SSG(feat_dim=C)
    feats = enc.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(g['p2_pcs']), train=False)
    np.testing.assert_allclose(np.asarray(feats), g['p2s_feats'],
                               atol=3e-4, rtol=1e-4)


def test_pointnet2_msg_forward_parity(g):
    """Composed PointNet2MSG eval forward (reference pointnet2_msg.py:15-43):
    3 radius scales per SA stage, concatenated scale features."""
    from multi_part_assembly_tpu.models.modules.encoders import PointNet2MSG
    params, stats = _map_pointnet2(g, 'p2m', 3)
    enc = PointNet2MSG(feat_dim=C)
    feats = enc.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(g['p2_pcs']), train=False)
    np.testing.assert_allclose(np.asarray(feats), g['p2m_feats'],
                               atol=3e-4, rtol=1e-4)


def test_global_forward_parity(g):
    model = GlobalModel(rot_type='quat', pc_feat_dim=C,
                        encoder_arch='pointnet', noise_dim=0)
    enc_p, enc_s = _map_pointnet(g, 'genc')
    params = {
        'encoder': enc_p,
        'global_encoder': enc_p,  # fixture reuses one torch encoder
        'pose_predictor': _map_head(g, 'ghead'),
    }
    stats = {'encoder': enc_s, 'global_encoder': enc_s}
    out = model.apply({'params': params, 'batch_stats': stats}, _batch(g),
                      train=False)
    _check_valid(out['rot'], g['gl_rot'], g['valids'], 1e-4)
    _check_valid(out['trans'], g['gl_trans'], g['valids'], 1e-4)
