"""Record golden FORWARD outputs by running the torch reference models.

Weight-transplant parity (VERDICT r2 #4): the reference's PN-Transformer
and B-Global forward paths are pure torch
(/root/reference/multi_part_assembly/models/pn_transformer/network.py:70-104,
b_global/network.py:63-99), so they run in this container with the CUDA /
wandb / lightning deps stubbed (make_golden.install_stubs).  This script
randomizes the module weights, runs the composed eval-mode forwards on
frozen inputs, and dumps weights + inputs + outputs to
``forward_values.npz``; tests/test_golden.py transplants the weights into
the flax models and pins their outputs at <=1e-4 -- catching BN-eps,
LN-placement, attention-layout or head-order drift that loss goldens
cannot see.

Usage (re-run only when regenerating fixtures):
    python tests/golden/make_forward_golden.py
"""

import os
import sys

import numpy as np
import torch

REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'forward_values.npz')
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_golden import install_stubs  # noqa: E402

B, P, N, C = 2, 4, 24, 16
HEADS, FFN, LAYERS = 4, 32, 2
NPARTS = np.array([2, 3])


def randomize(module, seed):
    """Fill every parameter/buffer with reproducible non-default values
    (default BN running stats / LN scales would mask mapping bugs)."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if k.endswith('running_var'):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith('running_mean'):
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
        elif 'norm' in k.lower() and k.endswith('weight') or \
                k.endswith('bn1.weight') or '.bn' in k and k.endswith(
                    'weight'):
            sd[k] = 1.0 + 0.2 * torch.randn(v.shape, generator=g)
        elif k.endswith('bias'):
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
        else:
            sd[k] = 0.2 * torch.randn(v.shape, generator=g)
    module.load_state_dict(sd)


def dump_state(prefix, module, out):
    for k, v in module.state_dict().items():
        if torch.is_floating_point(v):
            out[f'{prefix}.{k}'] = v.detach().numpy()


def main():
    install_stubs()
    # the encoder package eagerly imports the CUDA pointnet2_ops extension
    # (encoder/__init__.py); stub it -- only the pure-torch PointNet and
    # transformer paths are exercised here
    import types
    for name in ('pointnet2_ops', 'pointnet2_ops.pointnet2_modules'):
        mod = types.ModuleType(name)
        mod.PointnetSAModule = object
        mod.PointnetSAModuleMSG = object
        mod.PointnetFPModule = object
        sys.modules[name] = mod
    sys.path.insert(0, REF)
    from multi_part_assembly.models.modules.encoder.pointnet import PointNet
    from multi_part_assembly.models.modules.regressor import \
        StocasticPoseRegressor
    from multi_part_assembly.models.pn_transformer.transformer import \
        TransformerEncoder

    rng = np.random.RandomState(7)
    valids = (np.arange(P)[None] < NPARTS[:, None]).astype(np.float32)
    part_pcs = (rng.randn(B, P, N, 3) * 0.3).astype(np.float32)
    part_pcs *= valids[:, :, None, None]

    out = dict(part_pcs=part_pcs, valids=valids)

    # --- modules (eval mode: dropout off, BN running stats) ---
    encoder = PointNet(feat_dim=C, global_feat=True).eval()
    corr = TransformerEncoder(d_model=C, num_heads=HEADS, ffn_dim=FFN,
                              num_layers=LAYERS, norm_first=True).eval()
    # noise_dim=0: the stochastic head degenerates to the plain regressor
    head = StocasticPoseRegressor(feat_dim=C, noise_dim=0,
                                  rot_type='quat').eval()
    g_encoder = PointNet(feat_dim=C, global_feat=True).eval()
    g_head = StocasticPoseRegressor(feat_dim=2 * C, noise_dim=0,
                                    rot_type='quat').eval()
    for seed, m in enumerate([encoder, corr, head, g_encoder, g_head]):
        randomize(m, 100 + seed)
    for prefix, m in [('enc', encoder), ('corr', corr), ('head', head),
                      ('genc', g_encoder), ('ghead', g_head)]:
        dump_state(prefix, m, out)

    t_pcs = torch.as_tensor(part_pcs)
    t_valids = torch.as_tensor(valids)
    valid_mask = t_valids == 1

    with torch.no_grad():
        # --- composed PN-Transformer forward (network.py:59-104) ---
        valid_pcs = t_pcs[valid_mask]                      # [n, N, 3]
        valid_feats = encoder(valid_pcs)                   # [n, C]
        pc_feats = torch.zeros(B, P, C)
        pc_feats[valid_mask] = valid_feats
        corr_feats = corr(pc_feats, valid_mask)            # [B, P, C]
        rot, trans = head(corr_feats)                      # labels are [.,0]
        out['pn_pc_feats'] = pc_feats.numpy()
        out['pn_corr_feats'] = corr_feats.numpy()
        out['pn_rot'] = rot.numpy()
        out['pn_trans'] = trans.numpy()

        # --- composed B-Global forward (b_global/network.py:45-99) ---
        g_valid_feats = g_encoder(t_pcs[valid_mask])
        g_pc_feats = torch.zeros(B, P, C)
        g_pc_feats[valid_mask] = g_valid_feats
        global_feats = g_encoder(t_pcs.flatten(1, 2))      # [B, C]
        # NOTE: the reference uses a SEPARATE global encoder instance; we
        # reuse g_encoder for both roles here and mirror that in the test
        global_rep = global_feats.unsqueeze(1).repeat(1, P, 1)
        g_feats = torch.cat([global_rep, g_pc_feats], dim=-1)
        g_rot, g_trans = g_head(g_feats)
        out['gl_rot'] = g_rot.numpy()
        out['gl_trans'] = g_trans.numpy()

        # --- packed bidirectional GRU (the RNNWrapper path the LSTM /
        # RGL-NET families ride, reference models/modules/rnn.py:6-46 +
        # b_lstm/seq2seq.py:118-141): torch gate order (r|z|n) and the
        # b_ih/b_hh bias split must map exactly onto flax GRUCell's
        # merged-bias formulation; this fixture pins that mapping ---
        from torch.nn.utils.rnn import (pack_padded_sequence,
                                        pad_packed_sequence)
        H = C  # hidden == feat dim, like seq2seq encoder
        gru = torch.nn.GRU(C, H, num_layers=2, batch_first=True,
                           bidirectional=True).eval()
        randomize(gru, 300)
        dump_state('gru', gru, out)
        gru_x = (rng.randn(B, P, C) * 0.4).astype(np.float32)
        gru_x *= valids[:, :, None]
        out['gru_x'] = gru_x
        packed = pack_padded_sequence(
            torch.as_tensor(gru_x), torch.as_tensor(NPARTS),
            batch_first=True, enforce_sorted=False)
        y, h_n = gru(packed)
        y, _ = pad_packed_sequence(y, batch_first=True, total_length=P)
        out['gru_out'] = y.numpy()
        # [num_layers*2, B, H] -> [num_layers, 2, B, H]
        out['gru_hn'] = h_n.reshape(2, 2, B, H).numpy()

    np.savez(OUT, **out)
    print(f'wrote {OUT} ({len(out)} arrays)')
    print('pn_rot[0,0]:', np.round(out['pn_rot'][0, 0], 5))
    print('gl_trans[0,0]:', np.round(out['gl_trans'][0, 0], 5))


if __name__ == '__main__':
    main()
