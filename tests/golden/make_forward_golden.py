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
            # .numpy() returns a VIEW of the buffer -- copy, or later
            # in-place BN running-stat updates silently mutate the
            # recorded "pre" state
            out[f'{prefix}.{k}'] = v.detach().numpy().copy()


def quantize_f16(module):
    """Round every float param/buffer to its nearest f16 value (still held
    as f32): lets the fixture store f16 weights while both frameworks
    compute from bit-identical f32 values."""
    sd = module.state_dict()
    for k, v in sd.items():
        if torch.is_floating_point(v):
            sd[k] = v.half().float()
    module.load_state_dict(sd)


def dump_state_f16(prefix, module, out):
    for k, v in module.state_dict().items():
        if torch.is_floating_point(v):
            out[f'{prefix}.{k}'] = v.detach().numpy().astype(np.float16)


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
        # b_ih/b_hh bias split must map exactly onto FusedGRUCell's
        # packed-kernel merged-bias formulation; this fixture pins that mapping ---
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

    # --- composed DGL forward (dgl/network.py:153-240, eval mode) ---
    # The reference's 512-wide MLP3/MLP4 hiddens are hardcoded, so the DGL
    # weights dominate the fixture; they are rounded to f16 BEFORE the
    # torch run and stored as f16 (both frameworks then compute from
    # identical f32 values) to halve the npz.
    from multi_part_assembly.models.dgl.modules import (MLP3, MLP4,
                                                        PoseEncoder,
                                                        RelationNet)
    ITERS, POSE = 3, 7  # quat + trans
    d_enc = PointNet(feat_dim=C, global_feat=True).eval()
    edge_mlps = [MLP3(C).eval() for _ in range(ITERS)]
    node_mlps = [MLP4(C).eval() for _ in range(ITERS)]
    heads = [StocasticPoseRegressor(feat_dim=C + POSE + P, noise_dim=0,
                                    rot_type='quat').eval()
             for _ in range(ITERS)]
    rel_dense = RelationNet().eval()
    rel_merge = RelationNet().eval()
    pose_enc = PoseEncoder(POSE).eval()
    mods = ([d_enc, rel_dense, rel_merge, pose_enc] + edge_mlps + node_mlps
            + heads)
    for seed, m in enumerate(mods):
        randomize(m, 400 + seed)
        quantize_f16(m)
    dump_state_f16('denc', d_enc, out)
    dump_state_f16('drel_dense', rel_dense, out)
    dump_state_f16('drel_merge', rel_merge, out)
    dump_state_f16('dpose_enc', pose_enc, out)
    for i in range(ITERS):
        dump_state_f16(f'dedge{i}', edge_mlps[i], out)
        dump_state_f16(f'dnode{i}', node_mlps[i], out)
        dump_state_f16(f'dhead{i}', heads[i], out)

    # semantic inputs: part_ids with a non-adjacent equivalence class in
    # batch 1 ([7, 3, 7] -> parts 0 and 2 merge), instance_label [B, P, P]
    part_ids = np.array([[5, 5, 0, 0], [7, 3, 7, 0]], dtype=np.int64)
    inst = np.zeros((B, P, P), np.float32)
    for b in range(B):
        for j in range(NPARTS[b]):
            inst[b, j, j] = 1.0
    vm = np.zeros((B, P, P), np.float32)
    for b in range(B):
        vm[b, :NPARTS[b], :NPARTS[b]] = 1.0  # ref partnet_data.py:228-232
    out['dgl_part_ids'] = part_ids
    out['dgl_instance_label'] = inst
    out['dgl_valid_matrix'] = vm

    t_vm = torch.as_tensor(vm)
    t_inst = torch.as_tensor(inst)
    t_plabel = torch.zeros(B, P, 0)
    # class_list built like network.py:76-88 (valids are a prefix, so
    # compacted indices == original indices)
    class_list = []
    for b in range(B):
        ids = part_ids[b][: NPARTS[b]]
        class_list.append([np.where(ids == lbl)[0]
                           for lbl in np.unique(ids)])

    with torch.no_grad():
        d_valid_feats = d_enc(t_pcs[valid_mask])
        part_feats = torch.zeros(B, P, C)
        part_feats[valid_mask] = d_valid_feats
        pred_pose = torch.zeros(B, P, POSE)
        pred_pose[..., 0] = 1.0  # zero_pose (base_model.py:32-34)
        for it in range(ITERS):
            if it >= 1:
                pose_feats = pose_enc(pred_pose)
                if it % 2 == 1:  # merge_node + semantic
                    pf_c, po_c = part_feats.clone(), pose_feats.clone()
                    for b in range(B):
                        for lst in class_list[b]:
                            if len(lst) <= 1:
                                continue
                            po_c[b, lst] = pose_feats[b, lst].max(
                                dim=-2, keepdim=True)[0]
                            pf_c[b, lst] = part_feats[b, lst].max(
                                dim=-2, keepdim=True)[0]
                    rel_net = rel_merge
                else:
                    pf_c, po_c = part_feats, pose_feats
                    rel_net = rel_dense
                f1 = po_c.unsqueeze(1).repeat(1, P, 1, 1)
                f2 = po_c.unsqueeze(2).repeat(1, 1, P, 1)
                pair = torch.cat([f1, f2], dim=-1)
                relation = rel_net(pair.view(B, P * P, -1)).view(B, P, P)
                relation_matrix = relation * t_vm
            else:
                pf_c = part_feats
                relation_matrix = t_vm
            e1 = pf_c.unsqueeze(2).repeat(1, 1, P, 1)
            e2 = pf_c.unsqueeze(1).repeat(1, P, 1, 1)
            pair = torch.cat([e1, e2], dim=-1)
            edge = edge_mlps[it](pair.view(B * P, P, -1)).view(B, P, P, -1)
            msg = (edge * relation_matrix.unsqueeze(-1)).sum(dim=2)
            msg = msg / (relation_matrix.sum(dim=-1, keepdim=True) + 1e-6)
            part_feats = node_mlps[it](
                torch.cat([msg, part_feats], dim=-1))
            pose_in = torch.cat([part_feats, t_plabel, t_inst, pred_pose],
                                dim=-1)
            rot, trans = heads[it](pose_in)
            pred_pose = torch.cat([rot, trans], dim=-1)
        out['dgl_rot'] = rot.numpy()
        out['dgl_trans'] = trans.numpy()

    # --- composed Seq2Seq eval forward (b_lstm/seq2seq.py:126-223) ---
    # teacher_forcing_ratio=0 (pure autoregressive; the reference draws
    # random.random() < ratio even in eval -- documented deviation), the
    # 16-d decoder hidden noise recorded for injection.  Pins the 2-layer
    # packed Bi-GRU encoder hidden wiring, the autoregressive 2-layer
    # decoder, the linear1 head (whose LeakyReLU(True) is the IDENTITY:
    # negative_slope=True == 1.0) and the stop-sign head.
    torch.Tensor.cuda = lambda self, *a, **k: self  # seq2seq hardcodes .cuda()
    from multi_part_assembly.models.b_lstm.seq2seq import Seq2Seq
    H = 20
    s2s = Seq2Seq(C, C, H).eval()
    randomize(s2s, 500)
    quantize_f16(s2s)
    dump_state_f16('ls2s', s2s, out)
    np.random.seed(11)  # seq2seq draws its hidden noise via np.random
    lstm_in = torch.as_tensor(gru_x).transpose(0, 1).contiguous()  # [P,B,C]
    with torch.no_grad():
        dec_out, stop_signs = s2s(lstm_in, lstm_in.detach(),
                                  valids=t_valids, teacher_forcing_ratio=0)
    np.random.seed(11)
    out['ls2s_noise'] = np.random.normal(
        loc=0.0, scale=1.0, size=[2, B, 16]).astype(np.float32)
    # [P, B, C] -> [B, P, C]; stop [P, B, 1] -> [B, P, 1]
    out['ls2s_out'] = dec_out.transpose(0, 1).numpy()
    out['ls2s_stop'] = stop_signs.transpose(0, 1).numpy()

    # --- composed RGL-Net forward (rgl_net/network.py:70-162): DGL loop
    # with a packed bidirectional GRU node update.  Reuses the DGL
    # encoder/edge/relation/pose-extractor/head weights (shape-identical);
    # only the RGL node MLPs (4F input, NO final relu) and the per-iter
    # GRUs are new.  The per-iter randn init hiddens (network.py:50-57)
    # are recorded for injection. ---
    from multi_part_assembly.models.rgl_net.modules import MLP4 as RGLMLP4
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence
    rgl_nodes = [RGLMLP4(C).eval() for _ in range(ITERS)]
    rgl_grus = [torch.nn.GRU(2 * C, 2 * C, 1, batch_first=True,
                             bidirectional=True).eval()
                for _ in range(ITERS)]
    for seed, m in enumerate(rgl_nodes + rgl_grus):
        randomize(m, 600 + seed)
        quantize_f16(m)
    for i in range(ITERS):
        dump_state_f16(f'rnode{i}', rgl_nodes[i], out)
        dump_state_f16(f'rgru{i}', rgl_grus[i], out)
    rng2 = np.random.RandomState(13)
    rgl_hidden = np.stack([
        np.concatenate([np.repeat(rng2.randn(1, B, C), 2, axis=0),
                        rng2.randn(2, B, C)], axis=-1)
        for _ in range(ITERS)]).astype(np.float32)  # [ITERS, 2, B, 2C]
    out['rgl_hidden'] = rgl_hidden

    with torch.no_grad():
        r_feats = torch.zeros(B, P, C)
        r_feats[valid_mask] = d_enc(t_pcs[valid_mask])
        part_feats = r_feats
        pred_pose = torch.zeros(B, P, POSE)
        pred_pose[..., 0] = 1.0
        lengths = torch.as_tensor(NPARTS)
        for it in range(ITERS):
            if it >= 1:
                pose_feats = pose_enc(pred_pose)
                if it % 2 == 1:
                    pf_c, po_c = part_feats.clone(), pose_feats.clone()
                    for b in range(B):
                        for lst in class_list[b]:
                            if len(lst) <= 1:
                                continue
                            po_c[b, lst] = pose_feats[b, lst].max(
                                dim=-2, keepdim=True)[0]
                            pf_c[b, lst] = part_feats[b, lst].max(
                                dim=-2, keepdim=True)[0]
                    rel_net = rel_merge
                else:
                    pf_c, po_c = part_feats, pose_feats
                    rel_net = rel_dense
                f1 = po_c.unsqueeze(1).repeat(1, P, 1, 1)
                f2 = po_c.unsqueeze(2).repeat(1, 1, P, 1)
                pair = torch.cat([f1, f2], dim=-1)
                relation = rel_net(pair.view(B, P * P, -1)).view(B, P, P)
                relation_matrix = relation * t_vm
            else:
                pf_c = part_feats
                relation_matrix = t_vm
            e1 = pf_c.unsqueeze(2).repeat(1, 1, P, 1)
            e2 = pf_c.unsqueeze(1).repeat(1, P, 1, 1)
            pair = torch.cat([e1, e2], dim=-1)
            edge = edge_mlps[it](pair.view(B * P, P, -1)).view(B, P, P, -1)
            msg = (edge * relation_matrix.unsqueeze(-1)).sum(dim=2)
            msg = msg / (relation_matrix.sum(dim=-1, keepdim=True) + 1e-6)
            # GRU progressive node update (network.py:59-68, 139-143)
            gru_in = torch.cat([part_feats, msg], dim=-1)  # [B, P, 2C]
            packed = pack_padded_sequence(gru_in, lengths, batch_first=True,
                                          enforce_sorted=False)
            o, _ = rgl_grus[it](packed, torch.as_tensor(rgl_hidden[it]))
            o, _ = pad_packed_sequence(o, batch_first=True, total_length=P)
            part_feats = rgl_nodes[it](o)
            pose_in = torch.cat([part_feats, t_plabel, t_inst, pred_pose],
                                dim=-1)
            rot, trans = heads[it](pose_in)
            pred_pose = torch.cat([rot, trans], dim=-1)
        out['rgl_rot'] = rot.numpy()
        out['rgl_trans'] = trans.numpy()

    # --- composed PN-Transformer-Refine forward (network_refine.py:79-142,
    # eval): per-step transformer (with out_fc) + head clones, predicted
    # pose fed back as an additive learned positional encoding,
    # pose_pc_feat concat.  Reuses the 'enc' PointNet. ---
    from multi_part_assembly.models.pn_transformer.network_refine import \
        PosEncoder
    REFINE = 2
    poe = PosEncoder([POSE, C, C]).eval()
    r_corrs = [TransformerEncoder(d_model=C, num_heads=HEADS, ffn_dim=FFN,
                                  num_layers=LAYERS, norm_first=True,
                                  out_dim=C).eval() for _ in range(REFINE)]
    r_heads = [StocasticPoseRegressor(feat_dim=2 * C + POSE, noise_dim=0,
                                      rot_type='quat').eval()
               for _ in range(REFINE)]
    for seed, m in enumerate([poe] + r_corrs + r_heads):
        randomize(m, 700 + seed)
        quantize_f16(m)
    dump_state_f16('rf_pos', poe, out)
    for i in range(REFINE):
        dump_state_f16(f'rf_corr{i}', r_corrs[i], out)
        dump_state_f16(f'rf_head{i}', r_heads[i], out)

    with torch.no_grad():
        pc_feats = torch.zeros(B, P, C)
        pc_feats[valid_mask] = encoder(t_pcs[valid_mask])
        part_feats = pc_feats
        pose = torch.zeros(B, P, POSE)
        pose[..., 0] = 1.0
        empty = torch.zeros(B, P, 0)
        for i in range(REFINE):
            in_feats = part_feats + poe(pose)
            corr_feats = r_corrs[i](in_feats, valid_mask)
            feats = torch.cat([corr_feats, empty, empty, pose], dim=-1)
            feats = torch.cat([pc_feats, feats], dim=-1)  # pose_pc_feat
            rrot, rtrans = r_heads[i](feats)
            pose = torch.cat([rrot, rtrans], dim=-1)
            part_feats = corr_feats
        out['rf_rot'] = rrot.numpy()
        out['rf_trans'] = rtrans.numpy()

    # --- composed DGCNN forward (encoder/dgcnn.py:41-109, eval, k=20):
    # 4 EdgeConv stages (kNN graph + 1x1 conv + BN + LeakyReLU 0.2 + max
    # over k) + fuse conv5 + max||avg global pool + out_fc.  The kNN
    # SET is what matters (max over k is permutation-invariant), so the
    # fixture is robust to topk ordering ties. ---
    from multi_part_assembly.models.modules.encoder.dgcnn import DGCNN
    dg = DGCNN(feat_dim=C, global_feat=True).eval()
    randomize(dg, 900)
    quantize_f16(dg)
    dump_state_f16('dgc', dg, out)
    with torch.no_grad():
        dg_feats = dg(t_pcs[valid_mask])  # [n, C]
    out['dgc_feats'] = dg_feats.numpy()

    # --- composed PointNet2 SSG / MSG forwards (pointnet2_ssg.py:19-66,
    # pointnet2_msg.py:15-43).  The CUDA pointnet2_ops ext cannot run here;
    # its FPS / ball-query / grouping math is reimplemented below in numpy
    # with the EXACT semantics of the kernels (sampling_gpu.cu:73-233
    # iterative max-of-min from index 0 with the mag<=1e-3 padding skip,
    # ball_query_gpu.cu:13-48 first-k-in-radius with first-hit backfill)
    # and cross-checked INDEX-FOR-INDEX against ops/sampling.py on the jax
    # CPU backend before recording -- so the fixture pins both the
    # sampling-op semantics and the shared-MLP weight mapping. ---
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))  # repo root (for the jax cross-check)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from multi_part_assembly_tpu.ops.sampling import (
        ball_query as jax_ball_query,
        furthest_point_sample as jax_fps)

    def np_fps(xyz, npoint):
        """sampling_gpu.cu:73-233: slot 0 = index 0, then argmax of the
        running min squared distance (first-hit ties); near-origin points
        (|p|^2 <= 1e-3) are padding and never selected (cu:104)."""
        Bn, Nn, _ = xyz.shape
        idxs = np.zeros((Bn, npoint), np.int32)
        min_d = np.full((Bn, Nn), 1e10, np.float32)
        selectable = (xyz ** 2).sum(-1) > 1e-3
        last = np.zeros(Bn, np.int32)
        for i in range(1, npoint):
            d = ((xyz - xyz[np.arange(Bn), last][:, None]) ** 2).sum(-1)
            min_d = np.minimum(min_d, d.astype(np.float32))
            cand = np.where(selectable, min_d, -1.0)
            last = cand.argmax(-1).astype(np.int32)
            idxs[:, i] = last
        return idxs

    def np_ball_query(radius, nsample, xyz, new_xyz):
        """ball_query_gpu.cu:13-48: first nsample in-radius indices in
        ascending scan order, rows backfilled with the first hit; an empty
        ball yields row 0 (matches ops/sampling.py:79-92)."""
        x2 = (xyz ** 2).sum(-1, dtype=np.float32)
        c2 = (new_xyz ** 2).sum(-1, dtype=np.float32)
        xy = np.einsum('bmc,bnc->bmn', new_xyz.astype(np.float32),
                       xyz.astype(np.float32))
        d2 = np.maximum(c2[..., :, None] + x2[..., None, :] - 2 * xy, 0.0)
        Bn, Mn, Nn = d2.shape
        # boundary-margin guard: any pair within 3e-7 of r^2 could flip
        # membership between backends; the caller retries another seed
        margin = np.abs(d2 - radius * radius).min()
        assert margin > 3e-7, f'ball boundary margin {margin}'
        idx = np.zeros((Bn, Mn, nsample), np.int32)
        for b in range(Bn):
            for m in range(Mn):
                hits = np.nonzero(d2[b, m] < radius * radius)[0][:nsample]
                if len(hits) == 0:
                    continue
                row = np.full(nsample, hits[0], np.int32)
                row[:len(hits)] = hits
                idx[b, m] = row
        return idx

    def build_shared_mlp_eval(in_dim, dims):
        """build_shared_mlp (pointnet2_modules.py:9-19): Conv2d(k=1,
        bias=False) + BN + ReLU per layer; channels-last here so Conv2d
        1x1 becomes Linear(bias=False) -- same math, simpler dump."""
        layers = []
        d0 = in_dim
        for d in dims:
            layers += [torch.nn.Linear(d0, d, bias=False),
                       torch.nn.BatchNorm1d(d), torch.nn.ReLU()]
            d0 = d
        return torch.nn.Sequential(*layers).eval()

    def run_shared_mlp(mlp, x):
        """x: [B, M, S, C] channels-last; BN1d wants [*, C]."""
        shp = x.shape
        h = x.reshape(-1, shp[-1])
        h = mlp(h)
        return h.reshape(*shp[:-1], -1)

    def torch_sa(xyz, feats, spec, mods):
        """PointnetSAModule forward (pointnet2_modules.py:22-74) on the
        numpy sampling indices, with pre-built MLP modules `mods`."""
        if spec.get('group_all'):
            grouped = xyz[:, None]  # [B, 1, N, 3]
            if feats is not None:
                grouped = torch.cat([grouped, feats[:, None]], dim=-1)
            return None, run_shared_mlp(mods[0], grouped).max(dim=2)[0]
        npoint = spec['npoint']
        fps_idx = np_fps(xyz.numpy(), npoint)
        j_idx = np.asarray(jax_fps(jnp.asarray(xyz.numpy()), npoint))
        assert (fps_idx == j_idx).all(), 'FPS index mismatch vs ops/sampling'
        new_xyz = torch.stack([xyz[b, fps_idx[b]] for b in range(len(xyz))])
        outs = []
        for (r, s, dims), mlp in zip(
                zip(spec['radii'], spec['nsamples'], spec['mlps']), mods):
            bq = np_ball_query(r, s, xyz.numpy(), new_xyz.numpy())
            j_bq = np.asarray(jax_ball_query(
                r, s, jnp.asarray(xyz.numpy()), jnp.asarray(new_xyz.numpy())))
            assert (bq == j_bq).all(), 'ball-query mismatch vs ops/sampling'
            g_xyz = torch.stack([xyz[b][bq[b]] for b in range(len(xyz))])
            g_xyz = g_xyz - new_xyz[:, :, None]
            if feats is not None:
                g_f = torch.stack([feats[b][bq[b]] for b in range(len(xyz))])
                grouped = torch.cat([g_xyz, g_f], dim=-1)
            else:
                grouped = g_xyz  # use_xyz=True
            outs.append(run_shared_mlp(mlp, grouped).max(dim=2)[0])
        return new_xyz, torch.cat(outs, dim=-1)

    rng3 = np.random.RandomState(17)
    NP2 = 1000
    # centers away from the origin so the FPS mag<=1e-3 padding skip never
    # sits on its threshold (that skip is covered by tests/test_ops.py)
    p2_pcs = (rng3.randn(2, NP2, 3) * 0.3 +
              rng3.uniform(0.5, 1.0, (2, 1, 3))).astype(np.float32)
    out['p2_pcs'] = p2_pcs
    t_p2 = torch.as_tensor(p2_pcs)

    SSG_SPEC = [  # pointnet2_ssg.py:20-42 (use_xyz adds +3 to each in_dim)
        dict(npoint=512, radii=(0.2,), nsamples=(64,), mlps=((64, 64, 128),),
             in_dims=(3,)),
        dict(npoint=128, radii=(0.4,), nsamples=(64,),
             mlps=((128, 128, 256),), in_dims=(131,)),
        dict(mlps=((256, 512, C),), in_dims=(259,), group_all=True),
    ]
    MSG_SPEC = [  # pointnet2_msg.py:15-43
        dict(npoint=512, radii=(0.1, 0.2, 0.4), nsamples=(16, 32, 128),
             mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
             in_dims=(3, 3, 3)),
        dict(npoint=128, radii=(0.2, 0.4, 0.8), nsamples=(32, 64, 128),
             mlps=((64, 64, 128), (128, 128, 256), (128, 128, 256)),
             in_dims=(323, 323, 323)),
        dict(mlps=((256, 512, C),), in_dims=(643,), group_all=True),
    ]
    for tag, spec in (('p2s', SSG_SPEC), ('p2m', MSG_SPEC)):
        all_mods = []
        for si, sa in enumerate(spec):
            mods = []
            for mi, (ind, dims) in enumerate(zip(sa['in_dims'], sa['mlps'])):
                m = build_shared_mlp_eval(ind, dims)
                randomize(m, (2000 if tag == 'p2s' else 3000)
                          + si * 10 + mi)
                quantize_f16(m)
                dump_state_f16(f'{tag}_sa{si}_m{mi}', m, out)
                mods.append(m)
            all_mods.append(mods)
        with torch.no_grad():
            xyz, feats = t_p2, None
            for sa, mods in zip(spec, all_mods):
                xyz, feats = torch_sa(xyz, feats, sa, mods)
        out[f'{tag}_feats'] = feats[:, 0].numpy()

    # --- TRAIN-mode BN goldens: batch statistics + running-stat updates.
    # The reference normalizes with the biased batch variance but tracks
    # the UNBIASED one in running_var (torch _BatchNorm), momentum 0.1.
    # (a) PointNet over COMPACTED valid parts (the reference's dynamic
    # valid_mask path, b_global/network.py:45-54) -- pins MaskedBatchNorm's
    # weighted-stats equivalence; (b) MLP3 over all [B*P, P, 2F] pair
    # entries (BN sees padded pairs too) -- pins the mask=None path. ---
    tenc = PointNet(feat_dim=C, global_feat=True).train()
    randomize(tenc, 800)
    dump_state('tenc', tenc, out)  # PRE-run state incl. running stats
    with torch.no_grad():
        t_feats = tenc(t_pcs[valid_mask])
    out['tenc_feats'] = t_feats.numpy()
    for k, v in tenc.state_dict().items():
        if k.endswith('running_mean') or k.endswith('running_var'):
            out[f'tenc_post.{k}'] = v.numpy().copy()

    tedge = MLP3(C).train()
    randomize(tedge, 801)
    dump_state('tedge', tedge, out)
    edge_in = (rng.randn(B * P, P, 2 * C) * 0.5).astype(np.float32)
    out['tedge_in'] = edge_in
    with torch.no_grad():
        e_out = tedge(torch.as_tensor(edge_in))
    out['tedge_out'] = e_out.numpy()
    for k, v in tedge.state_dict().items():
        if k.endswith('running_mean') or k.endswith('running_var'):
            out[f'tedge_post.{k}'] = v.numpy().copy()

    np.savez(OUT, **out)
    print(f'wrote {OUT} ({len(out)} arrays)')
    print('pn_rot[0,0]:', np.round(out['pn_rot'][0, 0], 5))
    print('gl_trans[0,0]:', np.round(out['gl_trans'][0, 0], 5))


if __name__ == '__main__':
    main()
