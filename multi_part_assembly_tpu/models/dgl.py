"""DGL: dynamic graph learning assembly model (NeurIPS'20)
(reference: multi_part_assembly/models/dgl/network.py + modules.py).

TPU notes: the reference builds per-shape equivalence class lists on the
CPU with numpy loops (network.py:76-88) and merges node features with a
Python loop (network.py:101-119).  Here both are dense masked reductions
over the [B, P, P] equality matrix -- fully traced, no host sync.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..utils.precision import compute_dtype as _global_compute_dtype
from .base import extract_part_feats, zero_pose
from .modules.encoders import build_encoder
from .modules.norm import MaskedBatchNorm
from .modules.regressor import StochasticPoseRegressor

__all__ = ['DGLModel', 'RelationNet', 'PoseEncoder', 'EdgeMLP', 'NodeMLP',
           'merge_equiv_nodes']


class EdgeMLP(nn.Module):
    """MLP3: pairwise-concat -> 512 -> 512 -> F with BN
    (reference dgl/modules.py:5-31).  The P x P pair matmuls are the
    model's FLOP bulk and ride the global bf16 switch (the reference
    trains under fp16 AMP); BN stats stay f32."""

    feat_dim: int

    @nn.compact
    def __call__(self, x, train=True):
        cdt = _global_compute_dtype()
        x = x.astype(cdt)
        for i, d in enumerate((512, 512, self.feat_dim)):
            x = nn.Dense(d, dtype=cdt, name=f'conv{i + 1}')(x)
            x = MaskedBatchNorm(name=f'bn{i + 1}')(x, None, train)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class NodeMLP(nn.Module):
    """MLP4: node aggregation MLP with BN (reference dgl/modules.py:34-60;
    rgl_net/modules.py:5-31 has no final ReLU)."""

    feat_dim: int
    final_relu: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        cdt = _global_compute_dtype()
        x = x.astype(cdt)
        for i, d in enumerate((512, 512, self.feat_dim)):
            x = nn.Dense(d, dtype=cdt, name=f'conv{i + 1}')(x)
            x = MaskedBatchNorm(name=f'bn{i + 1}')(x, None, train)
            if i < 2 or self.final_relu:
                x = nn.relu(x)
        return x.astype(jnp.float32)


class RelationNet(nn.Module):
    """Pairwise pose-feature -> sigmoid relation weight
    (reference dgl/modules.py:63-75)."""

    @nn.compact
    def __call__(self, x):
        cdt = _global_compute_dtype()
        x = x.astype(cdt)
        x = nn.relu(nn.Dense(256, dtype=cdt, name='mlp1')(x))
        x = nn.relu(nn.Dense(512, dtype=cdt, name='mlp2')(x))
        return nn.sigmoid(
            nn.Dense(1, dtype=cdt, name='mlp3')(x).astype(jnp.float32))


class PoseEncoder(nn.Module):
    """pose -> 256 -> 128 features (reference dgl/modules.py:78-87)."""

    @nn.compact
    def __call__(self, x):
        cdt = _global_compute_dtype()
        x = x.astype(cdt)
        x = nn.relu(nn.Dense(256, dtype=cdt, name='mlp1')(x))
        return nn.relu(
            nn.Dense(128, dtype=cdt, name='mlp2')(x)).astype(jnp.float32)


def merge_equiv_nodes(feats, part_ids, valids):
    """Max-pool features among geometrically-equivalent parts.

    Dense equivalent of the reference's class_list loop
    (dgl/network.py:101-119): parts i, j are equivalent iff they share
    `part_ids` and both are valid; each part takes the max over its class.
    """
    P = feats.shape[1]
    eq = (part_ids[:, :, None] == part_ids[:, None, :]) & \
        (valids[:, :, None] > 0) & (valids[:, None, :] > 0)
    eq = eq | jnp.eye(P, dtype=bool)[None]  # self always included
    masked = jnp.where(eq[..., None], feats[:, None, :, :], -jnp.inf)
    return jnp.max(masked, axis=2)


class DGLModel(nn.Module):
    rot_type: str = 'quat'
    pc_feat_dim: int = 128
    encoder_arch: str = 'pointnet'
    noise_dim: int = 32
    gnn_iter: int = 3
    merge_node: bool = True
    semantic: bool = True

    def setup(self):
        self.encoder = build_encoder(
            self.encoder_arch, self.pc_feat_dim, global_feat=True)
        self.edge_mlps = [
            EdgeMLP(self.pc_feat_dim, name=f'edge_mlp{i}')
            for i in range(self.gnn_iter)
        ]
        self.node_mlps = self._make_node_mlps()
        self.pose_predictors = [
            StochasticPoseRegressor(
                noise_dim=self.noise_dim, rot_type=self.rot_type,
                name=f'pose{i}') for i in range(self.gnn_iter)
        ]
        self.relation_predictor_dense = RelationNet(name='relation_dense')
        if self.merge_node:
            self.relation_predictor = RelationNet(name='relation_merge')
        self.pose_extractor = PoseEncoder(name='pose_extractor')

    def _make_node_mlps(self):
        return [
            NodeMLP(self.pc_feat_dim, final_relu=True, name=f'node_mlp{i}')
            for i in range(self.gnn_iter)
        ]

    def precompute(self, data_dict, train=True):
        part_feats = extract_part_feats(
            self.encoder, data_dict['part_pcs'], data_dict['part_valids'],
            train)
        return {'part_feats': part_feats}

    def _update_relation(self, pose_feats, iter_ind, train):
        """RelationNet over pairwise pose-feature concat
        (reference dgl/network.py:121-133)."""
        B, P, _ = pose_feats.shape
        f1 = jnp.broadcast_to(pose_feats[:, None, :, :],
                              (B, P, P, pose_feats.shape[-1]))
        f2 = jnp.broadcast_to(pose_feats[:, :, None, :],
                              (B, P, P, pose_feats.shape[-1]))
        pair = jnp.concatenate([f1, f2], axis=-1)
        if self.merge_node and iter_ind % 2 == 1:
            rel = self.relation_predictor(pair)
        else:
            rel = self.relation_predictor_dense(pair)
        return rel[..., 0]  # [B, P, P]

    def _message_passing(self, part_feats, relation_matrix, iter_ind, train):
        """Edge MLP over all pairs, relation-weighted mean
        (reference dgl/network.py:135-152)."""
        B, P, F = part_feats.shape
        f1 = jnp.broadcast_to(part_feats[:, :, None, :], (B, P, P, F))
        f2 = jnp.broadcast_to(part_feats[:, None, :, :], (B, P, P, F))
        pair = jnp.concatenate([f1, f2], axis=-1)
        edge = self.edge_mlps[iter_ind](pair, train)  # [B, P, P, F]
        msg = jnp.sum(edge * relation_matrix[..., None], axis=2)
        norm = jnp.sum(relation_matrix, axis=-1, keepdims=True)
        return msg / (norm + 1e-6)

    def _node_update(self, part_feats, messages, valids, iter_ind, train):
        node_feats = jnp.concatenate([messages, part_feats], axis=-1)
        return self.node_mlps[iter_ind](node_feats, train)

    def sample(self, feats, data_dict, train=True):
        part_feats = feats['part_feats']
        valids = data_dict['part_valids']
        valid_matrix = data_dict['valid_matrix']
        part_label = data_dict['part_label']
        instance_label = data_dict['instance_label']
        part_ids = data_dict['part_ids']
        B, P, _ = part_feats.shape

        zp = zero_pose(self.rot_type, part_feats.dtype)
        pred_pose = jnp.broadcast_to(zp, (B, P, zp.shape[0]))

        all_rot, all_trans = [], []
        for it in range(self.gnn_iter):
            if it >= 1:
                pose_feats = self.pose_extractor(pred_pose)
                if self.merge_node and self.semantic and it % 2 == 1:
                    part_feats_c = merge_equiv_nodes(part_feats, part_ids,
                                                     valids)
                    pose_feats_c = merge_equiv_nodes(pose_feats, part_ids,
                                                     valids)
                else:
                    part_feats_c, pose_feats_c = part_feats, pose_feats
                relation = self._update_relation(pose_feats_c, it, train)
                relation_matrix = relation * valid_matrix
            else:
                part_feats_c = part_feats
                relation_matrix = valid_matrix

            messages = self._message_passing(part_feats_c, relation_matrix,
                                             it, train)
            part_feats = self._node_update(part_feats, messages, valids, it,
                                           train)

            pose_in = jnp.concatenate(
                [part_feats, part_label, instance_label, pred_pose], axis=-1)
            rot, trans = self.pose_predictors[it](pose_in)
            pred_pose = jnp.concatenate([rot, trans], axis=-1)
            all_rot.append(rot)
            all_trans.append(trans)

        if train:  # all iterations supervised (dgl/network.py:284-293)
            return {'rot': jnp.stack(all_rot), 'trans': jnp.stack(all_trans)}
        return {'rot': all_rot[-1], 'trans': all_trans[-1]}

    def __call__(self, data_dict, train=True):
        return self.sample(self.precompute(data_dict, train), data_dict,
                           train)
