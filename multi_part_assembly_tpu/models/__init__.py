"""Model zoo + factory (reference: multi_part_assembly/models/__init__.py:10-26)."""

from .base import extract_part_feats, rot_dim_of, zero_pose
from .dgl import DGLModel
from .global_ import GlobalModel
from .identity import IdentityModel
from .lstm import LSTMModel, Seq2Seq
from .modules.encoders import (DGCNN, PointNet, PointNet2MSG, PointNet2SSG,
                               build_encoder)
from .modules.norm import MaskedBatchNorm
from .modules.regressor import (PoseRegressor, StochasticPoseRegressor,
                                normalize_rot6d)
from .modules.rnn import MaskedGRU
from .modules.transformer import TransformerEncoder
from .pn_transformer import PNTransformer, PNTransformerRefine
from .rgl_net import RGLNet

__all__ = [
    'build_model', 'IdentityModel', 'GlobalModel', 'LSTMModel', 'DGLModel',
    'RGLNet', 'PNTransformer', 'PNTransformerRefine', 'build_encoder',
    'PointNet', 'DGCNN', 'PointNet2SSG', 'PointNet2MSG', 'MaskedBatchNorm',
    'PoseRegressor', 'StochasticPoseRegressor', 'normalize_rot6d',
    'MaskedGRU', 'TransformerEncoder', 'Seq2Seq', 'zero_pose', 'rot_dim_of',
    'extract_part_feats',
]


def build_model(cfg):
    """Instantiate a model Module from a composed config."""
    name = cfg.model.name
    rot_type = cfg.model.rot_type
    semantic = cfg.data.dataset != 'geometry'
    noise_dim = cfg.loss.noise_dim

    if name == 'identity':
        return IdentityModel(rot_type=rot_type)
    if name == 'global':
        return GlobalModel(
            rot_type=rot_type, pc_feat_dim=cfg.model.pc_feat_dim,
            encoder_arch=cfg.model.encoder, noise_dim=noise_dim)
    if name == 'lstm':
        return LSTMModel(
            rot_type=rot_type, pc_feat_dim=cfg.model.pc_feat_dim,
            encoder_arch=cfg.model.encoder, noise_dim=noise_dim,
            lstm_hidden_size=cfg.model.lstm_hidden_size)
    if name == 'dgl':
        return DGLModel(
            rot_type=rot_type, pc_feat_dim=cfg.model.pc_feat_dim,
            encoder_arch=cfg.model.encoder, noise_dim=noise_dim,
            gnn_iter=cfg.model.gnn_iter, merge_node=cfg.model.merge_node,
            semantic=semantic)
    if name == 'rgl_net':
        return RGLNet(
            rot_type=rot_type, pc_feat_dim=cfg.model.pc_feat_dim,
            encoder_arch=cfg.model.encoder, noise_dim=noise_dim,
            gnn_iter=cfg.model.gnn_iter, merge_node=cfg.model.merge_node,
            semantic=semantic)
    if name == 'pn_transformer':
        return PNTransformer(
            rot_type=rot_type, pc_feat_dim=cfg.model.pc_feat_dim,
            encoder_arch=cfg.model.encoder, noise_dim=noise_dim,
            transformer_feat_dim=cfg.model.transformer_feat_dim,
            transformer_heads=cfg.model.transformer_heads,
            transformer_layers=cfg.model.transformer_layers,
            transformer_pre_ln=cfg.model.transformer_pre_ln)
    if name == 'pn_transformer_refine':
        return PNTransformerRefine(
            rot_type=rot_type, pc_feat_dim=cfg.model.pc_feat_dim,
            encoder_arch=cfg.model.encoder, noise_dim=noise_dim,
            transformer_feat_dim=cfg.model.transformer_feat_dim,
            transformer_heads=cfg.model.transformer_heads,
            transformer_layers=cfg.model.transformer_layers,
            transformer_pre_ln=cfg.model.transformer_pre_ln,
            transformer_pos_enc=tuple(cfg.model.transformer_pos_enc),
            pose_pc_feat=cfg.model.pose_pc_feat,
            refine_steps=cfg.model.refine_steps)
    raise NotImplementedError(f'Model {name} not supported')
