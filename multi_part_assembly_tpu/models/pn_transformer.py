"""PN-Transformer and its iterative-refinement variant
(reference: multi_part_assembly/models/pn_transformer/network.py:9-139 and
network_refine.py:11-175)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import extract_part_feats, rot_dim_of, zero_pose
from .modules.encoders import build_encoder
from .modules.regressor import StochasticPoseRegressor
from .modules.transformer import TransformerEncoder

__all__ = ['PNTransformer', 'PNTransformerRefine']


class PNTransformer(nn.Module):
    """PointNet encoder -> transformer correlator -> stochastic pose head."""

    rot_type: str = 'quat'
    pc_feat_dim: int = 256
    encoder_arch: str = 'pointnet'
    noise_dim: int = 0
    transformer_feat_dim: int = 1024
    transformer_heads: int = 8
    transformer_layers: int = 4
    transformer_pre_ln: bool = True

    def setup(self):
        self.encoder = build_encoder(
            self.encoder_arch, self.pc_feat_dim, global_feat=True)
        self.corr_module = TransformerEncoder(
            d_model=self.pc_feat_dim, num_heads=self.transformer_heads,
            ffn_dim=self.transformer_feat_dim,
            num_layers=self.transformer_layers,
            norm_first=self.transformer_pre_ln)
        self.pose_predictor = StochasticPoseRegressor(
            noise_dim=self.noise_dim, rot_type=self.rot_type)

    def precompute(self, data_dict, train=True):
        part_pcs = data_dict['part_pcs']
        part_valids = data_dict['part_valids']
        pc_feats = extract_part_feats(self.encoder, part_pcs, part_valids,
                                      train)
        corr_feats = self.corr_module(
            pc_feats, part_valids > 0, train=train)  # [B, P, C]
        feats = jnp.concatenate(
            [corr_feats, data_dict['part_label'],
             data_dict['instance_label']], axis=-1)
        return {'pre_pose_feats': feats}

    def sample(self, feats, data_dict, train=True):
        rot, trans = self.pose_predictor(feats['pre_pose_feats'])
        return {'rot': rot, 'trans': trans}

    def __call__(self, data_dict, train=True):
        return self.sample(self.precompute(data_dict, train), data_dict,
                           train)


class _PosEncoder(nn.Module):
    """Learnable pose positional encoding (reference network_refine.py:11-25)."""

    dims: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims[:-1]):
            x = nn.relu(nn.Dense(d, name=f'fc{i}')(x))
        return nn.Dense(self.dims[-1], name=f'fc{len(self.dims) - 1}')(x)


class PNTransformerRefine(nn.Module):
    """PNTransformer with `refine_steps` cloned transformer+head stacks;
    the predicted pose feeds back as a ViT-style additive positional
    encoding (reference network_refine.py:28-175).  All steps supervised in
    training; eval takes the last step."""

    rot_type: str = 'quat'
    pc_feat_dim: int = 128
    encoder_arch: str = 'pointnet'
    noise_dim: int = 0
    transformer_feat_dim: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 2
    transformer_pre_ln: bool = True
    transformer_pos_enc: Sequence[int] = (128, 128)
    pose_pc_feat: bool = True
    refine_steps: int = 3

    def setup(self):
        self.encoder = build_encoder(
            self.encoder_arch, self.pc_feat_dim, global_feat=True)
        self.corr_modules = [
            TransformerEncoder(
                d_model=self.pc_feat_dim, num_heads=self.transformer_heads,
                ffn_dim=self.transformer_feat_dim,
                num_layers=self.transformer_layers,
                norm_first=self.transformer_pre_ln,
                out_dim=self.pc_feat_dim, name=f'corr{i}')
            for i in range(self.refine_steps)
        ]
        self.pose_predictors = [
            StochasticPoseRegressor(
                noise_dim=self.noise_dim, rot_type=self.rot_type,
                name=f'pose{i}') for i in range(self.refine_steps)
        ]
        self.corr_pos_enc = _PosEncoder(tuple(self.transformer_pos_enc))

    def precompute(self, data_dict, train=True):
        pc_feats = extract_part_feats(
            self.encoder, data_dict['part_pcs'], data_dict['part_valids'],
            train)
        return {'pc_feats': pc_feats}

    def sample(self, feats, data_dict, train=True):
        pc_feats = feats['pc_feats']
        part_valids = data_dict['part_valids']
        B, P, _ = pc_feats.shape
        zp = zero_pose(self.rot_type, pc_feats.dtype)
        pose = jnp.broadcast_to(zp, (B, P, zp.shape[0]))
        rd = rot_dim_of(self.rot_type)
        del rd

        part_feats = pc_feats
        pred_rot, pred_trans = [], []
        for i in range(self.refine_steps):
            pos_enc = self.corr_pos_enc(pose)
            in_feats = part_feats + pos_enc
            corr_feats = self.corr_modules[i](
                in_feats, part_valids > 0, train=train)
            f = jnp.concatenate(
                [corr_feats, data_dict['part_label'],
                 data_dict['instance_label'], pose], axis=-1)
            if self.pose_pc_feat:
                f = jnp.concatenate([pc_feats, f], axis=-1)
            rot, trans = self.pose_predictors[i](f)
            pred_rot.append(rot)
            pred_trans.append(trans)
            pose = jnp.concatenate([rot, trans], axis=-1)
            part_feats = corr_feats

        if train:  # all steps supervised (network_refine.py:131-135)
            return {'rot': jnp.stack(pred_rot), 'trans': jnp.stack(pred_trans)}
        return {'rot': pred_rot[-1], 'trans': pred_trans[-1]}

    def __call__(self, data_dict, train=True):
        return self.sample(self.precompute(data_dict, train), data_dict,
                           train)
