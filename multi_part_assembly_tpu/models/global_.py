"""B-Global: shared part PointNet + whole-shape PointNet -> stochastic MLP
pose head (reference: multi_part_assembly/models/b_global/network.py:7-133)."""

import flax.linen as nn
import jax.numpy as jnp

from .base import extract_part_feats
from .modules.encoders import build_encoder
from .modules.regressor import StochasticPoseRegressor

__all__ = ['GlobalModel']


class GlobalModel(nn.Module):
    rot_type: str = 'quat'
    pc_feat_dim: int = 128
    encoder_arch: str = 'pointnet'
    noise_dim: int = 32

    def setup(self):
        self.encoder = build_encoder(
            self.encoder_arch, self.pc_feat_dim, global_feat=True)
        self.global_encoder = build_encoder(
            self.encoder_arch, self.pc_feat_dim, global_feat=True)
        self.pose_predictor = StochasticPoseRegressor(
            noise_dim=self.noise_dim, rot_type=self.rot_type)

    def precompute(self, data_dict, train=True):
        part_pcs = data_dict['part_pcs']
        part_valids = data_dict['part_valids']
        B, P, N, _ = part_pcs.shape
        pc_feats = extract_part_feats(self.encoder, part_pcs, part_valids,
                                      train)
        # whole-shape feature: all points incl. padded zeros, as in the
        # reference (b_global/network.py:57-61 -- no masking there)
        global_feats = self.global_encoder(
            part_pcs.reshape(B, P * N, 3), mask=None, train=train)
        global_feats = jnp.broadcast_to(global_feats[:, None, :],
                                        (B, P, self.pc_feat_dim))
        feats = jnp.concatenate(
            [global_feats, pc_feats, data_dict['part_label'],
             data_dict['instance_label']], axis=-1)
        return {'pre_pose_feats': feats}

    def sample(self, feats, data_dict, train=True):
        rot, trans = self.pose_predictor(feats['pre_pose_feats'])
        return {'rot': rot, 'trans': trans}

    def __call__(self, data_dict, train=True):
        return self.sample(self.precompute(data_dict, train), data_dict,
                           train)
