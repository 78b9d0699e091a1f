"""Identity baseline: always predicts the identity pose
(reference: multi_part_assembly/models/b_identity/network.py:4-59)."""

import flax.linen as nn
import jax.numpy as jnp

from .base import rot_dim_of, zero_pose

__all__ = ['IdentityModel']


class IdentityModel(nn.Module):
    rot_type: str = 'quat'

    def precompute(self, data_dict, train=True):
        return {}

    def sample(self, feats, data_dict, train=True):
        part_pcs = data_dict['part_pcs']
        B, P = part_pcs.shape[:2]
        zp = zero_pose(self.rot_type, part_pcs.dtype)
        rd = rot_dim_of(self.rot_type)
        rot = jnp.broadcast_to(zp[:rd], (B, P, rd))
        trans = jnp.broadcast_to(zp[rd:], (B, P, 3))
        return {'rot': rot, 'trans': trans}

    # a param so init/optimizers have a non-empty tree; never used
    @nn.compact
    def __call__(self, data_dict, train=True):
        self.param('dummy', nn.initializers.zeros, (1, ))
        return self.sample(self.precompute(data_dict, train), data_dict,
                           train)
