"""RGL-Net: DGL + per-iteration bidirectional GRU over the part sequence
(reference: multi_part_assembly/models/rgl_net/network.py + modules.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .dgl import DGLModel, NodeMLP
from .modules.rnn import MaskedGRU

__all__ = ['RGLNet']


class RGLNet(DGLModel):
    # test hook: [gnn_iter, 1, 2, B, 2F] per-iteration GRU init hiddens
    # (the reference draws them via torch.randn each forward,
    # network.py:50-57); used by the weight-transplant parity golden
    hidden_noise_override: jnp.ndarray = None

    def setup(self):
        super().setup()
        self.grus = [
            MaskedGRU(hidden_size=self.pc_feat_dim * 2, num_layers=1,
                      bidirectional=True, name=f'gru{i}')
            for i in range(self.gnn_iter)
        ]

    def _make_node_mlps(self):
        # input is the 4F GRU output; RGL's MLP4 has no final ReLU
        # (rgl_net/modules.py:24-31)
        return [
            NodeMLP(self.pc_feat_dim, final_relu=False, name=f'node_mlp{i}')
            for i in range(self.gnn_iter)
        ]

    def _init_gru_hidden(self, B, dtype, iter_ind):
        """Random init hidden: both directions share one random vector in the
        first half, fresh gaussians in the second (reference
        rgl_net/network.py:50-57 -- `zero_vec` is actually randn)."""
        if self.hidden_noise_override is not None:
            return self.hidden_noise_override[iter_ind].astype(dtype)
        key = self.make_rng('noise')
        k1, k2 = jax.random.split(key)
        rand_vec = jax.random.normal(k1, (1, 1, B, self.pc_feat_dim), dtype)
        rand_vec = jnp.broadcast_to(rand_vec, (1, 2, B, self.pc_feat_dim))
        other = jax.random.normal(k2, (1, 2, B, self.pc_feat_dim), dtype)
        return jnp.concatenate([rand_vec, other], axis=-1)  # [1, 2, B, 2F]

    def _node_update(self, part_feats, messages, valids, iter_ind, train):
        """GRU over [part_feats, messages] then node MLP
        (reference rgl_net/network.py:59-68, 139-143)."""
        B = part_feats.shape[0]
        gru_in = jnp.concatenate([part_feats, messages], axis=-1)  # [B,P,2F]
        init_hidden = self._init_gru_hidden(B, part_feats.dtype, iter_ind)
        gru_out, _ = self.grus[iter_ind](
            gru_in, init_hidden, valids=valids, train=train)  # [B, P, 4F]
        return self.node_mlps[iter_ind](gru_out, train)
