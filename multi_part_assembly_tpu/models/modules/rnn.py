"""Masked (bi)directional GRU via lax.scan.

Replaces the reference's pack_padded_sequence wrapper
(reference: multi_part_assembly/models/modules/rnn.py:6-46).  Valid entries
are always a prefix of the part axis, so masked hidden-state carry is
exactly equivalent to packing: invalid steps keep the previous hidden and
emit zeros, and the backward direction runs over the reversed sequence
where the masked carry skips the leading padding.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['MaskedGRU']


class _MaskedGRUStep(nn.Module):
    """One time step: masked GRUCell update."""

    hidden_size: int

    @nn.compact
    def __call__(self, h, inputs):
        x_t, m_t = inputs  # [B, C], [B]
        new_h, _ = nn.GRUCell(features=self.hidden_size, name='cell')(h, x_t)
        m = m_t[:, None].astype(h.dtype)
        h = m * new_h + (1.0 - m) * h
        out = m * new_h
        return h, out


def _scan_layer(module_cls, hidden_size, name):
    return nn.scan(
        module_cls,
        variable_broadcast='params',
        split_rngs={'params': False, 'dropout': False},
        in_axes=1,
        out_axes=1,
    )(hidden_size=hidden_size, name=name)


class MaskedGRU(nn.Module):
    """Multi-layer, optionally bidirectional GRU with validity masking.

    Input [B, T, C]; hidden [num_layers, num_dirs, B, H].
    Output ([B, T, H * num_dirs], last_hidden).
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0  # applied between layers, train only

    @nn.compact
    def __call__(self, x, init_hidden=None, valids=None, train=True):
        B, T, _ = x.shape
        n_dirs = 2 if self.bidirectional else 1
        if valids is None:
            mask = jnp.ones((B, T), x.dtype)
        else:
            mask = valids.astype(x.dtype)
        if init_hidden is None:
            init_hidden = jnp.zeros(
                (self.num_layers, n_dirs, B, self.hidden_size), x.dtype)

        last_hidden = []
        h_seq = x
        for layer in range(self.num_layers):
            outs = []
            for d in range(n_dirs):
                inp = h_seq if d == 0 else jnp.flip(h_seq, axis=1)
                m = mask if d == 0 else jnp.flip(mask, axis=1)
                scan = _scan_layer(_MaskedGRUStep, self.hidden_size,
                                   f'l{layer}_d{d}')
                h_last, out = scan(init_hidden[layer, d], (inp, m))
                if d == 1:
                    out = jnp.flip(out, axis=1)
                outs.append(out)
                last_hidden.append(h_last)
            h_seq = jnp.concatenate(outs, axis=-1) if n_dirs > 1 else outs[0]
            if self.dropout > 0 and layer < self.num_layers - 1:
                h_seq = nn.Dropout(
                    self.dropout, deterministic=not train)(h_seq)

        last_hidden = jnp.stack(last_hidden, axis=0).reshape(
            self.num_layers, n_dirs, B, self.hidden_size)
        return h_seq, last_hidden
