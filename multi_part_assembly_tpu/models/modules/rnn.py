"""Masked (bi)directional GRU via lax.scan, with fused projections.

Replaces the reference's pack_padded_sequence wrapper
(reference: multi_part_assembly/models/modules/rnn.py:6-46).  Valid entries
are always a prefix of the part axis, so masked hidden-state carry is
exactly equivalent to packing: invalid steps keep the previous hidden and
emit zeros, and the backward direction runs over the reversed sequence
where the masked carry skips the leading padding.

TPU layout: a naive per-step GRUCell issues six skinny [B, C] @ [C, H]
matmuls per scan step (B=32 uses <1/4 of the MXU's rows and each matmul
pays dispatch overhead).  FusedGRUCell keeps the torch/flax gate math but
(a) packs the three input projections into ONE [C, 3H] matmul that is
hoisted OUT of the scan (one [B*T, C] @ [C, 3H] pass for the whole
sequence), and (b) packs the three hidden projections into one [H, 3H]
matmul, so the sequential chain is one matmul + gate VPU math per step.
Gate column order is r|z|n, matching torch's weight_ih/weight_hh row
packing, which keeps weight transplants a pure concat.
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ['MaskedGRU', 'FusedGRUCell']


class FusedGRUCell(nn.Module):
    """GRU cell with fused gate projections (column order r|z|n).

    Identical math to flax nn.GRUCell / torch nn.GRUCell:
        r = sigmoid(x W_ir + b_ir' + h W_hr)
        z = sigmoid(x W_iz + b_iz' + h W_hz)
        n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
        h' = (1 - z) n + z h
    where b_i*' merges torch's b_ih + b_hh for the r/z gates (those
    linears are summed, so the split is unobservable); the n gate keeps
    its two biases apart because r multiplies the hidden linear.

    `project(x)` computes the input half (callable on a whole [B, T, C]
    sequence, one MXU pass); `apply_proj(h, xp)` runs one recurrent step
    from a precomputed projection.  `__call__(h, x)` does both.
    """

    features: int

    def setup(self):
        f = self.features
        self.wi = nn.Dense(3 * f)  # input proj, merged r/z biases
        self.wh = nn.Dense(3 * f, use_bias=False,
                           kernel_init=nn.initializers.orthogonal())
        self.bhn = self.param('bhn', nn.initializers.zeros, (f,))

    def project(self, x):
        return self.wi(x)

    def apply_proj(self, h, xp):
        hp = self.wh(h)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * (hn + self.bhn))
        return (1.0 - z) * n + z * h

    def __call__(self, h, x):
        return self.apply_proj(h, self.project(x))


def _masked_step(cell, h, xs):
    """One masked recurrence step from a precomputed input projection."""
    xp_t, m_t = xs  # [B, 3H], [B]
    new_h = cell.apply_proj(h, xp_t)
    m = m_t[:, None].astype(h.dtype)
    h = m * new_h + (1.0 - m) * h
    return h, m * new_h


_scan_steps = nn.scan(
    _masked_step,
    variable_broadcast='params',
    split_rngs={'params': False, 'dropout': False},
    in_axes=1,
    out_axes=1,
)


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
                cell = FusedGRUCell(self.hidden_size, name=f'l{layer}_d{d}')
                xp = cell.project(inp)  # [B, T, 3H] in one matmul
                h_last, out = _scan_steps(cell, init_hidden[layer, d],
                                          (xp, m))
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
