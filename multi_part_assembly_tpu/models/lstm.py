"""B-LSTM: Bi-GRU seq2seq assembly model (PQ-Net style)
(reference: multi_part_assembly/models/b_lstm/network.py + seq2seq.py).

The reference's autoregressive decoder is a Python loop with per-step
teacher forcing (seq2seq.py:177-189) and hardcoded .cuda() calls; here the
decoder is an nn.scan over the part axis with the teacher-forcing draw as a
traced bernoulli, so the whole model stays inside one compiled step.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import extract_part_feats
from .modules.encoders import build_encoder
from .modules.regressor import StochasticPoseRegressor
from .modules.rnn import FusedGRUCell, MaskedGRU

__all__ = ['LSTMModel', 'Seq2Seq']


class _DecoderStep(nn.Module):
    """One autoregressive decoder step: 2-layer GRU + output head
    (reference seq2seq.py:57-124)."""

    input_size: int
    hidden_size: int
    train: bool = True

    @nn.compact
    def __call__(self, carry, target_t, teacher_force):
        h1, h2, prev_out = carry  # target_t: [B, C]; teacher_force: [] bool
        inp = jnp.where(teacher_force, target_t,
                        jax.lax.stop_gradient(prev_out))
        # decoder-input dropout (seq2seq.py:109, dropout_i=0.2).  The
        # reference wraps this in LockedDropout (seq2seq.py:226-237), but
        # its decoder is invoked once PER STEP with a length-1 sequence
        # (seq2seq.py:180-188), so the "locked" mask is redrawn every step
        # anyway -- fresh per-step masks here (split_rngs dropout=True)
        # match the reference's actual behavior exactly.
        inp = nn.Dropout(0.2, deterministic=not self.train,
                         name='drop_i')(inp)
        nh1 = FusedGRUCell(features=self.hidden_size, name='cell0')(h1, inp)
        mid = nn.Dropout(0.2, deterministic=not self.train,
                         name='drop_mid')(nh1)  # torch inter-layer dropout
        nh2 = FusedGRUCell(features=self.hidden_size, name='cell1')(h2, mid)
        # output head reads the FIRST layer's hidden (seq2seq.py:115-118).
        # The reference's linear1 is Linear -> nn.LeakyReLU(True) -> Linear
        # (seq2seq.py:84-88); LeakyReLU's first positional arg is
        # negative_slope, so True == slope 1.0 == the IDENTITY -- the
        # published model has NO activation here.  Matched exactly (two
        # Linears, no activation) for weight-transplant parity.
        oc = nn.Dense(256, name='lin1a')(nh1)
        out_code = nn.Dense(self.input_size, name='lin1b')(oc)
        st = nn.Dense(128, name='lin3a')(nh1)
        st = nn.relu(st)
        st = nn.Dropout(0.2, deterministic=not self.train, name='drop_s')(st)
        stop_sign = nn.Dense(1, name='lin3b')(st)
        return (nh1, nh2, out_code), (out_code, stop_sign)


class Seq2Seq(nn.Module):
    """2-layer Bi-GRU encoder + autoregressive GRU decoder with teacher
    forcing and 16-d noise in the hidden state (reference seq2seq.py:126-223)."""

    feat_dim: int
    hidden_size: int = 256
    noise_dim: int = 16
    teacher_forcing_ratio: float = 0.5

    @nn.compact
    def __call__(self, input_seq, target_seq, valids=None, train=True,
                 hidden_noise=None):
        """input_seq/target_seq: [B, P, C].  Returns [B, P, C] outputs.

        `hidden_noise` overrides the [2, B, noise_dim] decoder hidden
        noise (reference seq2seq.py:211-220 draws it via np.random) --
        used for reproducible eval and weight-transplant parity tests."""
        B, P, C = input_seq.shape
        # --- encoder ---
        _, hidden = MaskedGRU(
            hidden_size=self.hidden_size, num_layers=2, bidirectional=True,
            dropout=0.2, name='encoder')(input_seq, None, valids, train)
        # [2 layers, 2 dirs, B, H] -> concat dirs -> [2, B, 2H]
        enc_hidden = jnp.concatenate([hidden[:, 0], hidden[:, 1]], axis=-1)
        if hidden_noise is None:
            hidden_noise = jax.random.normal(
                self.make_rng('noise'), (2, B, self.noise_dim),
                input_seq.dtype)
        dec_hidden = jnp.concatenate([enc_hidden, hidden_noise], axis=-1)

        # --- decoder ---
        teacher_force = jax.random.bernoulli(
            self.make_rng('noise'), self.teacher_forcing_ratio) if train \
            else jnp.asarray(False)
        dec_size = self.hidden_size * 2 + self.noise_dim
        scan = nn.scan(
            _DecoderStep,
            variable_broadcast='params',
            split_rngs={'params': False, 'dropout': True},
            in_axes=(1, nn.broadcast),
            out_axes=1,
        )(input_size=C, hidden_size=dec_size, train=train, name='decoder')
        init = (dec_hidden[0], dec_hidden[1],
                jnp.zeros((B, C), input_seq.dtype))
        _, (outputs, stop_signs) = scan(init, target_seq, teacher_force)
        return outputs, stop_signs  # [B, P, C], [B, P, 1]


class LSTMModel(nn.Module):
    rot_type: str = 'quat'
    pc_feat_dim: int = 128
    encoder_arch: str = 'pointnet'
    noise_dim: int = 32
    lstm_hidden_size: int = 256

    def setup(self):
        self.encoder = build_encoder(
            self.encoder_arch, self.pc_feat_dim, global_feat=True)
        self.seq2seq = Seq2Seq(
            feat_dim=self.pc_feat_dim, hidden_size=self.lstm_hidden_size)
        self.pose_predictor = StochasticPoseRegressor(
            noise_dim=self.noise_dim, rot_type=self.rot_type)

    def precompute(self, data_dict, train=True):
        part_feats = extract_part_feats(
            self.encoder, data_dict['part_pcs'], data_dict['part_valids'],
            train)
        return {'part_feats': part_feats}

    def sample(self, feats, data_dict, train=True):
        part_feats = feats['part_feats']
        target_seq = jax.lax.stop_gradient(part_feats)
        output_seq, _ = self.seq2seq(
            part_feats, target_seq, valids=data_dict['part_valids'],
            train=train)
        f = jnp.concatenate(
            [output_seq, data_dict['part_label'],
             data_dict['instance_label']], axis=-1)
        rot, trans = self.pose_predictor(f)
        return {'rot': rot, 'trans': trans}

    def __call__(self, data_dict, train=True):
        return self.sample(self.precompute(data_dict, train), data_dict,
                           train)
