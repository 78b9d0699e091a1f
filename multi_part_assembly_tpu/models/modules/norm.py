"""Masked BatchNorm for fixed-shape padded batches.

The reference runs its BN-heavy encoders only on valid parts by boolean
indexing (`part_pcs[valid_mask]`, e.g. b_global/network.py:45-54), which is
a dynamic shape.  On TPU we keep the padded [B*P, ...] layout and instead
compute the batch statistics as *weighted* moments with the validity mask,
which is numerically identical to BN over the compacted valid set and keeps
every shape static.

Under pjit with the batch axis sharded, the jnp means are global means (XLA
inserts the cross-replica collectives), i.e. sync-BN semantics; the
reference's per-GPU DDP BN is a noisier estimate of the same thing.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
from numpy import prod as np_prod

__all__ = ['MaskedBatchNorm']


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d/2d equivalent with an optional validity mask.

    Stats reduce over every axis except the last (channel) axis, weighted by
    `mask` (broadcastable to x's shape minus the channel dim).
    """

    momentum: float = 0.9  # running = momentum * old + (1 - momentum) * new
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        features = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features, ))
        ra_var = self.variable('batch_stats', 'var',
                               lambda s: jnp.ones(s, jnp.float32),
                               (features, ))
        scale = self.param('scale', nn.initializers.ones, (features, ))
        bias = self.param('bias', nn.initializers.zeros, (features, ))

        if train:
            # statistics always in f32, even for bf16 activations
            xs = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(xs, axis=reduce_axes)
                var = jnp.mean((xs - mean)**2, axis=reduce_axes)
                denom = jnp.asarray(float(np_prod(x.shape[:-1])), jnp.float32)
            else:
                w = jnp.broadcast_to(mask[..., None].astype(jnp.float32),
                                     xs.shape)
                denom = jnp.maximum(jnp.sum(w, axis=reduce_axes), 1.0)
                mean = jnp.sum(xs * w, axis=reduce_axes) / denom
                var = jnp.sum(w * (xs - mean)**2, axis=reduce_axes) / denom
            if not self.is_initializing():
                # torch BatchNorm normalizes with the BIASED variance but
                # tracks the UNBIASED one in running_var (torch BN docs /
                # _BatchNorm.forward); match exactly so eval after
                # training agrees with the reference
                var_track = var * denom / jnp.maximum(denom - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1.0 - self.momentum) * var_track
        else:
            mean, var = ra_mean.value, ra_var.value

        factor = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        offset = (bias - mean * scale *
                  jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        return x * factor + offset
