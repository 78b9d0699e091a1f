"""Masked BatchNorm for fixed-shape padded batches.

The reference runs its BN-heavy encoders only on valid parts by boolean
indexing (`part_pcs[valid_mask]`, e.g. b_global/network.py:45-54), which is
a dynamic shape.  On TPU we keep the padded [B*P, ...] layout and instead
compute the batch statistics as *weighted* moments with the validity mask,
which is numerically identical to BN over the compacted valid set and keeps
every shape static.

Under pjit with the batch axis sharded, the jnp means are global means (XLA
inserts the cross-replica collectives), i.e. sync-BN semantics; the
reference's per-GPU DDP BN is a noisier estimate of the same thing.  For
strict parity studies `set_bn_groups(D)` (cfg.exp.sync_bn = False via the
Trainer) switches train-mode statistics to per-data-shard groups: the
leading batch axis splits into D blocks that each normalize with their own
moments -- exactly torch DDP's per-GPU BN when D is the mesh data-axis
size (the blocks are the per-device shards, so the grouped reductions are
also comms-free).  Running stats then track the ACROSS-GROUP MEAN of the
per-group moments (torch DDP keeps per-rank stats and checkpoints rank
0's; averaging is the single-set equivalent -- documented deviation).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
from numpy import prod as np_prod

__all__ = ['MaskedBatchNorm', 'set_bn_groups', 'bn_groups']

_BN_GROUPS = 1


def set_bn_groups(n):
    """Number of per-batch statistic groups for train-mode BN (1 = sync-BN
    over the global batch, the default; D = per-replica BN parity)."""
    global _BN_GROUPS
    _BN_GROUPS = max(1, int(n))


def bn_groups():
    return _BN_GROUPS


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d/2d equivalent with an optional validity mask.

    Stats reduce over every axis except the last (channel) axis, weighted by
    `mask` (broadcastable to x's shape minus the channel dim).
    """

    momentum: float = 0.9  # running = momentum * old + (1 - momentum) * new
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train=True, stats=None,
                 affine_only=False):
        """Normalize x, or hand back the affine for external application.

        stats: optional (mean, var, denom) computed by the CALLER (each
            [C] / [C] / scalar, f32).  The memory-bounded chunked encoder
            paths accumulate the batch moments block-by-block and inject
            them here so running-stat tracking and the affine stay in one
            place; per-replica group stats (set_bn_groups) do not apply
            to injected stats.
        affine_only: return (factor, offset) f32 [C] arrays instead of
            normalizing x (x then only supplies the channel count).
        """
        features = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features, ))
        ra_var = self.variable('batch_stats', 'var',
                               lambda s: jnp.ones(s, jnp.float32),
                               (features, ))
        scale = self.param('scale', nn.initializers.ones, (features, ))
        bias = self.param('bias', nn.initializers.zeros, (features, ))

        g = _BN_GROUPS if train and not self.is_initializing() else 1
        if g > 1 and stats is not None:
            # injected stats are global by construction; per-replica
            # grouping cannot apply to them (chunked-encoder limitation)
            import warnings
            warnings.warn('MaskedBatchNorm: injected stats override the '
                          'per-replica BN groups; using sync statistics')
            g = 1
        if g > 1 and x.shape[0] % g:
            # batch axis not divisible into shard groups: fall back to
            # sync stats -- but say so, or sync_bn=False parity quietly
            # does not apply (ADVICE r4)
            import warnings
            warnings.warn(
                f'MaskedBatchNorm: leading axis {x.shape[0]} not divisible '
                f'into {g} per-replica groups; using sync statistics')
            g = 1
        if train and g > 1:
            # per-replica BN parity (module docstring): per-group moments
            # over [g, B0/g, ...] blocks of the leading (data-sharded) axis
            xs = x.astype(jnp.float32).reshape((g, -1) + x.shape[1:])
            reduce_axes = tuple(range(1, xs.ndim - 1))
            stat_shape = (g, ) + (1, ) * (xs.ndim - 2) + (xs.shape[-1], )
            if mask is None:
                mean = jnp.mean(xs, axis=reduce_axes)  # [g, C]
                var = jnp.mean((xs - mean.reshape(stat_shape))**2,
                               axis=reduce_axes)
                denom = jnp.full((g, 1), float(np_prod(xs.shape[1:-1])),
                                 jnp.float32)
            else:
                w = jnp.broadcast_to(
                    mask[..., None].astype(jnp.float32),
                    x.shape[:-1] + (1, )).reshape(
                        (g, -1) + x.shape[1:-1] + (1, ))
                denom = jnp.maximum(jnp.sum(w, axis=reduce_axes), 1.0)
                mean = jnp.sum(xs * w, axis=reduce_axes) / denom
                var = jnp.sum(w * (xs - mean.reshape(stat_shape))**2,
                              axis=reduce_axes) / denom
            var_track = var * denom / jnp.maximum(denom - 1.0, 1.0)
            ra_mean.value = self.momentum * ra_mean.value + \
                (1.0 - self.momentum) * jnp.mean(mean, axis=0)
            ra_var.value = self.momentum * ra_var.value + \
                (1.0 - self.momentum) * jnp.mean(var_track, axis=0)
            factor = (scale * jax.lax.rsqrt(var + self.epsilon)) \
                .reshape(stat_shape)
            offset = (bias - mean * scale *
                      jax.lax.rsqrt(var + self.epsilon)).reshape(stat_shape)
            xg = x.reshape((g, -1) + x.shape[1:])
            out = xg * factor.astype(x.dtype) + offset.astype(x.dtype)
            return out.reshape(x.shape)
        if train and stats is not None:
            mean, var, denom = stats
            if not self.is_initializing():
                var_track = var * denom / jnp.maximum(denom - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1.0 - self.momentum) * var_track
        elif train:
            # statistics always in f32, even for bf16 activations
            xs = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(xs, axis=reduce_axes)
                var = jnp.mean((xs - mean)**2, axis=reduce_axes)
                denom = jnp.asarray(float(np_prod(x.shape[:-1])), jnp.float32)
            else:
                # keep w BROADCASTABLE (never broadcast_to xs.shape): the
                # multiplies fuse into the reductions under jit, and the
                # weight total is sum(mask) x the per-mask-element fan-out
                # -- materializing w at a [B*P, npoint, nsample, C] shape
                # cost ~10GB on the pointnet2 init (round 5)
                w = mask[..., None].astype(jnp.float32)
                fan = float(np_prod(xs.shape[:-1]) // np_prod(w.shape[:-1]))
                denom = jnp.maximum(jnp.sum(w) * fan, 1.0)
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

        if affine_only:
            rstd = jax.lax.rsqrt(var + self.epsilon)
            return scale * rstd, bias - mean * scale * rstd
        factor = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        offset = (bias - mean * scale *
                  jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        return x * factor + offset
