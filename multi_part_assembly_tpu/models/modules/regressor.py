"""Pose regression heads (reference multi_part_assembly/models/modules/regressor.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.precision import compute_dtype as _global_compute_dtype

__all__ = ['PoseRegressor', 'StochasticPoseRegressor', 'normalize_rot6d']


def normalize_rot6d(rot):
    """Gram-Schmidt the two 3-vectors of a 6D rotation
    (reference regressor.py:6-28)."""
    a1, a2 = rot[..., :3], rot[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([b1, b2], axis=-1)


class PoseRegressor(nn.Module):
    """MLP head: feat -> 256 -> 128 -> (rot, trans)
    (reference regressor.py:30-68)."""

    rot_type: str = 'quat'
    norm_rot: bool = True

    @nn.compact
    def __call__(self, x):
        # hidden matmuls in the global compute dtype; heads and the
        # rotation normalization stay f32 (pose accuracy matters more
        # than the two tiny head matmuls)
        cdt = _global_compute_dtype()
        rot_dim = 4 if self.rot_type == 'quat' else 6
        f = nn.Dense(256, dtype=cdt, name='fc1')(x.astype(cdt))
        f = nn.leaky_relu(f, 0.2)
        f = nn.Dense(128, dtype=cdt, name='fc2')(f)
        f = nn.leaky_relu(f, 0.2).astype(jnp.float32)
        rot = nn.Dense(rot_dim, name='rot_head')(f)
        if self.norm_rot:
            if self.rot_type == 'quat':
                rot = rot / jnp.maximum(
                    jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
            else:
                rot = normalize_rot6d(rot)
        trans = nn.Dense(3, name='trans_head')(f)
        return rot, trans


class StochasticPoseRegressor(nn.Module):
    """PoseRegressor with Gaussian noise concatenated to the input
    (reference regressor.py:71-84).  Noise keyed by the 'noise' RNG stream,
    which the MoN wrapper re-seeds per sample."""

    noise_dim: int
    rot_type: str = 'quat'
    norm_rot: bool = True

    @nn.compact
    def __call__(self, x):
        if self.noise_dim > 0:
            key = self.make_rng('noise')
            noise = jax.random.normal(
                key, x.shape[:-1] + (self.noise_dim, ), x.dtype)
            x = jnp.concatenate([x, noise], axis=-1)
        return PoseRegressor(
            rot_type=self.rot_type, norm_rot=self.norm_rot, name='head')(x)
