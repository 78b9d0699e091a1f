"""Shared model plumbing.

The reference centralizes train/eval logic in a LightningModule BaseModel
(reference: multi_part_assembly/models/modules/base_model.py).  Here models
are pure flax Modules exposing two methods:

  - ``precompute(data_dict, train)``: the deterministic, reusable feature
    path (encoder / correlator), mirroring the reference's
    ``pre_pose_feats`` reuse across MoN samples (e.g. b_global/network.py:75).
  - ``sample(feats, data_dict, train)``: the stochastic path (noise
    regressors, GRUs, teacher forcing).  The MoN wrapper vmaps this over
    `sample_iter` RNG keys -- parallel on device instead of the reference's
    sequential Python loop (base_model.py:348-387).

``__call__`` = precompute + sample, used for initialization and plain
inference.  The training engine lives in multi_part_assembly_tpu/train/.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ['zero_pose', 'extract_part_feats', 'rot_dim_of']


def rot_dim_of(rot_type):
    """Raw rotation-vector dim: quat=4, rmat=6 (6D repr)."""
    if rot_type == 'quat':
        return 4
    if rot_type == 'rmat':
        return 6
    raise NotImplementedError(f'rotation {rot_type} is not supported')


def zero_pose(rot_type, dtype=jnp.float32):
    """Identity pose vector [rot..., trans=0] (reference base_model.py:27-43:
    quat -> (1,0,0,0); rmat6d -> (1,0,0,0,1,0))."""
    if rot_type == 'quat':
        rot = jnp.asarray([1.0, 0, 0, 0], dtype)
    elif rot_type == 'rmat':
        rot = jnp.asarray([1.0, 0, 0, 0, 1.0, 0], dtype)
    else:
        raise NotImplementedError(f'rotation {rot_type} is not supported')
    return jnp.concatenate([rot, jnp.zeros((3, ), dtype)])


def extract_part_feats(encoder, part_pcs, part_valids, train):
    """Shared-weight encoding of every part with masked BN stats.

    The reference compacts valid parts (`part_pcs[valid_mask]`,
    b_global/network.py:45-54) which is dynamic-shape; here all B*P parts
    run through the encoder (static shape, bigger matmuls) and the validity
    mask drives the BN statistics and zeroes padded outputs.

    Args:
        encoder: bound encoder module
        part_pcs: [B, P, N, 3]; part_valids: [B, P]

    Returns: [B, P, C]
    """
    B, P, N, _ = part_pcs.shape
    flat_pcs = part_pcs.reshape(B * P, N, 3)
    flat_mask = part_valids.reshape(B * P)
    feats = encoder(flat_pcs, mask=flat_mask, train=train)  # [B*P, C]
    feats = feats * flat_mask[:, None]
    return feats.reshape(B, P, -1)
