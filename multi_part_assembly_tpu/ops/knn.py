"""kNN graph construction and EdgeConv gather for DGCNN.

TPU-native counterpart of the reference's `knn`/`get_graph_feature`
(reference: multi_part_assembly/models/modules/encoder/dgcnn.py:8-38).
Channels-last layout ([B, N, C]) throughout: the point axis rides the
128-lane dimension and the pairwise Gram matrix is one MXU matmul; top_k is
XLA's native sorted reduction.
"""

import jax
import jax.numpy as jnp

__all__ = ['knn', 'get_graph_feature']


def knn(x, k):
    """Indices of the k nearest neighbors (including self).

    Args:
        x: [B, N, C] point features
        k: number of neighbors

    Returns:
        [B, N, k] int32 neighbor indices (reference dgcnn.py:8-15, which
        top-k's the negative pairwise distance, ties included)
    """
    x2 = jnp.sum(x * x, axis=-1)
    inner = jax.lax.dot_general(
        x, x, (((2, ), (2, )), ((0, ), (0, ))),
        precision=jax.lax.Precision.HIGHEST)  # [B, N, N]
    neg_dist = 2.0 * inner - x2[:, :, None] - x2[:, None, :]
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx.astype(jnp.int32)


def get_graph_feature(x, k=20, idx=None):
    """EdgeConv features [x_j - x_i, x_i] for each of the k neighbors.

    Args:
        x: [B, N, C]
        k: neighborhood size
        idx: optional precomputed [B, N, k] neighbor indices

    Returns:
        [B, N, k, 2C] edge features (channels-last; the reference returns
        [B, 2C, N, k], dgcnn.py:18-38)
    """
    B, N, C = x.shape
    if idx is None:
        idx = knn(x, k)
    neighbors = jnp.take_along_axis(
        x[:, :, None, :], idx[..., None], axis=1)  # [B, N, k, C]
    center = jnp.broadcast_to(x[:, :, None, :], (B, N, k, C))
    return jnp.concatenate([neighbors - center, center], axis=-1)
