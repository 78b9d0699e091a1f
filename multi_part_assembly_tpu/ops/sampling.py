"""Point-cloud sampling/grouping ops (PointNet++ support library).

TPU-native re-implementations of the reference's `pointnet2_ops` CUDA
extension (reference: .../pointnet2/pointnet2_ops_lib/pointnet2_ops/_ext-src):
  - furthest_point_sample  (sampling_gpu.cu:73-233: iterative max-of-min)
  - gather_points          (sampling_gpu.cu:12-61)
  - ball_query             (ball_query_gpu.cu:13-48: first-k-in-radius with
                            first-hit backfill)
  - group_points           (group_points_gpu.cu:12-79)
  - three_nn / three_interpolate (interpolate_gpu.cu:13-158)

All channels-last ([B, N, C]); gradients come from XLA autodiff of the
gather formulations (the CUDA atomicAdd backward kernels are the transpose
of these gathers, which XLA derives automatically).
"""

import functools

import jax
import jax.numpy as jnp

__all__ = [
    'furthest_point_sample', 'gather_points', 'ball_query', 'group_points',
    'three_nn', 'three_interpolate',
]


def _sqdist(x, y):
    """[..., N, 3] x [..., M, 3] -> [..., N, M] exact f32 squared distances."""
    x2 = jnp.sum(x * x, axis=-1)
    y2 = jnp.sum(y * y, axis=-1)
    xy = jnp.einsum('...nc,...mc->...nm', x, y,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2[..., :, None] + y2[..., None, :] - 2 * xy, 0.0)


@functools.partial(jax.jit, static_argnames=('npoint', ))
def furthest_point_sample(xyz, npoint):
    """Iterative furthest point sampling.

    Starts from index 0 and greedily picks the point farthest from the
    selected set.  Near-origin points (|p|^2 <= 1e-3) are padding and are
    never selected (CUDA kernel skip at sampling_gpu.cu:104).

    Args:
        xyz: [B, N, 3]
        npoint: number of samples m

    Returns:
        [B, m] int32 indices
    """
    B, N, _ = xyz.shape
    mag = jnp.sum(xyz * xyz, axis=-1)  # [B, N]
    selectable = mag > 1e-3

    def body(i, carry):
        idxs, min_d, last = carry
        last_pt = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d = jnp.sum((xyz - last_pt)**2, axis=-1)  # [B, N]
        min_d = jnp.minimum(min_d, d)
        cand = jnp.where(selectable, min_d, -1.0)
        nxt = jnp.argmax(cand, axis=-1).astype(jnp.int32)  # [B]
        idxs = idxs.at[:, i].set(nxt)
        return idxs, min_d, nxt

    idxs = jnp.zeros((B, npoint), jnp.int32)  # slot 0 = index 0 (CUDA :90)
    init = (idxs, jnp.full((B, N), 1e10, jnp.float32),
            jnp.zeros((B, ), jnp.int32))
    idxs, _, _ = jax.lax.fori_loop(1, npoint, body, init)
    return idxs


def gather_points(points, idx):
    """out[b, m, c] = points[b, idx[b, m], c]  (sampling_gpu.cu:12-31)."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32),
                               axis=1)


@functools.partial(jax.jit, static_argnames=('nsample', ))
def _ball_query_impl(radius, nsample, xyz, new_xyz):
    N = xyz.shape[1]
    d2 = _sqdist(new_xyz, xyz)  # [B, M, N]
    in_ball = d2 < radius * radius
    # first `nsample` hits in index order; top_k of negated index keeps the
    # smallest indices (ball_query_gpu.cu scans j ascending)
    cand = jnp.where(in_ball, jnp.arange(N, dtype=jnp.int32)[None, None, :],
                     N)
    neg_topk, _ = jax.lax.top_k(-cand, nsample)
    hits = -neg_topk  # [B, M, nsample] ascending indices, N = miss
    first = hits[..., :1]
    hits = jnp.where(hits < N, hits, first)  # first-hit backfill (cu:36-40)
    return jnp.where(hits < N, hits, 0).astype(jnp.int32)  # empty ball -> 0


def ball_query(radius, nsample, xyz, new_xyz):
    """Indices of up to `nsample` points of xyz within `radius` of each center.

    Args:
        radius: ball radius (python float)
        nsample: max samples per ball
        xyz: [B, N, 3] all points
        new_xyz: [B, M, 3] ball centers

    Returns:
        [B, M, nsample] int32
    """
    return _ball_query_impl(radius, nsample, xyz, new_xyz)


def group_points(points, idx):
    """out[b, m, s, c] = points[b, idx[b, m, s], c] (group_points_gpu.cu:12-36)."""
    B, M, S = idx.shape
    flat = idx.reshape(B, M * S).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(B, M, S, points.shape[-1])


def three_nn(unknown, known):
    """3 nearest neighbors of each unknown point among known points.

    Args:
        unknown: [B, n, 3];  known: [B, m, 3]

    Returns:
        dist: [B, n, 3] squared distances; idx: [B, n, 3] int32
        (squared, matching interpolate_gpu.cu:31-55's `d = x*x+y*y+z*z`)
    """
    d2 = _sqdist(unknown, known)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(points, idx, weight):
    """Weighted sum of 3 neighbor features (interpolate_gpu.cu:62-158).

    Args:
        points: [B, m, C] features;  idx: [B, n, 3];  weight: [B, n, 3]

    Returns:
        [B, n, C]
    """
    gathered = group_points(points, idx)  # [B, n, 3, C]
    return jnp.sum(gathered * weight[..., None], axis=2)
