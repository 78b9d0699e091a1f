"""Point-cloud encoders: PointNet, DGCNN, PointNet++ (SSG / MSG).

TPU-native counterparts of the reference encoders
(reference: multi_part_assembly/models/modules/encoder/).  Channels-last
throughout: a Conv1d(k=1) over [B, C, N] is a Dense over [B, N, C] -- one
big MXU matmul; pooling reduces the token axis.  BatchNorm uses
MaskedBatchNorm so padded parts never pollute batch statistics (the
reference compacts valid parts instead, which is dynamic-shape).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...utils.precision import compute_dtype as _global_compute_dtype

from ...ops.knn import get_graph_feature, knn, neighborhood_reduce
from ...ops.sampling import (ball_query, furthest_point_sample, gather_points,
                             group_points, three_interpolate, three_nn)
from .norm import MaskedBatchNorm

__all__ = ['PointNet', 'DGCNN', 'PointNet2SSG', 'PointNet2MSG',
           'FeaturePropagation', 'build_encoder']


class PointNet(nn.Module):
    """PointNet: 5x (Dense + BN + ReLU), global max-pool
    (reference encoder/pointnet.py:6-41: 3-64-64-64-128-feat).

    The per-point path runs in bf16 (the reference trains with --fp16 AMP,
    docs/model.md:76); BN statistics and the pooled output are f32.
    """

    feat_dim: int
    global_feat: bool = True
    compute_dtype: Optional[jnp.dtype] = None  # None -> global precision switch

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        """x: [..., N, 3]; mask: [...] per-cloud validity for BN stats."""
        point_mask = None if mask is None else mask[..., None]
        dims = (64, 64, 64, 128, self.feat_dim)
        cdt = self.compute_dtype or _global_compute_dtype()
        x = x.astype(cdt)
        for i, d in enumerate(dims):
            x = nn.Dense(d, use_bias=False, dtype=cdt,
                         name=f'conv{i + 1}')(x)
            x = MaskedBatchNorm(name=f'bn{i + 1}')(x, point_mask, train)
            if i < len(dims) - 1:  # last layer: BN only (pointnet.py:37)
                x = nn.relu(x)
        x = x.astype(jnp.float32)
        if self.global_feat:
            return jnp.max(x, axis=-2)  # [..., feat_dim]
        return x


def _knn_rows(B, N, budget=512 * 1024 * 1024):
    """Largest divisor of N whose [B, rows, N] f32 Gram block fits
    `budget` (None -> the full [B, N, N] Gram fits)."""
    target = budget // max(1, B * N * 4)
    if target >= N:
        return None
    for rows in range(max(1, int(target)), 0, -1):
        if N % rows == 0:
            return rows
    return 1


class DGCNN(nn.Module):
    """DGCNN: 4 EdgeConv stages + fuse conv, max||avg global pool + FC
    (reference encoder/dgcnn.py:41-109, k=20).

    The kNN graph is built in f32 (distance ordering needs it); the
    EdgeConv path runs in bf16 with f32 BN stats.

    TPU-native EdgeConv (round 5): the reference materializes a
    [B*P, N, k, 2C] edge tensor (26GB f32 at the everyday flagship
    shape, dgcnn.py:18-38) and pays the k=20x-expanded conv on it.  The
    whole stage collapses algebraically instead:

        conv([x_j - x_i, x_i]) = x_j W_top + x_i (W_bot - W_top)
                               = u_j + w_i          (two [B,N,C]->[B,N,d]
                                                     matmuls, 20x fewer
                                                     conv FLOPs)
        BN is per-channel affine  f*z + o  and leaky_relu is monotone, so
        max_j leaky(f*(u_j + w_i) + o)
            = leaky(f*(w_i + max_j u_j) + o)   where f >= 0
            = leaky(f*(w_i + min_j u_j) + o)   where f <  0

    so the k-max pool needs only per-neighborhood max/min of u
    (ops.knn.neighborhood_reduce), and the train-mode BN batch moments
    over edges come exactly from the neighborhood sum/sumsq:

        sum_edges z   = sum_i m_i (S_i + k w_i)
        sum_edges z^2 = sum_i m_i (Q_i + 2 w_i S_i + k w_i^2)

    (S, Q from the same reduce; m = part-validity).  Exact up to f32
    reassociation vs the reference shape; the monotone-max identity
    itself is exact.  MaskedBatchNorm ingests the moments (stats=...) so
    running-stat tracking stays in one place.  The conv params keep the
    reference [2C, d] layout (transplant-compatible): u and w come from
    the SAME Dense applied to [h, 0] and [-h, h].

    `naive=True` runs the reference-shaped edge-tensor path (small
    inputs only; the equality test pins the two paths against each
    other)."""

    feat_dim: int
    global_feat: bool = True
    k: int = 20
    naive: bool = False  # reference-shaped edge-tensor path (tests)
    compute_dtype: Optional[jnp.dtype] = None  # None -> global precision switch

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        """x: [B, N, 3] (flattened part batch); mask: [B] validity."""
        edge_mask = None if mask is None else mask[..., None, None]
        point_mask = None if mask is None else mask[..., None]
        cdt = self.compute_dtype or _global_compute_dtype()

        if self.is_initializing() and x.shape[1] > 4 * self.k:
            # param shapes are N-independent: init on a small point slice
            # (the [B, N, N] Gram would otherwise be built once just to
            # create params)
            x = x[:, :4 * self.k]

        feats = []
        h = x
        for i, d in enumerate((64, 64, 128, 256)):
            if self.naive:
                e = get_graph_feature(h.astype(jnp.float32), k=self.k)
                e = nn.Dense(d, use_bias=False, dtype=cdt,
                             name=f'conv{i + 1}')(e.astype(cdt))
                e = MaskedBatchNorm(name=f'bn{i + 1}')(e, edge_mask, train)
                e = nn.leaky_relu(e, 0.2)
                h = jnp.max(e, axis=2)  # [B, N, d]
            else:
                h = self._edge_stage(h, d, i, edge_mask, train, cdt)
            feats.append(h)

        h = jnp.concatenate(feats, axis=-1)  # [B, N, 512]
        h = nn.Dense(self.feat_dim, use_bias=False,
                     dtype=cdt, name='conv5')(h)
        h = MaskedBatchNorm(name='bn5')(h, point_mask, train)
        h = nn.leaky_relu(h, 0.2).astype(jnp.float32)

        if self.global_feat:
            g = jnp.concatenate(
                [jnp.max(h, axis=1), jnp.mean(h, axis=1)], axis=-1)
            return nn.Dense(self.feat_dim, name='out_fc')(g)
        return h

    def _edge_stage(self, h, d, i, edge_mask, train, cdt):
        """One EdgeConv stage via the collapsed form (class docstring)."""
        B, N, C = h.shape
        idx = knn(h.astype(jnp.float32), self.k,
                  rows_per_block=_knn_rows(B, N))

        conv = nn.Dense(d, use_bias=False, dtype=cdt, name=f'conv{i + 1}')
        hc = h.astype(cdt)
        zc = jnp.zeros_like(hc)
        u = conv(jnp.concatenate([hc, zc], axis=-1))   # x W_top
        w = conv(jnp.concatenate([-hc, hc], axis=-1))  # x (W_bot - W_top)

        mx, mn, s, q = neighborhood_reduce(u, idx, train)
        wf = w.astype(jnp.float32)

        stats = None
        if train:
            k = float(self.k)
            per_i = s + k * wf                       # sum_j z_ij   per i
            per_i2 = q + 2.0 * wf * s + k * wf * wf  # sum_j z_ij^2 per i
            if edge_mask is None:
                denom = jnp.asarray(float(B * N) * k, jnp.float32)
                tot = jnp.sum(per_i, axis=(0, 1))
                tot2 = jnp.sum(per_i2, axis=(0, 1))
            else:
                mw = edge_mask.astype(jnp.float32)  # [B, 1, 1]
                denom = jnp.maximum(jnp.sum(mw) * N * k, 1.0)
                tot = jnp.sum(per_i * mw, axis=(0, 1))
                tot2 = jnp.sum(per_i2 * mw, axis=(0, 1))
            mean = tot / denom
            var = jnp.maximum(tot2 / denom - mean * mean, 0.0)
            stats = (mean, var, denom)

        factor, offset = MaskedBatchNorm(name=f'bn{i + 1}')(
            jnp.zeros((1, d)), None, train, stats=stats, affine_only=True)

        sel = jnp.where(factor >= 0, mx, mn)  # per-channel max/min pick
        out = nn.leaky_relu(factor * (wf + sel) + offset, 0.2)
        return out.astype(cdt)


class _SharedMLP(nn.Module):
    """Conv2d(k=1)+BN+ReLU stack over grouped features
    (reference pointnet2_modules.py:9-19).  bf16 compute, f32 BN stats."""

    dims: Sequence[int]
    compute_dtype: Optional[jnp.dtype] = None  # None -> global precision switch

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        cdt = self.compute_dtype or _global_compute_dtype()
        x = x.astype(cdt)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=False, dtype=cdt,
                         name=f'mlp{i}')(x)
            x = MaskedBatchNorm(name=f'bn{i}')(x, mask, train)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class _SetAbstraction(nn.Module):
    """FPS -> ball-query -> shared MLP -> max-pool
    (reference pointnet2_modules.py:22-74); group_all for the last stage."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, features, mask=None, train=True):
        """xyz: [B, N, 3]; features: [B, N, C] or None.

        Each scale's group->MLP->pool region runs under nn.remat: the
        grouped activations ([B*P, npoint, nsample, C] -- up to ~5GB
        bf16 per layer at the everyday flagship shape, measured OOM when
        saved for backward) are recomputed in the backward pass, so only
        the point-level inputs/outputs stay resident.  FPS stays outside
        (sequential; recomputing it would serialize the backward)."""
        m = None if mask is None else mask[..., None, None]
        if self.group_all:
            def stage_all(mdl, xyz_a, feats_a):
                grouped = xyz_a[:, None]  # [B, 1, N, 3]
                if feats_a is not None:
                    grouped = jnp.concatenate(
                        [grouped, feats_a[:, None]], axis=-1)
                out = _SharedMLP(self.mlps[0], name='mlp0',
                                 parent=mdl)(grouped, m, train)
                return jnp.max(out, axis=2)  # [B, 1, C']
            return None, nn.remat(stage_all)(self, xyz, features)

        fps_idx = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)  # [B, npoint, 3]
        outs = []
        for i, (r, s, dims) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            def stage(mdl, xyz_a, new_xyz_a, feats_a, r=r, s=s, dims=dims,
                      i=i):
                idx = ball_query(r, s, xyz_a, new_xyz_a)  # [B, npoint, s]
                g_xyz = group_points(xyz_a, idx) - new_xyz_a[:, :, None]
                if feats_a is not None:
                    g_feat = group_points(feats_a, idx)
                    grouped = jnp.concatenate([g_xyz, g_feat], axis=-1)
                else:
                    grouped = g_xyz  # use_xyz=True
                out = _SharedMLP(dims, name=f'mlp{i}',
                                 parent=mdl)(grouped, m, train)
                return jnp.max(out, axis=2)  # [B, npoint, C']
            outs.append(nn.remat(stage)(self, xyz, new_xyz, features))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """PointNet++ feature-propagation layer: 3-NN inverse-distance-weighted
    feature upsampling + shared MLP (reference pointnet2_modules.py:149-209
    `PointnetFPModule`; part of the op library, unused by the shipped
    encoders but needed for dense-prediction heads)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 mask=None, train=True):
        """unknown: [B, n, 3]; known: [B, m, 3] or None (global feature);
        unknown_feats: [B, n, C1] or None; known_feats: [B, m, C2]."""
        if known is not None:
            dist, idx = three_nn(unknown, known)
            recip = 1.0 / jnp.maximum(dist, 1e-8)
            weight = recip / jnp.sum(recip, axis=2, keepdims=True)
            interp = three_interpolate(known_feats, idx, weight)
        else:  # broadcast the single global feature (modules.py:186-188)
            interp = jnp.broadcast_to(
                known_feats, unknown.shape[:2] + (known_feats.shape[-1], ))
        feats = interp if unknown_feats is None else \
            jnp.concatenate([interp, unknown_feats], axis=-1)
        m = None if mask is None else mask[..., None]
        return _SharedMLP(self.mlp, name='mlp')(feats, m, train)


class PointNet2SSG(nn.Module):
    """PointNet++ single-scale grouping (reference pointnet2_ssg.py:19-66)."""

    feat_dim: int
    global_feat: bool = True  # always global in the reference

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        xyz, feats = x, None
        xyz, feats = _SetAbstraction(
            npoint=512, radii=(0.2, ), nsamples=(64, ), mlps=((64, 64, 128), ),
            name='sa1')(xyz, feats, mask, train)
        xyz, feats = _SetAbstraction(
            npoint=128, radii=(0.4, ), nsamples=(64, ),
            mlps=((128, 128, 256), ), name='sa2')(xyz, feats, mask, train)
        _, feats = _SetAbstraction(
            npoint=0, radii=(), nsamples=(), mlps=((256, 512, self.feat_dim), ),
            group_all=True, name='sa3')(xyz, feats, mask, train)
        return feats[:, 0]  # [B, feat_dim]


class PointNet2MSG(nn.Module):
    """PointNet++ multi-scale grouping (reference pointnet2_msg.py:15-43)."""

    feat_dim: int
    global_feat: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        xyz, feats = x, None
        xyz, feats = _SetAbstraction(
            npoint=512, radii=(0.1, 0.2, 0.4), nsamples=(16, 32, 128),
            mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            name='sa1')(xyz, feats, mask, train)
        xyz, feats = _SetAbstraction(
            npoint=128, radii=(0.2, 0.4, 0.8), nsamples=(32, 64, 128),
            mlps=((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            name='sa2')(xyz, feats, mask, train)
        _, feats = _SetAbstraction(
            npoint=0, radii=(), nsamples=(), mlps=((256, 512, self.feat_dim), ),
            group_all=True, name='sa3')(xyz, feats, mask, train)
        return feats[:, 0]


def build_encoder(arch, feat_dim, global_feat=True):
    """Encoder factory (reference modules/encoder/__init__.py:6-21)."""
    if arch == 'pointnet':
        return PointNet(feat_dim=feat_dim, global_feat=global_feat)
    if arch == 'dgcnn':
        return DGCNN(feat_dim=feat_dim, global_feat=global_feat)
    if arch == 'pointnet2_ssg':
        return PointNet2SSG(feat_dim=feat_dim)
    if arch == 'pointnet2_msg':
        return PointNet2MSG(feat_dim=feat_dim)
    raise NotImplementedError(f'unknown encoder {arch}')
