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

from ...ops.knn import get_graph_feature
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


class DGCNN(nn.Module):
    """DGCNN: 4 EdgeConv stages + fuse conv, max||avg global pool + FC
    (reference encoder/dgcnn.py:41-109, k=20).

    The kNN graph is built in f32 (distance ordering needs it); the
    EdgeConv MLP path runs in bf16 with f32 BN stats."""

    feat_dim: int
    global_feat: bool = True
    k: int = 20
    compute_dtype: Optional[jnp.dtype] = None  # None -> global precision switch

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        """x: [B, N, 3] (flattened part batch); mask: [B] validity."""
        edge_mask = None if mask is None else mask[..., None, None]
        point_mask = None if mask is None else mask[..., None]
        cdt = self.compute_dtype or _global_compute_dtype()

        feats = []
        h = x
        for i, d in enumerate((64, 64, 128, 256)):
            e = get_graph_feature(h.astype(jnp.float32), k=self.k)
            e = nn.Dense(d, use_bias=False, dtype=cdt,
                         name=f'conv{i + 1}')(e.astype(cdt))
            e = MaskedBatchNorm(name=f'bn{i + 1}')(e, edge_mask, train)
            e = nn.leaky_relu(e, 0.2)
            h = jnp.max(e, axis=2)  # [B, N, d]
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
        """xyz: [B, N, 3]; features: [B, N, C] or None."""
        if self.group_all:
            grouped = xyz[:, None]  # [B, 1, N, 3]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, features[:, None]], axis=-1)
            m = None if mask is None else mask[..., None, None]
            out = _SharedMLP(self.mlps[0], name='mlp0')(grouped, m, train)
            return None, jnp.max(out, axis=2)  # [B, 1, C']

        fps_idx = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)  # [B, npoint, 3]
        outs = []
        m = None if mask is None else mask[..., None, None]
        for i, (r, s, dims) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            idx = ball_query(r, s, xyz, new_xyz)  # [B, npoint, s]
            g_xyz = group_points(xyz, idx) - new_xyz[:, :, None]  # relative
            if features is not None:
                g_feat = group_points(features, idx)
                grouped = jnp.concatenate([g_xyz, g_feat], axis=-1)
            else:
                grouped = g_xyz  # use_xyz=True
            out = _SharedMLP(dims, name=f'mlp{i}')(grouped, m, train)
            outs.append(jnp.max(out, axis=2))  # [B, npoint, C']
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
