"""Breaking-Bad (geometric assembly) dataset.

Counterpart of reference multi_part_assembly/datasets/geometry_data.py.
Split of responsibilities, TPU-style:

  host (this file + native sampler):
    - walk the fracture directory tree from `{subset}.{train,val}.txt`,
      filter by part count (geometry_data.py:48-71)
    - per epoch: area-weighted surface resampling of each part mesh via the
      native C++ sampler (geometry_data.py:109-131 used trimesh on the
      Python side)
    - pad parts to max_num_part, emit fixed-shape raw batches

  device (augment_geometry_batch, jit-compiled):
    - per-part recenter, random SO(3) (or bounded-euler) rotation with the
      GT quat being the *inverse* rotation in scalar-first order
      (geometry_data.py:73-91); the reference's per-part point shuffle
      (:93-99) is optional here -- the native sampler already emits points
      in i.i.d. random order
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.rotation import quaternion_invert, quaternion_to_matrix
from ..utils.transforms import random_quaternions
from .mesh_io import MeshSampler

__all__ = ['GeometryPartDataset', 'augment_geometry_batch',
           'build_geometry_dataloader']


class GeometryPartDataset:
    """Host-side dataset: file discovery + native mesh sampling.

    __getitem__ returns a raw (un-augmented) dict; augmentation runs on
    device.  Item layout:
        part_pcs_raw: [P, N, 3] float32 (padded with zeros)
        part_valids:  [P] float32
        plus data_keys extras (part_ids / valid_matrix) and data_id.
    """

    def __init__(self, data_dir, data_fn, data_keys, category='',
                 num_points=1000, min_num_part=2, max_num_part=20,
                 shuffle_parts=False, rot_range=-1, overfit=-1,
                 sampler=None):
        self.category = category if category.lower() != 'all' else ''
        self.data_dir = data_dir
        self.num_points = num_points
        self.min_num_part = min_num_part
        self.max_num_part = max_num_part
        self.shuffle_parts = shuffle_parts
        self.rot_range = rot_range
        self.data_keys = tuple(data_keys)
        self.sampler = sampler or MeshSampler()
        self.data_list = self._read_data(data_fn)
        if overfit > 0:
            self.data_list = self.data_list[:overfit]
        self._epoch_seed = 0

    def _read_data(self, data_fn):
        """Walk the fracture dirs, keep those with valid part counts
        (reference geometry_data.py:47-71)."""
        with open(os.path.join(self.data_dir, data_fn)) as f:
            mesh_list = [line.strip() for line in f.readlines()]
            if self.category:
                mesh_list = [
                    line for line in mesh_list
                    if self.category in line.split('/')
                ]
        data_list = []
        for mesh in mesh_list:
            mesh_dir = os.path.join(self.data_dir, mesh)
            if not os.path.isdir(mesh_dir):
                print(f'{mesh} does not exist')
                continue
            for frac in sorted(os.listdir(mesh_dir)):
                if 'fractured' not in frac and 'mode' not in frac:
                    continue
                frac_rel = os.path.join(mesh, frac)
                num_parts = len(
                    os.listdir(os.path.join(self.data_dir, frac_rel)))
                if self.min_num_part <= num_parts <= self.max_num_part:
                    data_list.append(frac_rel)
        return data_list

    def set_epoch(self, epoch):
        """Reseed the per-epoch surface resampling."""
        self._epoch_seed = int(epoch) * 1000003

    def __len__(self):
        return len(self.data_list)

    def _mesh_files(self, index):
        folder = os.path.join(self.data_dir, self.data_list[index])
        files = sorted(os.listdir(folder))
        if self.shuffle_parts:
            order = np.random.permutation(len(files))
            files = [files[i] for i in order]
        return [os.path.join(folder, f) for f in files]

    def __getitem__(self, index):
        files = self._mesh_files(index)
        num_parts = len(files)
        P, N = self.max_num_part, self.num_points
        seeds = [self._epoch_seed + index * 64 + i
                 for i in range(num_parts)]
        pcs = self.sampler.sample_batch(files, N, seeds)  # [p, N, 3]

        part_pcs = np.zeros((P, N, 3), np.float32)
        part_pcs[:num_parts] = pcs
        valids = np.zeros((P, ), np.float32)
        valids[:num_parts] = 1.0

        data_dict = {
            'part_pcs_raw': part_pcs,
            'part_valids': valids,
            'data_id': index,
            'instance_label': np.zeros((P, 0), np.float32),
            'part_label': np.zeros((P, 0), np.float32),
        }
        for key in self.data_keys:
            if key == 'part_ids':
                ids = np.zeros((P, ), np.float32)
                ids[:num_parts] = np.arange(num_parts)
                data_dict['part_ids'] = ids
            elif key == 'valid_matrix':
                vm = np.zeros((P, P), np.float32)
                vm[:num_parts, :num_parts] = 1.0
                data_dict['valid_matrix'] = vm
            else:
                raise ValueError(f'ERROR: unknown data {key}')
        return data_dict


@functools.partial(jax.jit, static_argnames=('rot_range', 'shuffle_points'))
def augment_geometry_batch(part_pcs_raw, part_valids, key, rot_range=-1.0,
                           shuffle_points=False):
    """Device-side augmentation (jit): recenter + random rotation + shuffle.

    Equivalent to reference geometry_data.py:73-99 per part:
      - subtract centroid; GT trans = centroid
      - apply random rotation R; GT quat = quat(R^T) scalar-first (:90)
      - optional per-part point shuffle: off by default since the native
        surface sampler already emits points in i.i.d. random order (each
        point is an independent (face, barycentric) draw), making the
        reference's shuffle (geometry_data.py:93-99) distributionally a
        no-op while its argsort costs ~5ms/step on device

    Args:
        part_pcs_raw: [B, P, N, 3]; part_valids: [B, P]; key: PRNG

    Returns:
        dict(part_pcs, part_quat, part_trans)
    """
    B, P, N, _ = part_pcs_raw.shape
    k_rot, k_shuf = jax.random.split(key)

    valid = part_valids[..., None]  # [B, P, 1]

    # recenter over the N axis (padded parts are all-zero -> centroid 0)
    centroid = jnp.mean(part_pcs_raw, axis=2)  # [B, P, 3]
    pcs = part_pcs_raw - centroid[:, :, None, :]

    if rot_range > 0:
        # bounded euler angles in degrees, extrinsic xyz like scipy
        # R.from_euler('xyz', ...) (geometry_data.py:82-85): R = Rz Ry Rx
        euler = (jax.random.uniform(k_rot, (B, P, 3)) - 0.5) * 2.0 * \
            rot_range * (jnp.pi / 180.0)
        half = euler * 0.5
        zeros = jnp.zeros_like(half[..., 0])

        def _axis_quat(c, s, axis):
            comps = [c, zeros, zeros, zeros]
            comps[1 + axis] = s
            return jnp.stack(comps, axis=-1)

        qx = _axis_quat(jnp.cos(half[..., 0]), jnp.sin(half[..., 0]), 0)
        qy = _axis_quat(jnp.cos(half[..., 1]), jnp.sin(half[..., 1]), 1)
        qz = _axis_quat(jnp.cos(half[..., 2]), jnp.sin(half[..., 2]), 2)
        from ..utils.rotation import quaternion_multiply
        quat = quaternion_multiply(qz, quaternion_multiply(qy, qx))
    else:
        quat = random_quaternions(k_rot, (B, P))  # uniform SO(3)

    rmat = quaternion_to_matrix(quat)
    pcs = jnp.einsum('bpij,bpnj->bpni', rmat, pcs,
                     precision=jax.lax.Precision.HIGHEST)
    # GT rotation undoes the augmentation: quat of R^T (scalar-first)
    gt_quat = quaternion_invert(quat)

    if shuffle_points:
        shuf = jax.random.uniform(k_shuf, (B, P, N))
        order = jnp.argsort(shuf, axis=-1)
        pcs = jnp.take_along_axis(pcs, order[..., None], axis=2)

    pcs = pcs * valid[..., None]
    gt_quat = gt_quat * valid
    gt_trans = centroid * valid
    return {'part_pcs': pcs, 'part_quat': gt_quat, 'part_trans': gt_trans}


def build_geometry_dataloader(cfg, sampler=None):
    """Train + val loaders (reference geometry_data.py:213-249)."""
    from .loader import DataLoader
    common = dict(
        data_dir=cfg.data.data_dir,
        data_keys=cfg.data.data_keys,
        category=cfg.data.category,
        num_points=cfg.data.num_pc_points,
        min_num_part=cfg.data.min_num_part,
        max_num_part=cfg.data.max_num_part,
        rot_range=cfg.data.rot_range,
        overfit=cfg.data.overfit,
        sampler=sampler,
    )
    train_set = GeometryPartDataset(
        data_fn=cfg.data.data_fn.format('train'),
        shuffle_parts=cfg.data.shuffle_parts, **common)
    val_set = GeometryPartDataset(
        data_fn=cfg.data.data_fn.format('val'), shuffle_parts=False, **common)
    train_loader = DataLoader(
        train_set, batch_size=cfg.exp.batch_size, shuffle=True,
        drop_last=True, num_workers=cfg.exp.num_workers)
    val_loader = DataLoader(
        val_set, batch_size=cfg.exp.batch_size * 2, shuffle=False,
        drop_last=False, num_workers=cfg.exp.num_workers)
    return train_loader, val_loader
