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

__all__ = ['GeometryPartDataset', 'augment_geometry_batch', 'unpack_parts',
           'expand_geometry_batch', 'build_geometry_dataloader']


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
                 sampler=None, wire_dtype='float16'):
        self.category = category if category.lower() != 'all' else ''
        self.data_dir = data_dir
        self.num_points = num_points
        self.min_num_part = min_num_part
        self.max_num_part = max_num_part
        self.shuffle_parts = shuffle_parts
        self.rot_range = rot_range
        self.data_keys = tuple(data_keys)
        # packed-collation wire dtype: float16 halves host->device bytes;
        # the native sampler rounds on store (identical sample stream) and
        # the device upcasts to f32 right after unpack.  Coordinate
        # quantization is <=2.4e-4 at unit scale -- eval-metric parity is
        # pinned by tests/test_datasets.py::test_f16_wire_metric_parity.
        self.wire_dtype = np.dtype(wire_dtype)
        self.sampler = sampler or MeshSampler()
        self.data_list = self._read_data(data_fn)
        if overfit > 0:
            self.data_list = self.data_list[:overfit]
        self._epoch_seed = 0
        self._file_cache = {}  # index -> sorted mesh paths (dirs are static)
        # device-side sampling tables (see datasets/device_sampler.py);
        # set via enable_device_sampling -> collate_batch emits the slot
        # wire instead of sampled points
        self._device_tables = None

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
        cached = self._file_cache.get(index)
        if cached is None:
            folder = os.path.join(self.data_dir, self.data_list[index])
            cached = [os.path.join(folder, f)
                      for f in sorted(os.listdir(folder))]
            self._file_cache[index] = cached
        if self.shuffle_parts:
            order = np.random.permutation(len(cached))
            return [cached[i] for i in order]
        return cached

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

    # ------------------------------------------------------------------
    # batch-level packed collation (single-local-device fast path)
    # ------------------------------------------------------------------

    @staticmethod
    def _kpad(total_parts, dense):
        """Bucket the packed row count to bound jit shape variants: the
        smallest multiple of dense/8 that fits (8 buckets; each bucket is
        one pre-warmed unpack compile, see warm_unpack_cache)."""
        step = max(1, -(-dense // 8))
        return min(dense, -(-max(total_parts, 1) // step) * step)

    def all_mesh_paths(self):
        """Every piece mesh path in this split, stable order (registry
        build for the device sampler; bypasses part shuffling)."""
        paths = []
        for item in self.data_list:
            folder = os.path.join(self.data_dir, item)
            paths += [os.path.join(folder, f)
                      for f in sorted(os.listdir(folder))]
        return paths

    def _collate_slots(self, indices):
        """Device-sampling wire: the host ships WHICH pieces each packed
        row is (`part_slots__packed [Kpad] i32`) + per-sample counts + one
        RNG seed; the TPU draws the surface points itself
        (device_sampler.sample_and_expand).  A few KB per batch instead of
        the ~2MB f16 point wire -- the binding resource when the remote
        runtime tunnel is slow (~90MB/s measured, ROADMAP)."""
        B, P = len(indices), self.max_num_part
        slot_of = self._device_tables.slot_of
        slots, counts = [], []
        for index in indices:
            files = self._mesh_files(index)
            counts.append(len(files))
            slots += [slot_of[f] for f in files]
        K = len(slots)
        kpad = self._kpad(K, B * P)
        arr = np.zeros((kpad, ), np.int32)
        arr[:K] = slots
        # deterministic per (epoch, batch): epoch ordering is seeded, so
        # indices[0] is unique per batch within an epoch
        seed = np.int32((self._epoch_seed + int(indices[0])) & 0x7fffffff)
        return {
            'part_slots__packed': arr,
            'part_counts': np.asarray(counts, np.int32),
            'sample_seed': seed,
            '__tables__': self._device_tables,
            'data_id': np.asarray(indices, np.int64),
        }

    def collate_batch(self, indices):
        """Collate a whole batch with ONE native sampling call and a
        MINIMAL wire format: `part_pcs_raw__packed [Kpad, N, 3]`
        (float16 by default, valid parts only) + `part_counts [B] i32`.
        Everything else the step needs -- part_valids, pack_index,
        valid_matrix, part_ids, empty labels -- is derived ON DEVICE from
        `part_counts` by `expand_geometry_batch`, so the host neither
        computes nor transfers any of it.

        vs per-item __getitem__ + stack: no [P, N, 3] zero-padding per
        item, one GIL-released C++ call for every part in the batch, and
        ~6x fewer host->device bytes at typical part counts (packed rows
        x f16).  Enabled by the loader only when one device consumes the
        whole local batch (the packed array has no batch axis to shard).
        """
        if self._device_tables is not None:
            return self._collate_slots(indices)
        B, P, N = len(indices), self.max_num_part, self.num_points
        all_paths, seeds, counts = [], [], []
        for index in indices:
            files = self._mesh_files(index)
            n = len(files)
            counts.append(n)
            all_paths += files
            seeds += [self._epoch_seed + int(index) * 64 + i
                      for i in range(n)]
        K = len(all_paths)
        kpad = self._kpad(K, B * P)
        packed = np.zeros((kpad, N, 3), self.wire_dtype)
        self.sampler.sample_batch(all_paths, N, seeds, out=packed[:K])
        return {
            'part_pcs_raw__packed': packed,
            'part_counts': np.asarray(counts, np.int32),
            'data_id': np.asarray(indices, np.int64),
        }


def warm_unpack_cache(batch_size, max_parts, n_points, mesh=None,
                      data_keys=('part_ids', 'valid_matrix'),
                      wire_dtype=jnp.float16, expand=True, group_size=1):
    """Pre-compile the packed-batch device hop for every Kpad bucket of
    this loader shape: `expand_geometry_batch` (geometry minimal wire) or
    `unpack_parts` (partnet packed wire, expand=False).  TPU compiles go
    through a minutes-level remote helper; paying them lazily would stall
    the first occurrence of each bucket mid-epoch (and each new shape also
    pays one-time transfer setup).

    `mesh` must be the training mesh when one is used: jit caches are
    keyed on input SHARDINGS too, so warming with default-device arrays
    would not warm the mesh-sharded entry the real pipeline hits."""
    put = (lambda x: x) if mesh is None else functools.partial(
        jax.device_put,
        device=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec('data')))
    dense = batch_size * max_parts
    step = max(1, -(-dense // 8))
    seen = set()
    for mult in range(1, 9):
        k = min(dense, step * mult)
        if k in seen:
            continue
        seen.add(k)
        if expand:
            out = expand_geometry_batch(
                put(jnp.zeros((k, n_points, 3), wire_dtype)),
                put(jnp.ones((batch_size, ), jnp.int32)),
                max_parts=max_parts, data_keys=tuple(data_keys))
            if group_size > 1:  # grouped G-batch hop (install_device_prep)
                out2 = expand_geometry_batch_multi(
                    put(jnp.zeros((group_size, k, n_points, 3),
                                  wire_dtype)),
                    put(jnp.ones((group_size, batch_size), jnp.int32)),
                    max_parts=max_parts, data_keys=tuple(data_keys))
                jax.block_until_ready(out2)
        else:
            out = unpack_parts(
                put(jnp.zeros((k, n_points, 3), wire_dtype)),
                put(jnp.zeros((batch_size, max_parts), jnp.int32)),
                put(jnp.zeros((batch_size, max_parts), jnp.float32)))
        jax.block_until_ready(out)


@jax.jit
def unpack_parts(part_pcs_packed, pack_index, part_valids):
    """[Kpad, N, 3] packed rows + [B, P] index map -> [B, P, N, 3] padded
    (invalid slots zeroed).  Inverse of `collate_batch`'s packing.

    The row gather is a one-hot matmul: XLA lowers `jnp.take` of whole
    [N, 3] rows to a sequential per-index loop on TPU (~0.9ms/row!),
    while a [B*P, Kpad] x [Kpad, N*3] selection matmul is one trivial MXU
    pass.  HIGHEST precision keeps the selected coordinates bit-exact."""
    kpad, n, _ = part_pcs_packed.shape
    B, P = pack_index.shape
    onehot = (pack_index.reshape(B * P, 1) ==
              jnp.arange(kpad, dtype=pack_index.dtype)).astype(jnp.float32)
    onehot = onehot * part_valids.reshape(B * P, 1)
    # f16 wire rows upcast before the matmul (selection stays bit-exact)
    flat = part_pcs_packed.reshape(kpad, n * 3).astype(jnp.float32)
    pcs = jax.lax.dot_general(
        onehot, flat, (((1, ), (0, )), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    return pcs.reshape(B, P, n, 3)


@functools.partial(jax.jit, static_argnames=('max_parts', 'data_keys'))
def expand_geometry_batch(part_pcs_packed, part_counts, max_parts,
                          data_keys=('part_ids', 'valid_matrix')):
    """Minimal wire format -> full dense batch, entirely on device.

    Input is just the packed point rows ([Kpad, N, 3], f16 or f32) and the
    per-sample valid-part counts ([B] i32); part_valids, the pack index,
    valid_matrix, part_ids and the empty label tensors are all derived
    here.  This removes every small-key host collation cost AND its wire
    bytes (the round-2 pipeline shipped ~5 host-built arrays per batch,
    VERDICT r2 next-1 / ROADMAP item 1).

    Valid parts are a PREFIX of the part axis by construction (row < count),
    the repo-wide invariant the chamfer kernels and masked GRU rely on.
    """
    B = part_counts.shape[0]
    P = max_parts
    row = jnp.arange(P, dtype=jnp.int32)[None, :]           # [1, P]
    mask = row < part_counts[:, None]                       # [B, P]
    valids = mask.astype(jnp.float32)
    offsets = jnp.concatenate(
        [jnp.zeros((1, ), part_counts.dtype),
         jnp.cumsum(part_counts)[:-1]])                     # [B]
    pack_index = jnp.where(mask, offsets[:, None] + row, 0).astype(jnp.int32)
    batch = {
        'part_pcs_raw': unpack_parts(part_pcs_packed, pack_index, valids),
        'part_valids': valids,
        'instance_label': jnp.zeros((B, P, 0), jnp.float32),
        'part_label': jnp.zeros((B, P, 0), jnp.float32),
    }
    for key in data_keys:
        if key == 'part_ids':
            batch['part_ids'] = jnp.where(mask, row, 0).astype(jnp.float32)
        elif key == 'valid_matrix':
            batch['valid_matrix'] = valids[:, :, None] * valids[:, None, :]
        else:
            raise ValueError(f'ERROR: unknown data {key}')
    return batch


@functools.partial(jax.jit, static_argnames=('max_parts', 'data_keys'))
def expand_geometry_batch_multi(packed, counts, max_parts,
                                data_keys=('part_ids', 'valid_matrix')):
    """Grouped minimal wire -> stacked dense batches, one device call.

    packed: [G, Kpad, N, 3] (G batches' packed rows, Kpad = the group's
    max bucket); counts: [G, B].  Returns the input of
    `make_train_step_multi`: each key with a leading step axis.  One
    host->device invocation per G batches instead of per batch -- each
    device_put RPC through the remote tunnel costs ~2-6ms of host CPU
    (measured round 3), which at G=1 made the producer thread the
    pipeline bottleneck on this 1-core host."""
    return jax.vmap(
        lambda p, c: expand_geometry_batch(
            p, c, max_parts=max_parts, data_keys=data_keys))(packed, counts)


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


def enable_device_sampling(loader, cfg, mesh=None, budget_bytes=None):
    """Switch a geometry loader to device-side mesh sampling.

    Builds + uploads the sampling tables once (datasets/device_sampler.py)
    and flips the dataset's collate to the slot wire.  Returns the tables,
    or None when the loader/dataset does not qualify (no packed collation,
    non-geometry dataset, table over the HBM budget) -- the packed f16
    host wire then stays in effect."""
    from .device_sampler import build_device_tables
    ds = loader.dataset
    if not getattr(loader, 'batch_collate', False) or \
            not isinstance(ds, GeometryPartDataset):
        return None
    if ds._device_tables is not None:
        return ds._device_tables
    put = None
    if mesh is not None:
        put = functools.partial(
            jax.device_put, device=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
    kwargs = {} if budget_bytes is None else {'budget_bytes': budget_bytes}
    tables = build_device_tables(ds.all_mesh_paths(), ds.sampler, put=put,
                                 **kwargs)
    if tables is None:
        return None
    tables.interpret = jax.default_backend() == 'cpu'
    ds._device_tables = tables
    return tables


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
        wire_dtype=cfg.data.get('wire_dtype', 'float16'),
    )
    train_set = GeometryPartDataset(
        data_fn=cfg.data.data_fn.format('train'),
        shuffle_parts=cfg.data.shuffle_parts, **common)
    val_set = GeometryPartDataset(
        data_fn=cfg.data.data_fn.format('val'), shuffle_parts=False, **common)
    # packed batch collation only when one local device consumes the whole
    # local batch (the packed array has no batch axis to shard) AND the run
    # is single-process: with multiple hosts, per-host Kpad differs so the
    # packed array cannot form a valid global array under the 'data' mesh
    packed = jax.local_device_count() == 1 and jax.process_count() == 1
    train_loader = DataLoader(
        train_set, batch_size=cfg.exp.batch_size, shuffle=True,
        drop_last=True, num_workers=cfg.exp.num_workers,
        batch_collate=packed)
    val_loader = DataLoader(
        val_set, batch_size=cfg.exp.batch_size * 2, shuffle=False,
        drop_last=False, num_workers=cfg.exp.num_workers,
        batch_collate=packed)
    return train_loader, val_loader
