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
           'expand_geometry_batch', 'expand_geometry_batch_sharded',
           'expand_geometry_batch_group_sharded', 'configure_wire_shards',
           'build_geometry_dataloader']


_MESH_EXTS = ('.obj', '.off', '.ply', '.stl')


def _mesh_names(folder):
    """Sorted mesh filenames of a fracture dir.  The reference counts raw
    os.listdir entries (geometry_data.py:56); filtering by extension is a
    robustness deviation -- stray files (editor droppings, caches) would
    otherwise be miscounted as pieces."""
    return sorted(f for f in os.listdir(folder)
                  if f.lower().endswith(_MESH_EXTS))


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
        # multi-chip wire layout (set by configure_wire_shards): the batch
        # splits into `wire_shards` contiguous sub-batches, one per local
        # data-axis device, each with its own packed rows -- the sharded
        # wire [D, Kpad, ...] lands directly on the mesh's data axis.
        # fixed_kpad pins Kpad to the dense bound (multi-process runs need
        # every host to pick the same bucket without seeing peers' data).
        self.wire_shards = 1
        self.wire_shard_offset = 0  # global index of this host's shard 0
        self.fixed_kpad = False

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
                num_parts = len(_mesh_names(
                    os.path.join(self.data_dir, frac_rel)))
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
            cached = [os.path.join(folder, f) for f in _mesh_names(folder)]
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
            paths += [os.path.join(folder, f) for f in _mesh_names(folder)]
        return paths

    def _shard_indices(self, indices):
        """Split a batch's indices into wire_shards contiguous sub-batches
        (padding by edge replication when the remainder batch does not
        divide); returns (list-of-sublists, real_bs)."""
        D = self.wire_shards
        real_bs = len(indices)
        indices = list(indices)
        pad = (-real_bs) % D
        indices += [indices[-1]] * pad
        bs = len(indices) // D
        return [indices[d * bs:(d + 1) * bs] for d in range(D)], real_bs

    def _collate_slots(self, indices):
        """Device-sampling wire: the host ships WHICH pieces each packed
        row is (`part_slots__packed [Kpad] i32`) + per-sample counts + one
        RNG seed; the TPU draws the surface points itself
        (device_sampler.sample_and_expand).  A few KB per batch instead of
        the ~2MB f16 point wire -- the binding resource when the remote
        runtime tunnel is slow (~90MB/s measured, ROADMAP).

        With wire_shards > 1 every array gains a leading [D] shard axis
        (one row group per local data-axis device, uniform Kpad across
        shards) and one seed per shard; `_prep_batch` routes these through
        the shard_map'd sampler so each device draws only its own rows."""
        P = self.max_num_part
        slot_of = self._device_tables.slot_of
        if self.wire_shards <= 1:
            B = len(indices)
            slots, counts = [], []
            for index in indices:
                files = self._mesh_files(index)
                counts.append(len(files))
                slots += [slot_of[f] for f in files]
            K = len(slots)
            kpad = self._kpad(K, B * P)
            arr = np.zeros((kpad, ), np.int32)
            arr[:K] = slots
            # deterministic per (epoch, batch): epoch ordering is seeded,
            # so indices[0] is unique per batch within an epoch
            seed = np.int32((self._epoch_seed + int(indices[0]))
                            & 0x7fffffff)
            return {
                'part_slots__packed': arr,
                'part_counts': np.asarray(counts, np.int32),
                'sample_seed': seed,
                '__tables__': self._device_tables,
                'data_id': np.asarray(indices, np.int64),
            }
        shards, real_bs = self._shard_indices(indices)
        D, bs = len(shards), len(shards[0])
        shard_slots, counts = [], np.zeros((D, bs), np.int32)
        for d, sub in enumerate(shards):
            slots = []
            for i, index in enumerate(sub):
                files = self._mesh_files(index)
                counts[d, i] = len(files)
                slots += [slot_of[f] for f in files]
            shard_slots.append(slots)
        kmax = max(len(s) for s in shard_slots)
        kpad = bs * P if self.fixed_kpad else self._kpad(kmax, bs * P)
        arr = np.zeros((D, kpad), np.int32)
        for d, s in enumerate(shard_slots):
            arr[d, :len(s)] = s
        base = (self._epoch_seed + int(indices[0])) & 0x7fffffff
        seeds = np.asarray(
            [(base + 131071 * (self.wire_shard_offset + d)) & 0x7fffffff
             for d in range(D)], np.int32)
        out = {
            'part_slots__packed': arr,
            'part_counts': counts,
            'sample_seed': seeds,
            '__tables__': self._device_tables,
            'data_id': np.asarray(list(indices), np.int64),
        }
        if real_bs != D * bs:
            out['real_bs'] = real_bs
        return out

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
        P, N = self.max_num_part, self.num_points
        if self.wire_shards <= 1:
            B = len(indices)
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
        # sharded wire: [D, Kpad, N, 3] rows, one contiguous sub-batch per
        # local data-axis device (uniform Kpad so shapes match)
        shards, real_bs = self._shard_indices(indices)
        D, bs = len(shards), len(shards[0])
        per_shard = []
        counts = np.zeros((len(shards), len(shards[0])), np.int32)
        for d, sub in enumerate(shards):
            paths, seeds = [], []
            for i, index in enumerate(sub):
                files = self._mesh_files(index)
                counts[d, i] = len(files)
                paths += files
                seeds += [self._epoch_seed + int(index) * 64 + k
                          for k in range(len(files))]
            per_shard.append((paths, seeds))
        kmax = max(len(p) for p, _ in per_shard)
        kpad = bs * P if self.fixed_kpad else self._kpad(kmax, bs * P)
        packed = np.zeros((D, kpad, N, 3), self.wire_dtype)
        for d, (paths, seeds) in enumerate(per_shard):
            self.sampler.sample_batch(paths, N, seeds,
                                      out=packed[d, :len(paths)])
        out = {
            'part_pcs_raw__packed': packed,
            'part_counts': counts,
            'data_id': np.asarray(list(indices), np.int64),
        }
        if real_bs != D * bs:
            out['real_bs'] = real_bs
        return out


def warm_unpack_cache(batch_size, max_parts, n_points, mesh=None,
                      data_keys=('part_ids', 'valid_matrix'),
                      wire_dtype=jnp.float16, expand=True, group_size=1,
                      shards=1, fixed_kpad=False):
    """Pre-compile the packed-batch device hop for every Kpad bucket of
    this loader shape: `expand_geometry_batch` (geometry minimal wire) or
    `unpack_parts` (partnet packed wire, expand=False).  TPU compiles go
    through a minutes-level remote helper; paying them lazily would stall
    the first occurrence of each bucket mid-epoch (and each new shape also
    pays one-time transfer setup).

    `mesh` must be the training mesh when one is used: jit caches are
    keyed on input SHARDINGS too, so warming with default-device arrays
    would not warm the mesh-sharded entry the real pipeline hits.

    shards > 1 warms the sharded-wire variants instead (`batch_size` is
    the GLOBAL batch); fixed_kpad warms only the dense bucket."""
    put = (lambda x: x) if mesh is None else functools.partial(
        jax.device_put,
        device=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec('data')))
    if shards > 1:
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import put_sharded
        assert expand, 'sharded wire is geometry-only'
        n_local = shards // jax.process_count()
        bs = batch_size // shards
        dense = bs * max_parts
        step = max(1, -(-dense // 8))
        seen = set()
        for mult in range(1, 9):
            k = min(dense, step * mult)
            if k in seen or (fixed_kpad and k != dense):
                continue
            seen.add(k)
            dev = put_sharded({
                'packed': np.zeros((n_local, k, n_points, 3),
                                   jnp.dtype(wire_dtype)),
                'counts': np.ones((n_local, bs), np.int32)}, mesh,
                P('data'))
            out = expand_geometry_batch_sharded(
                dev['packed'], dev['counts'], max_parts=max_parts,
                data_keys=tuple(data_keys))
            jax.block_until_ready(out)
            if group_size > 1:
                gdev = put_sharded({
                    'packed': np.zeros(
                        (group_size, n_local, k, n_points, 3),
                        jnp.dtype(wire_dtype)),
                    'counts': np.ones((group_size, n_local, bs), np.int32)},
                    mesh, P(None, 'data'))
                out2 = expand_geometry_batch_group_sharded(
                    gdev['packed'], gdev['counts'], max_parts=max_parts,
                    data_keys=tuple(data_keys))
                jax.block_until_ready(out2)
        return
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


@functools.partial(jax.jit, static_argnames=('max_parts', 'data_keys'))
def expand_geometry_batch_sharded(packed, counts, max_parts,
                                  data_keys=('part_ids', 'valid_matrix')):
    """Multi-device packed wire: [D, Kpad, N, 3] rows + [D, Bs] counts
    (sharded on the mesh data axis) -> a global [D*Bs, ...] dense batch
    still sharded on `data`.

    Unlike the slot wire, this hop is pure jnp (a batched one-hot matmul),
    so no shard_map is needed: vmapping over the sharded leading axis is a
    batched matmul the partitioner splits comms-free, and the leading-axes
    merge keeps the row sharding (each device holds contiguous rows)."""
    D, Bs = counts.shape
    out = expand_geometry_batch_multi(packed, counts, max_parts=max_parts,
                                      data_keys=tuple(data_keys))
    return jax.tree_util.tree_map(
        lambda x: x.reshape((D * Bs, ) + x.shape[2:]), out)


@functools.partial(jax.jit, static_argnames=('max_parts', 'data_keys'))
def expand_geometry_batch_group_sharded(packed, counts, max_parts,
                                        data_keys=('part_ids',
                                                   'valid_matrix')):
    """Grouped multi-device packed wire: [G, D, Kpad, N, 3] + [G, D, Bs]
    -> stacked dense batches [G, D*Bs, ...] (one device call per group)."""
    G, D = counts.shape[:2]
    Bs = counts.shape[2]
    out = jax.vmap(lambda p, c: expand_geometry_batch_multi(
        p, c, max_parts=max_parts, data_keys=tuple(data_keys)))(
            packed, counts)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((G, D * Bs) + x.shape[3:]), out)


def configure_wire_shards(loader, mesh):
    """Lay the packed/slot wire out for `mesh`'s data axis.

    Called by the Trainer/bench after make_mesh: each collated batch then
    carries one row group per data-axis device, so the fast wire (packed
    f16 rows, device-sampling slots, steps_per_call grouping) works on
    ANY data-parallel mesh instead of falling back to the slow full
    [B, P, N, 3] host wire (VERDICT r3 missing #1).  Multi-process runs
    pin Kpad to the dense bound so every host independently picks the
    same bucket.  Returns the per-host shard count (1 = the classic
    single-device wire)."""
    ds = getattr(loader, 'dataset', None)
    if not getattr(loader, 'batch_collate', False) or \
            not isinstance(ds, GeometryPartDataset):
        return 1
    n_data = mesh.shape['data']
    n_proc = jax.process_count()
    assert n_data % n_proc == 0, (n_data, n_proc)
    ds.wire_shards = n_data // n_proc
    ds.wire_shard_offset = jax.process_index() * ds.wire_shards
    ds.fixed_kpad = n_proc > 1
    return ds.wire_shards


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


def enable_device_sampling(loader, cfg, mesh=None, budget_bytes=None,
                           layout=None):
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
    layout = layout or cfg.data.get('device_table_layout', None)
    if layout:
        kwargs['layout'] = layout
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
    # packed batch collation works on any data-parallel mesh since round 4
    # (the wire grows a leading per-device shard axis; multi-process runs
    # pin Kpad to the dense bound) -- consumers call configure_wire_shards
    # after make_mesh to lay the shard axis out.  The only remaining gate:
    # the data-axis size the Trainer/bench mesh will pick
    # (gcd(batch, devices), see make_mesh) must split evenly across hosts.
    import math
    n_data = math.gcd(cfg.exp.batch_size, jax.device_count())
    packed = n_data % jax.process_count() == 0
    train_loader = DataLoader(
        train_set, batch_size=cfg.exp.batch_size, shuffle=True,
        drop_last=True, num_workers=cfg.exp.num_workers,
        batch_collate=packed)
    val_loader = DataLoader(
        val_set, batch_size=cfg.exp.batch_size * 2, shuffle=False,
        drop_last=False, num_workers=cfg.exp.num_workers,
        batch_collate=packed)
    return train_loader, val_loader
