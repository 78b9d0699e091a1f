"""PartNet (semantic assembly) dataset.

Counterpart of reference multi_part_assembly/datasets/partnet_data.py.
Loads the DGL-preprocessed per-shape npy dicts (`part_pcs, part_poses,
part_ids, geo_part_ids, sym, bbox`), pads everything to max_num_part, and
derives instance/match/contact labels exactly as the reference does.
"""

import collections
import os
import threading

import numpy as np

__all__ = ['PartNetPartDataset', 'build_partnet_dataloader']


class PartNetPartDataset:
    def __init__(self, data_dir, data_fn, data_keys, num_part_category=20,
                 min_num_part=2, max_num_part=20, shuffle_parts=False,
                 overfit=-1, level=3, cache_items=2048,
                 wire_dtype='float16'):
        self.data_dir = data_dir
        self.data_fn = data_fn
        self.num_part_category = num_part_category
        self.min_num_part = min_num_part
        self.max_num_part = max_num_part
        self.shuffle_parts = shuffle_parts
        self.level = level  # fixed in the paper (partnet_data.py:32)
        self.data_keys = tuple(data_keys)
        # packed-collation wire dtype (see geometry.py: f16 halves wire
        # bytes; quantization <=2.4e-4 at unit scale, parity-pinned)
        self.wire_dtype = np.dtype(wire_dtype)
        # LRU over raw npy dicts: the reference re-reads + unpickles every
        # shape every epoch (partnet_data.py:66); ~240KB/shape, so 2048
        # items is ~0.5GB for the level-3 sets
        self._cache_items = cache_items
        self._raw_cache = collections.OrderedDict()
        self._item_cache = collections.OrderedDict()  # derived (no pcs)
        # loader workers fetch items concurrently; get/move_to_end/popitem
        # sequences on the OrderedDicts must be atomic
        self._cache_lock = threading.Lock()
        self.shape_ids = self._read_data(data_fn)
        if overfit > 0:
            self.shape_ids = self.shape_ids[:overfit]
        # resident-HBM point table (datasets/part_table.py): set via
        # enable_device_table -> collate_batch ships part slot ids instead
        # of the packed point rows
        self._device_ptable = None

    def _shape_path(self, shape_id):
        return os.path.join(self.data_dir, 'shape_data',
                            f'{shape_id}_level{self.level}.npy')

    def _read_data(self, data_fn):
        """Filter shapes by part count (partnet_data.py:43-54)."""
        shape_ids = np.load(os.path.join(self.data_dir, data_fn))
        valid_shape_ids = []
        for shape_id in shape_ids:
            cur_data = np.load(self._shape_path(shape_id),
                               allow_pickle=True).item()
            num_parts = cur_data['part_pcs'].shape[0]
            if self.min_num_part <= num_parts <= self.max_num_part:
                valid_shape_ids.append(shape_id)
        return valid_shape_ids

    def _pad_data(self, data):
        data = np.asarray(data)
        pad_shape = (self.max_num_part, ) + tuple(data.shape[1:])
        pad_data = np.zeros(pad_shape, np.float32)
        pad_data[:data.shape[0]] = data
        return pad_data

    def set_epoch(self, epoch):
        pass  # no per-epoch resampling for PartNet

    def __len__(self):
        return len(self.shape_ids)

    def _load_raw(self, shape_id):
        with self._cache_lock:
            cached = self._raw_cache.get(shape_id)
            if cached is not None:
                self._raw_cache.move_to_end(shape_id)
                return cached
        data = np.load(self._shape_path(shape_id), allow_pickle=True).item()
        with self._cache_lock:
            self._raw_cache[shape_id] = data
            while len(self._raw_cache) > self._cache_items:
                self._raw_cache.popitem(last=False)
        return data

    def _load_contacts(self, shape_id):
        """Cached contact-point pair matrix (the reference re-reads the
        side file every epoch, partnet_data.py:210-214)."""
        key = ('contacts', shape_id)
        with self._cache_lock:
            cached = self._raw_cache.get(key)
            if cached is not None:
                self._raw_cache.move_to_end(key)
                return cached
        fn = os.path.join(
            self.data_dir, 'contact_points',
            f'pairs_with_contact_points_{shape_id}_level{self.level}.npy')
        data = np.load(fn, allow_pickle=True)
        with self._cache_lock:
            self._raw_cache[key] = data
            while len(self._raw_cache) > self._cache_items:
                self._raw_cache.popitem(last=False)
        return data

    def __getitem__(self, index):
        return self._item(index)[0]

    def _item(self, index, include_pcs=True):
        """Build one padded item dict; returns (dict, shuffled raw data,
        num_parts, perm) so `collate_batch` can pack the point clouds (or
        emit table slots, perm being the part-shuffle draw) without a
        second shuffle draw.  Without part shuffling the derived labels
        are deterministic, so they come from an LRU (instance numbering
        depends on the draw, so the shuffled path always re-derives)."""
        shape_id = self.shape_ids[index]
        cur_data = self._load_raw(shape_id)
        num_parts = cur_data['part_pcs'].shape[0]
        assert self.min_num_part <= num_parts <= self.max_num_part

        perm = None
        if self.shuffle_parts:  # kill part-order leakage (partnet_data.py:76)
            idx = perm = np.random.permutation(num_parts)
            cur_data = {k: np.asarray(v)[idx] for k, v in cur_data.items()}
        else:
            with self._cache_lock:
                cached = self._item_cache.get(index)
                if cached is not None:
                    self._item_cache.move_to_end(index)
            if cached is not None:
                data_dict = dict(cached)  # shallow copy: callers may add
                if include_pcs:
                    data_dict['part_pcs'] = self._pad_data(
                        cur_data['part_pcs'])
                return data_dict, cur_data, num_parts, None

        data_dict = {}
        if include_pcs:
            data_dict['part_pcs'] = self._pad_data(cur_data['part_pcs'])
        cur_pose = self._pad_data(cur_data['part_poses'])  # p x (3 + 4)
        data_dict['part_trans'] = cur_pose[:, :3]
        data_dict['part_quat'] = cur_pose[:, 3:]
        valids = np.zeros((self.max_num_part, ), np.float32)
        valids[:num_parts] = 1.0
        data_dict['part_valids'] = valids
        data_dict['data_id'] = index
        data_dict['shape_id'] = int(shape_id)

        # instance_label: nth-instance-within-class one-hot
        # (partnet_data.py:158-172)
        instance_label = np.zeros(
            (self.max_num_part, self.max_num_part), np.float32)
        cur_part_ids = np.asarray(cur_data['geo_part_ids'])
        num_per_class = [0] * (int(max(cur_part_ids)) + 1)
        for j in range(num_parts):
            cur_class = int(cur_part_ids[j])
            instance_label[j, num_per_class[cur_class]] = 1
            num_per_class[cur_class] += 1
        data_dict['instance_label'] = instance_label

        if 'part_label' in self.data_keys:  # one-hot semantic class (:176-185)
            cur_label = np.asarray(cur_data['part_ids']) - 1
            one_hot = np.zeros((num_parts, self.num_part_category),
                               np.float32)
            one_hot[np.arange(num_parts), cur_label.astype(int)] = 1.0
            data_dict['part_label'] = self._pad_data(one_hot)
        else:
            data_dict['part_label'] = np.zeros(
                (self.max_num_part, 0), np.float32)

        for key in self.data_keys:
            if key == 'part_label':
                continue
            if key == 'part_ids':
                data_dict['part_ids'] = self._pad_data(
                    cur_data['geo_part_ids'])
            elif key == 'match_ids':
                # group labels for equivalent parts (partnet_data.py:195-208)
                out = self._pad_data(cur_data['geo_part_ids'])
                index_ = 1
                for i in range(1, int(out.max()) + 1):
                    idx = np.where(out == i)[0]
                    if len(idx) == 0:
                        continue
                    if len(idx) == 1:
                        out[idx] = 0
                    else:
                        out[idx] = index_
                        index_ += 1
                data_dict['match_ids'] = out
            elif key == 'contact_points':
                cur_contacts = self._load_contacts(shape_id)
                out = np.zeros(
                    (self.max_num_part, self.max_num_part, 4), np.float32)
                out[:num_parts, :num_parts] = cur_contacts
                data_dict['contact_points'] = out
            elif key == 'sym':
                data_dict['sym'] = self._pad_data(cur_data['sym'])
            elif key == 'valid_matrix':
                vm = np.zeros(
                    (self.max_num_part, self.max_num_part), np.float32)
                vm[:num_parts, :num_parts] = 1.0
                data_dict['valid_matrix'] = vm
            else:
                raise ValueError(f'ERROR: unknown data {key}')

        if not self.shuffle_parts:
            small = {k: v for k, v in data_dict.items() if k != 'part_pcs'}
            with self._cache_lock:
                self._item_cache[index] = small
                while len(self._item_cache) > self._cache_items:
                    self._item_cache.popitem(last=False)
        return data_dict, cur_data, num_parts, perm

    def collate_batch(self, indices):
        """Batch-level collation with the point clouds packed (valid parts
        only): `part_pcs__packed [Kpad, N, 3]` + `pack_index [B, P]`,
        unpacked to the dense 'part_pcs' by a device-side selection matmul
        in `_prep_batch`.  Skips the per-item [P, N, 3] zero-padding and
        the 7.5MB np.stack, and cuts host->device bytes by the invalid
        fraction of the part axis.  Enabled by the loader only on
        single-local-device processes (see DataLoader.batch_collate)."""
        from .geometry import GeometryPartDataset
        from .loader import DataLoader
        if self._device_ptable is not None:
            return self._collate_table_slots(indices)
        dicts, pcs_list = [], []
        for index in indices:
            d, cur_data, _, _ = self._item(index, include_pcs=False)
            dicts.append(d)
            pcs_list.append(np.asarray(cur_data['part_pcs'], np.float32))
        batch = DataLoader._collate(dicts)

        B, P = len(indices), self.max_num_part
        counts = np.asarray([p.shape[0] for p in pcs_list], np.int64)
        N = pcs_list[0].shape[1]
        K = int(counts.sum())
        kpad = GeometryPartDataset._kpad(K, B * P)
        packed = np.zeros((kpad, N, 3), self.wire_dtype)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        if self.wire_dtype == np.float16:
            from .mesh_io import f32_to_f16  # C++ F16C; numpy is ~3ms/batch
            for off, p in zip(offsets, pcs_list):
                f32_to_f16(np.ascontiguousarray(p, np.float32),
                           packed[off:off + p.shape[0]])
        else:
            for off, p in zip(offsets, pcs_list):
                packed[off:off + p.shape[0]] = p
        row = np.arange(P)[None, :]
        mask = row < counts[:, None]
        pack_index = np.zeros((B, P), np.int32)
        pack_index[mask] = (offsets[:, None] + row)[mask]
        batch['part_pcs__packed'] = packed
        batch['pack_index'] = pack_index
        return batch

    def _collate_table_slots(self, indices):
        """Resident-table wire (datasets/part_table.py): ships
        `part_slots [B, P] int32` (global table rows, part-shuffle applied)
        plus the small label arrays; the point clouds never leave HBM.
        Every array has a batch axis, so this wire shards on any
        data-parallel mesh without the packed wire's single-device gate."""
        from .loader import DataLoader
        slot_base = self._device_ptable.slot_base
        dicts, slot_rows = [], []
        P = self.max_num_part
        for index in indices:
            d, _, num_parts, perm = self._item(index, include_pcs=False)
            dicts.append(d)
            row = np.zeros(P, np.int32)
            local = perm if perm is not None else np.arange(num_parts)
            row[:num_parts] = slot_base[index] + local
            slot_rows.append(row)
        batch = DataLoader._collate(dicts)
        batch['part_slots'] = np.stack(slot_rows)
        batch['__ptable__'] = self._device_ptable
        return batch


def enable_device_table(loader, cfg, mesh=None, budget_bytes=4 << 30):
    """Switch a PartNet loader to the resident-HBM point-table wire.

    Builds + uploads the table once (replicated across the mesh) and flips
    the dataset's collate to the slot wire.  Returns the PartPointTable,
    or None when the loader/dataset does not qualify (no packed collation
    or table over the HBM budget) -- the packed f16 wire stays in effect."""
    import functools

    import jax

    from .part_table import build_part_table
    ds = getattr(loader, 'dataset', None)
    if not isinstance(ds, PartNetPartDataset):
        return None
    if ds._device_ptable is not None:
        return ds._device_ptable
    put = None
    if mesh is not None:
        put = functools.partial(
            jax.device_put, device=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
    table = build_part_table(ds, put=put, budget_bytes=budget_bytes)
    if table is None:
        return None
    ds._device_ptable = table
    # the slot wire keeps a batch axis on every array, so it shards on any
    # data-parallel mesh -- unlike the packed wire, whose [Kpad] rows gate
    # batch collation to single-device processes (build_partnet_dataloader)
    loader.batch_collate = True
    return table


def build_partnet_dataloader(cfg):
    """Train + val loaders (reference partnet_data.py:243-277)."""
    from .loader import DataLoader
    common = dict(
        data_dir=cfg.data.data_dir,
        data_keys=cfg.data.data_keys,
        num_part_category=cfg.data.num_part_category,
        min_num_part=cfg.data.min_num_part,
        max_num_part=cfg.data.max_num_part,
        overfit=cfg.data.overfit,
        wire_dtype=cfg.data.get('wire_dtype', 'float16'),
    )
    train_set = PartNetPartDataset(
        data_fn=cfg.data.data_fn.format('train'),
        shuffle_parts=cfg.data.shuffle_parts, **common)
    val_set = PartNetPartDataset(
        data_fn=cfg.data.data_fn.format('val'), shuffle_parts=False, **common)
    import jax
    # see geometry.py rationale (single local device AND single process)
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
