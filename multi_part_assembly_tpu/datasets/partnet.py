"""PartNet (semantic assembly) dataset.

Counterpart of reference multi_part_assembly/datasets/partnet_data.py.
Loads the DGL-preprocessed per-shape npy dicts (`part_pcs, part_poses,
part_ids, geo_part_ids, sym, bbox`), pads everything to max_num_part, and
derives instance/match/contact labels exactly as the reference does.
"""

import collections
import os

import numpy as np

__all__ = ['PartNetPartDataset', 'build_partnet_dataloader']


class PartNetPartDataset:
    def __init__(self, data_dir, data_fn, data_keys, num_part_category=20,
                 min_num_part=2, max_num_part=20, shuffle_parts=False,
                 overfit=-1, level=3, cache_items=2048):
        self.data_dir = data_dir
        self.data_fn = data_fn
        self.num_part_category = num_part_category
        self.min_num_part = min_num_part
        self.max_num_part = max_num_part
        self.shuffle_parts = shuffle_parts
        self.level = level  # fixed in the paper (partnet_data.py:32)
        self.data_keys = tuple(data_keys)
        # LRU over raw npy dicts: the reference re-reads + unpickles every
        # shape every epoch (partnet_data.py:66); ~240KB/shape, so 2048
        # items is ~0.5GB for the level-3 sets
        self._cache_items = cache_items
        self._raw_cache = collections.OrderedDict()
        self.shape_ids = self._read_data(data_fn)
        if overfit > 0:
            self.shape_ids = self.shape_ids[:overfit]

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
        cached = self._raw_cache.get(shape_id)
        if cached is not None:
            self._raw_cache.move_to_end(shape_id)
            return cached
        data = np.load(self._shape_path(shape_id), allow_pickle=True).item()
        self._raw_cache[shape_id] = data
        while len(self._raw_cache) > self._cache_items:
            self._raw_cache.popitem(last=False)
        return data

    def __getitem__(self, index):
        shape_id = self.shape_ids[index]
        cur_data = self._load_raw(shape_id)
        num_parts = cur_data['part_pcs'].shape[0]
        assert self.min_num_part <= num_parts <= self.max_num_part

        if self.shuffle_parts:  # kill part-order leakage (partnet_data.py:76)
            idx = np.random.permutation(num_parts)
            cur_data = {k: np.asarray(v)[idx] for k, v in cur_data.items()}

        data_dict = {}
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
                fn = os.path.join(
                    self.data_dir, 'contact_points',
                    f'pairs_with_contact_points_{shape_id}_'
                    f'level{self.level}.npy')
                cur_contacts = np.load(fn, allow_pickle=True)
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
        return data_dict


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
    )
    train_set = PartNetPartDataset(
        data_fn=cfg.data.data_fn.format('train'),
        shuffle_parts=cfg.data.shuffle_parts, **common)
    val_set = PartNetPartDataset(
        data_fn=cfg.data.data_fn.format('val'), shuffle_parts=False, **common)
    train_loader = DataLoader(
        train_set, batch_size=cfg.exp.batch_size, shuffle=True,
        drop_last=True, num_workers=cfg.exp.num_workers)
    val_loader = DataLoader(
        val_set, batch_size=cfg.exp.batch_size * 2, shuffle=False,
        drop_last=False, num_workers=cfg.exp.num_workers)
    return train_loader, val_loader
