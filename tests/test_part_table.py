"""Resident-HBM point table for PartNet (datasets/part_table.py).

The slot wire replaces the packed f16 point wire for semantic datasets
(VERDICT r3 next-2a): clouds upload once as bf16 split planes, each batch
ships only [B, P] slot ids, and a one-hot bf16 matmul gathers exactly the
f16-quantized coordinates on device.
"""

import numpy as np
import pytest

from multi_part_assembly_tpu.datasets.loader import DataLoader
from multi_part_assembly_tpu.datasets.part_table import (
    _split_planes, build_part_table, gather_part_table,
    gather_part_table_multi)
from multi_part_assembly_tpu.datasets.partnet import (PartNetPartDataset,
                                                      enable_device_table)


@pytest.fixture
def partnet_tree(tmp_path):
    root = tmp_path / 'partnet'
    (root / 'shape_data').mkdir(parents=True)
    (root / 'contact_points').mkdir()
    rng = np.random.default_rng(3)
    ids = []
    for shape_id, n_parts in [(101, 3), (102, 2), (103, 4)]:
        q = rng.normal(size=(n_parts, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        data = {
            'part_pcs': rng.normal(size=(n_parts, 20, 3)).astype(np.float32),
            'part_poses': np.concatenate(
                [rng.normal(size=(n_parts, 3)), q], 1).astype(np.float32),
            'part_ids': np.arange(1, n_parts + 1),
            'geo_part_ids': [1, 1] + list(range(2, n_parts)),
            'sym': np.zeros((n_parts, 3), np.float32),
        }
        np.save(root / 'shape_data' / f'{shape_id}_level3.npy', data,
                allow_pickle=True)
        np.save(root / 'contact_points' /
                f'pairs_with_contact_points_{shape_id}_level3.npy',
                np.zeros((n_parts, n_parts, 4), np.float32),
                allow_pickle=True)
        ids.append(shape_id)
    for split in ['train', 'val']:
        np.save(root / f'Chair.{split}.npy', np.asarray(ids))
    return str(root)


DATA_KEYS = ('part_ids', 'match_ids', 'contact_points', 'valid_matrix')


def _make_ds(root, shuffle=False):
    return PartNetPartDataset(
        data_dir=root, data_fn='Chair.train.npy', data_keys=DATA_KEYS,
        num_part_category=20, min_num_part=2, max_num_part=5,
        shuffle_parts=shuffle)


def test_split_planes_reconstruct_f16_exactly():
    rng = np.random.default_rng(0)
    pcs = (rng.standard_normal((7, 33, 3)) * np.logspace(
        -3, 2, 7)[:, None, None]).astype(np.float32)
    hi, lo = _split_planes(pcs)
    rec = hi.astype(np.float32) + lo.astype(np.float32)
    want = pcs.reshape(7, -1).astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(rec, want)


def test_gather_matches_f16_dense(partnet_tree):
    """Slot-wire gather == f16 quantization of the dense per-item clouds
    (bit-exact: the one-hot bf16 matmul never rounds, module docstring)."""
    import jax.numpy as jnp
    ds = _make_ds(partnet_tree)
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                        num_workers=1, batch_collate=True)

    class _Cfg:  # enable_device_table only touches the loader/dataset
        pass

    table = enable_device_table(loader, _Cfg())
    assert table is not None and ds._device_ptable is table
    batch = ds.collate_batch([0, 1, 2])
    assert 'part_slots' in batch and 'part_pcs__packed' not in batch
    pcs = np.asarray(gather_part_table(
        table.table, jnp.asarray(batch['part_slots']),
        jnp.asarray(batch['part_valids'])))
    for row, i in enumerate([0, 1, 2]):
        item = ds[i]
        want = item['part_pcs'].astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(pcs[row], want)
        for k in ('part_trans', 'part_quat', 'part_valids', 'match_ids',
                  'instance_label', 'contact_points', 'valid_matrix'):
            np.testing.assert_array_equal(batch[k][row], item[k])


def test_gather_shuffle_keeps_pose_cloud_pairing(partnet_tree):
    """With part shuffling the slots must ride the SAME permutation as the
    derived labels: every valid row's (cloud, pose) pair must exist in the
    raw data."""
    import jax.numpy as jnp
    ds = _make_ds(partnet_tree, shuffle=True)
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                        num_workers=1, batch_collate=True)
    table = enable_device_table(loader, object())
    np.random.seed(5)
    batch = ds.collate_batch([0, 1, 2])
    pcs = np.asarray(gather_part_table(
        table.table, jnp.asarray(batch['part_slots']),
        jnp.asarray(batch['part_valids'])))
    for row, i in enumerate([0, 1, 2]):
        raw = ds._load_raw(ds.shape_ids[i])
        n = raw['part_pcs'].shape[0]
        for j in range(n):
            pose = np.concatenate([batch['part_trans'][row, j],
                                   batch['part_quat'][row, j]])
            # find the raw part with this pose (poses are unique here)
            k = int(np.argmin(
                np.abs(raw['part_poses'] - pose).sum(-1)))
            np.testing.assert_array_equal(
                pcs[row, j],
                raw['part_pcs'][k].astype(np.float16).astype(np.float32))


def test_gather_multi_matches_single(partnet_tree):
    import jax.numpy as jnp
    ds = _make_ds(partnet_tree)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1, batch_collate=True)
    table = enable_device_table(loader, object())
    b1 = ds.collate_batch([0, 1])
    b2 = ds.collate_batch([2, 0])
    slots = jnp.stack([jnp.asarray(b1['part_slots']),
                       jnp.asarray(b2['part_slots'])])
    valids = jnp.stack([jnp.asarray(b1['part_valids']),
                        jnp.asarray(b2['part_valids'])])
    grouped = np.asarray(gather_part_table_multi(table.table, slots, valids))
    for g, b in enumerate([b1, b2]):
        single = np.asarray(gather_part_table(
            table.table, jnp.asarray(b['part_slots']),
            jnp.asarray(b['part_valids'])))
        np.testing.assert_array_equal(grouped[g], single)


def test_gather_rows_bit_identical_to_onehot(partnet_tree):
    """Large-table row-gather path == one-hot matmul path bit-for-bit
    (both select the same bf16 planes; the hi+lo sum is f32 either way).
    The row path bounds per-batch cost by B*P instead of the table size
    (ADVICE r4 medium)."""
    import jax.numpy as jnp

    from multi_part_assembly_tpu.datasets.part_table import (_gather_onehot,
                                                             _gather_rows)
    ds = _make_ds(partnet_tree)
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                        num_workers=1, batch_collate=True)
    table = enable_device_table(loader, object())
    batch = ds.collate_batch([0, 1, 2])
    slots = jnp.asarray(batch['part_slots'])
    valids = jnp.asarray(batch['part_valids'])
    a = np.asarray(_gather_onehot(table.table, slots, valids))
    b = np.asarray(_gather_rows(table.table, slots, valids))
    np.testing.assert_array_equal(a, b)


def test_budget_gate(partnet_tree):
    ds = _make_ds(partnet_tree)
    assert build_part_table(ds, budget_bytes=8) is None
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1, batch_collate=True)
    from multi_part_assembly_tpu.datasets import partnet as pn
    assert pn.enable_device_table(loader, object(),
                                  budget_bytes=8) is None
    # fallback stays on the packed wire
    batch = ds.collate_batch([0, 1])
    assert 'part_pcs__packed' in batch
