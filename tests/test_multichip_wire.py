"""Multi-chip fast-wire tests (VERDICT r3 next-1).

The packed f16 wire, the device-sampling slot wire, and steps_per_call
grouping all work across a data-parallel mesh: each collated batch carries
one row group per data-axis device ([D, Kpad, ...]), the device hop runs
per shard (shard_map around the pallas sampler; partition-friendly vmapped
matmuls for the f16 expand), and the resulting dense batch lands sharded
on `data` exactly like the slow wire's.  These tests run on the virtual
8-device CPU mesh with interpret-mode pallas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from test_datasets import _write_cube, bb_tree  # noqa: F401 (fixture)

from multi_part_assembly_tpu.datasets import (DataLoader,
                                              GeometryPartDataset)
from multi_part_assembly_tpu.datasets import device_sampler as dsmp
from multi_part_assembly_tpu.datasets.geometry import (
    configure_wire_shards, enable_device_sampling, expand_geometry_batch,
    expand_geometry_batch_sharded)
from multi_part_assembly_tpu.parallel import make_mesh
from multi_part_assembly_tpu.train.trainer import (_prep_batch,
                                                   install_device_prep)
from multi_part_assembly_tpu.utils import CN


def _loader(bb_tree, batch_size=4, num_points=32, max_parts=8):
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt',
        data_keys=('part_ids', 'valid_matrix'), num_points=num_points,
        min_num_part=2, max_num_part=max_parts)
    return DataLoader(ds, batch_size=batch_size, shuffle=False,
                      drop_last=False, num_workers=1, batch_collate=True)


def _cfg(batch_size=4, num_points=32, max_parts=8):
    return CN({'data': CN({'dataset': 'geometry', 'max_num_part': max_parts,
                           'num_pc_points': num_points,
                           'data_keys': ('part_ids', 'valid_matrix')}),
               'exp': CN({'batch_size': batch_size})})


def test_sharded_f16_wire_matches_slow_wire(bb_tree):
    """[D, Kpad] packed wire through a 4-device data axis reproduces the
    identical dense batch the 1-device wire produces on the same data."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices(), batch_size=4)  # data axis = 4
    assert mesh.shape['data'] == 4
    loader = _loader(bb_tree)
    assert configure_wire_shards(loader, mesh) == 4
    loader.set_epoch(0)
    host = next(iter(loader))
    # 3 shapes (2+3+5 parts) padded to B=4 by edge replication
    assert host['part_counts'].shape == (4, 1)
    assert host['real_bs'] == 3
    assert host['part_pcs_raw__packed'].ndim == 4  # [D, Kpad, N, 3]
    batch, bs = _prep_batch(host, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    assert bs == 3
    assert batch['part_pcs_raw'].shape == (4, 8, 32, 3)
    assert 'data' in str(batch['part_pcs_raw'].sharding.spec)

    # reference: the 1-device wire on the same dataset state
    loader.dataset.wire_shards = 1
    mesh1 = make_mesh(jax.devices()[:1], batch_size=4)
    loader.set_epoch(0)
    host1 = next(iter(loader))
    ref, _ = _prep_batch(host1, cfg, mesh1, jax.random.PRNGKey(0),
                         augment=False)
    for k in ('part_pcs_raw', 'part_valids', 'part_ids', 'valid_matrix'):
        np.testing.assert_array_equal(
            np.asarray(batch[k])[:3], np.asarray(ref[k]))
    # padding rows replicate the last sample
    np.testing.assert_array_equal(np.asarray(batch['part_pcs_raw'])[3],
                                  np.asarray(ref['part_pcs_raw'])[2])


def test_sharded_slot_wire_matches_per_shard_sampling(bb_tree):
    """shard_map'd device sampling == the unsharded sampler run shard by
    shard with the same seeds (exact equality: same kernel, same keys)."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices(), batch_size=4)
    loader = _loader(bb_tree)
    configure_wire_shards(loader, mesh)
    tables = enable_device_sampling(loader, cfg, mesh=mesh)
    assert tables is not None and tables.interpret
    loader.set_epoch(0)
    host = next(iter(loader))
    assert host['part_slots__packed'].shape[0] == 4   # [D, Kpad]
    assert host['sample_seed'].shape == (4, )
    batch, bs = _prep_batch(host, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    assert bs == 3
    out = np.asarray(batch['part_pcs_raw'])           # [4, P, N, 3]

    for d in range(4):
        ref = dsmp.sample_and_expand(
            tables.table, tables.n_faces,
            jnp.asarray(host['part_slots__packed'][d]),
            jnp.asarray(host['part_counts'][d]),
            jnp.asarray(host['sample_seed'][d]),
            n_points=32, max_parts=8,
            data_keys=('part_ids', 'valid_matrix'), interpret=True)
        np.testing.assert_array_equal(out[d],
                                      np.asarray(ref['part_pcs_raw'])[0])
    # distinct shards draw distinct streams (per-shard seeds)
    assert not np.array_equal(out[2], out[3]) or \
        host['part_counts'][2, 0] != host['part_counts'][3, 0]


def test_sharded_slot_wire_chunked_matches_dense(bb_tree):
    """The chunked table layout rides the multi-device slot wire too, and
    lands bit-identical dense batches (same draws: the chunked kernel is
    draw-equivalent to dense, test_device_sampler pins the kernels; this
    pins the [D, Kpad] wire integration)."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices(), batch_size=4)
    loader = _loader(bb_tree)
    configure_wire_shards(loader, mesh)
    outs = {}
    for layout in ('dense', 'chunked'):
        loader.dataset._device_tables = None
        tables = enable_device_sampling(loader, cfg, mesh=mesh,
                                        layout=layout)
        assert tables is not None
        expect = dsmp._N_ROWS if layout == 'dense' else dsmp._N_ROWS_C
        assert tables.table.shape[1] == expect
        loader.set_epoch(0)
        host = next(iter(loader))
        assert host['part_slots__packed'].shape[0] == 4
        batch, bs = _prep_batch(host, cfg, mesh, jax.random.PRNGKey(0),
                                augment=False)
        assert bs == 3
        outs[layout] = np.asarray(batch['part_pcs_raw'])
    np.testing.assert_array_equal(outs['dense'], outs['chunked'])


def test_sharded_wire_has_no_collectives(bb_tree):
    """The fast wire must stay embarrassingly parallel over `data`: its
    executables carry no collectives, so producer threads may dispatch
    them in any order relative to collective-bearing train steps on a
    multi-host mesh."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices(), batch_size=4)
    loader = _loader(bb_tree)
    configure_wire_shards(loader, mesh)
    tables = enable_device_sampling(loader, cfg, mesh=mesh)
    loader.set_epoch(0)
    host = next(iter(loader))
    from multi_part_assembly_tpu.parallel.mesh import put_sharded
    from jax.sharding import PartitionSpec as P
    dev = put_sharded({'slots': host['part_slots__packed'],
                       'counts': host['part_counts'],
                       'seeds': host['sample_seed']}, mesh, P('data'))
    lowered = dsmp.sample_and_expand_sharded.lower(
        tables.table, tables.n_faces, dev['slots'], dev['counts'],
        dev['seeds'], mesh, n_points=32, max_parts=8,
        data_keys=('part_ids', 'valid_matrix'), interpret=True)
    hlo = lowered.compile().as_text()
    for op in ('all-reduce', 'all-gather', 'all-to-all',
               'collective-permute', 'reduce-scatter'):
        assert op not in hlo, f'fast wire lowered a {op}'


def test_grouped_sharded_slot_wire(bb_tree):
    """G collated sharded batches ride one grouped dispatch: [G, D, ...]
    wire -> [G, B, ...] dense stack for make_train_step_multi."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices(), batch_size=4)
    loader = _loader(bb_tree, batch_size=4)
    loader.drop_last = False
    configure_wire_shards(loader, mesh)
    enable_device_sampling(loader, cfg, mesh=mesh)
    install_device_prep(loader, cfg, mesh, group_size=1)
    # group manually: two epochs' worth of the same (only) batch
    loader.set_epoch(0)
    raw = loader.dataset.collate_batch(list(range(3)) + [2])
    group = None
    install_device_prep(loader, cfg, mesh, group_size=2)
    group = loader.group_transform([raw, raw])
    assert group['__group__'] == 2
    assert group['part_pcs_raw'].shape == (2, 4, 8, 32, 3)
    batch, bs = _prep_batch(group, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    assert bs == 4
    # both group steps came from the same collated batch -> identical
    np.testing.assert_array_equal(np.asarray(batch['part_pcs_raw'][0]),
                                  np.asarray(batch['part_pcs_raw'][1]))
    np.testing.assert_array_equal(np.asarray(batch['part_valids'][0]),
                                  np.asarray(batch['part_valids'][1]))


def test_grouped_sharded_f16_wire(bb_tree):
    cfg = _cfg()
    mesh = make_mesh(jax.devices(), batch_size=4)
    loader = _loader(bb_tree, batch_size=4)
    configure_wire_shards(loader, mesh)
    install_device_prep(loader, cfg, mesh, group_size=2)
    raw = loader.dataset.collate_batch(list(range(3)) + [2])
    group = loader.group_transform([raw, raw])
    assert group['part_pcs_raw'].shape == (2, 4, 8, 32, 3)
    single, _ = _prep_batch(raw, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    np.testing.assert_array_equal(np.asarray(group['part_pcs_raw'][0]),
                                  np.asarray(single['part_pcs_raw']))


def test_trainer_end_to_end_sharded_slot_wire_grouped(bb_tree, tmp_path):
    """Full Trainer epoch over the 8-device mesh with device sampling ON
    and steps_per_call=2: the slot wire + grouped steps, not the slow
    fallback (VERDICT r3 next-1 done criteria)."""
    from multi_part_assembly_tpu.train.trainer import Trainer
    cfg = CN()
    cfg.exp = CN({'batch_size': 2, 'num_epochs': 2, 'val_every': 2,
                  'num_workers': 1, 'ckp_dir': str(tmp_path / 'ckp'),
                  'seed': 0, 'val_sample_vis': 0, 'weight_file': '',
                  'steps_per_call': 2})
    cfg.data = CN({
        'dataset': 'geometry', 'data_dir': bb_tree,
        'data_fn': 'everyday.{}.txt', 'data_keys': ('part_ids', ),
        'category': '', 'rot_range': -1., 'num_pc_points': 24,
        'min_num_part': 2, 'max_num_part': 8, 'shuffle_parts': False,
        'overfit': -1, 'device_sampling': True,
    })
    cfg.optimizer = CN({'lr': 1e-3, 'weight_decay': 0., 'warmup_ratio': 0.,
                        'clip_grad': None, 'lr_scheduler': 'cosine',
                        'lr_decay_factor': 100.})
    cfg.model = CN({'name': 'global', 'rot_type': 'quat', 'pc_feat_dim': 16,
                    'encoder': 'pointnet'})
    cfg.loss = CN({'noise_dim': 4, 'sample_iter': 1, 'trans_loss_w': 1.,
                   'rot_pt_cd_loss_w': 10., 'transform_pt_cd_loss_w': 10.,
                   'use_rot_loss': True, 'rot_loss_w': 0.2,
                   'use_rot_pt_l2_loss': True, 'rot_pt_l2_loss_w': 1.})
    cfg.freeze()
    trainer = Trainer(cfg, quiet=True)
    try:
        assert trainer.mesh.shape['data'] == 2
        assert trainer.train_loader.dataset.wire_shards == 2
        assert trainer.train_loader.dataset._device_tables is not None
        assert trainer.steps_per_call == 2
        trainer.fit()
        assert int(trainer.state.step) == 2  # 3 shapes/bs2 -> 1 step/epoch
        metrics = trainer.validate(1)
        assert np.isfinite(metrics['val/loss'])
    finally:
        trainer.close()
