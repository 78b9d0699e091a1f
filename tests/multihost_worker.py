"""Worker process for the 2-process `jax.distributed` CPU test.

Each worker owns 2 virtual CPU devices; together they form a 2-host x
2-device global mesh -- the smallest topology that exercises every
multi-host code path the reference's DDP ran daily
(/root/reference/scripts/train.py:85): per-process loader sharding,
global-batch assembly from host-local data, cross-host gradient/metric
reduction inside the jitted step, eval `process_allgather`, and a
multiprocess Orbax checkpoint save.

Launched by tests/test_multihost.py; not a pytest module itself.
"""

import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--coordinator', required=True)
    p.add_argument('--num_processes', type=int, required=True)
    p.add_argument('--process_id', type=int, required=True)
    p.add_argument('--data_dir', required=True)
    p.add_argument('--ckp_dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--mode', default='packed', choices=['packed', 'slots'])
    args = p.parse_args()

    # 2 virtual CPU devices per process; must be set before jax backend init
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=2').strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')  # sitecustomize ignores env
    jax.config.update('jax_num_cpu_devices', 2)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)

    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * args.num_processes

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from multi_part_assembly_tpu.train.trainer import Trainer
    from multi_part_assembly_tpu.utils import CN

    cfg = CN()
    cfg.exp = CN({'batch_size': 4, 'num_epochs': 1, 'val_every': 1,
                  'num_workers': 0, 'ckp_dir': args.ckp_dir, 'seed': 0,
                  'val_sample_vis': 0, 'weight_file': ''})
    cfg.data = CN({
        'dataset': 'geometry', 'data_dir': args.data_dir,
        'data_fn': 'everyday.{}.txt', 'data_keys': ('part_ids', ),
        'category': '', 'rot_range': -1., 'num_pc_points': 24,
        'min_num_part': 2, 'max_num_part': 4, 'shuffle_parts': False,
        'overfit': -1,
        # slots mode: force the device-sampling slot wire ('auto' keeps
        # the host wire on the CPU backend) -- the per-batch wire then
        # carries piece ids and the replicated tables are device_put onto
        # the GLOBAL (cross-process) mesh
        'device_sampling': args.mode == 'slots',
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

    trainer = Trainer(cfg, ckp_dir=args.ckp_dir, resume=False, quiet=True)
    # per-process loader shard: 8 shapes -> 4 per host -> 1 batch of 4
    assert trainer.train_loader._num_shards == args.num_processes, \
        trainer.train_loader._num_shards
    assert len(trainer.train_loader) == 1, len(trainer.train_loader)
    # multi-host rides the SHARDED fast wire since round 4: packed rows
    # carry a per-device shard axis, Kpad pinned to the dense bound so
    # every host picks the same bucket without seeing peers' data
    assert trainer.train_loader.batch_collate
    ds = trainer.train_loader.dataset
    assert ds.wire_shards == 2, ds.wire_shards  # 4-device axis / 2 hosts
    assert ds.fixed_kpad
    raw = ds.collate_batch([0, 1, 2, 3])
    if args.mode == 'slots':
        # device-sampling slot wire active on every rank (VERDICT r4 #8)
        assert ds._device_tables is not None
        assert raw['part_slots__packed'].shape[0] == 2  # [D_local, Kpad]
    else:
        assert ds._device_tables is None
        assert raw['part_counts'].shape == (2, 2)   # [D_local, Bs]
        assert raw['part_pcs_raw__packed'].shape[0] == 2

    def param_sum(state):
        """Exact (order-stable f64 host) parameter checksum."""
        import numpy as np
        leaves = jax.tree_util.tree_leaves(state.params)
        return float(sum(np.abs(np.asarray(x, np.float64)).sum()
                         for x in leaves))

    trainer.fit()  # 1 epoch: train steps + validate + Orbax checkpoint
    metrics = trainer.validate(0)  # all-reduced across hosts
    sum_final = param_sum(trainer.state)
    trainer.close()

    # mid-run resume across BOTH processes: a fresh Trainer restores the
    # multiprocess Orbax checkpoint to the EXACT trained parameters and
    # keeps evaluating (the reference exercises DDP resume on every
    # requeued run).  Eval metrics are rng-stream dependent (MoN noise),
    # so the bit-level evidence is the parameter checksum.
    trainer2 = Trainer(cfg, ckp_dir=args.ckp_dir, resume=True, quiet=True)
    assert trainer2.start_epoch == 1, trainer2.start_epoch
    if args.mode == 'slots':
        assert trainer2.train_loader.dataset._device_tables is not None
    sum_resumed = param_sum(trainer2.state)
    resumed = trainer2.validate(0)
    trainer2.close()

    with open(args.out, 'w') as f:
        json.dump({
            'final': {k: float(v) for k, v in metrics.items()},
            'resumed': {k: float(v) for k, v in resumed.items()},
            'param_sum_final': sum_final,
            'param_sum_resumed': sum_resumed,
        }, f)
    print(f'worker {args.process_id}: OK', flush=True)


if __name__ == '__main__':
    main()
