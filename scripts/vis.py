"""Visualization: export worst/best assembly results as colored PLY point
clouds (reference scripts/vis.py:22-102 exported meshes via trimesh; here
point clouds via the built-in PLY writer since meshes' sampled points are
the model input anyway)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description='Visualization script')
    parser.add_argument('--cfg_file', required=True, type=str)
    parser.add_argument('--weight', type=str, default='')
    parser.add_argument('--opts', nargs='*', default=[],
                        help='config overrides: key value [key value ...]')
    parser.add_argument('--category', type=str, default='')
    parser.add_argument('--vis', type=int, default=10,
                        help='number of shapes to export')
    parser.add_argument('--out_dir', type=str, default='vis_out')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multi_part_assembly_tpu.train.trainer import Trainer, _prep_batch
    from multi_part_assembly_tpu.train.core import mon_loss
    from multi_part_assembly_tpu.utils import (Rotation3D, colorize_part_pc,
                                               load_cfg_file, save_pc,
                                               transform_pc)

    cfg = load_cfg_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.category:
        cfg.data.category = args.category
    cfg.freeze()

    trainer = Trainer(cfg, ckp_dir=os.path.join(args.out_dir, '_tmp'),
                      resume=False, quiet=True)
    if args.weight:
        trainer.load_weights(args.weight)
    model, state = trainer.model, trainer.state
    rot_type = cfg.model.rot_type

    os.makedirs(args.out_dir, exist_ok=True)
    colors = np.asarray(cfg.data.colors)

    @jax.jit
    def forward(batch, rng):
        gt_rot = Rotation3D(batch['part_quat'], 'quat').convert(rot_type)
        data = dict(batch)
        data['part_rot_raw'] = gt_rot.rot
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        pred = model.apply(
            variables, data, train=False,
            rngs={'noise': rng, 'dropout': rng})
        return pred, gt_rot.rot

    n_done = 0
    for batch in trainer.val_loader:
        rng = jax.random.PRNGKey(n_done)
        device_batch, real_bs = _prep_batch(batch, cfg, trainer.mesh, rng)
        pred, gt_rot_raw = forward(device_batch, rng)
        pred_rot = Rotation3D(pred['rot'], rot_type)
        gt_rot = Rotation3D(gt_rot_raw, rot_type)
        pts = device_batch['part_pcs']
        pred_pts = np.asarray(transform_pc(pred['trans'], pred_rot, pts))
        gt_pts = np.asarray(
            transform_pc(device_batch['part_trans'], gt_rot, pts))
        valids = np.asarray(device_batch['part_valids'])
        for b in range(real_bs):
            if n_done >= args.vis:
                print(f'exported {n_done} shapes to {args.out_dir}')
                return
            p = int(valids[b].sum())
            for tag, arr in [('pred', pred_pts), ('gt', gt_pts),
                             ('input', np.asarray(pts))]:
                pc = colorize_part_pc(arr[b, :p], colors).reshape(-1, 6)
                save_pc(pc, os.path.join(
                    args.out_dir, f'shape{n_done}_{tag}.ply'))
            n_done += 1
    print(f'exported {n_done} shapes to {args.out_dir}')


if __name__ == '__main__':
    main()
