"""Visualization: rank val samples by prediction quality and export the
best ones as meshes + point clouds.

Parity with reference scripts/vis.py:
  - criterion `rot_pt_l2_loss + trans_mae`, best-first (vis.py:39-41, 58)
  - per part: original mesh, input-pose mesh (inverse-GT pmat), predicted
    mesh (pred pmat), plus sampled .ply clouds (vis.py:60-102)
Mesh IO uses the framework's own OBJ reader/writer + surface sampler
(trimesh is not in this image); colored whole-assembly clouds are exported
additionally.
"""

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
    parser.add_argument('--min_num_part', type=int, default=-1)
    parser.add_argument('--max_num_part', type=int, default=-1)
    parser.add_argument('--vis', type=int, default=10,
                        help='number of shapes to export')
    parser.add_argument('--out_dir', type=str, default='vis_out')
    args = parser.parse_args()

    from multi_part_assembly_tpu.parallel import init_distributed
    init_distributed()  # honors MPA_PLATFORM / MPA_NUM_CPU_DEVICES

    import jax

    from multi_part_assembly_tpu.datasets.mesh_io import (
        load_obj_numpy, sample_surface_numpy)
    from multi_part_assembly_tpu.train.trainer import Trainer, _prep_batch
    from multi_part_assembly_tpu.utils import (Rotation3D, apply_pmat,
                                               colorize_part_pc,
                                               load_cfg_file, rot_points_l2_loss,
                                               save_obj, save_pc,
                                               quaternion_to_rmat,
                                               trans_quat_to_pmat,
                                               trans_rmat_to_pmat,
                                               trans_metrics, transform_pc)

    cfg = load_cfg_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.category:
        cfg.data.category = args.category
    if args.min_num_part > 0:
        cfg.data.min_num_part = args.min_num_part
    if args.max_num_part > 0:
        cfg.data.max_num_part = args.max_num_part
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
        pred_rot = Rotation3D(pred['rot'], rot_type)
        # the reference's cherry-pick criterion (vis.py:41)
        crit = rot_points_l2_loss(
            batch['part_pcs'], pred_rot, gt_rot, batch['part_valids']) + \
            trans_metrics(pred['trans'], batch['part_trans'],
                          batch['part_valids'], metric='mae')
        return {
            'crit': crit,
            'pred_trans': pred['trans'],
            'pred_quat': pred_rot.convert('quat').rot,
            'gt_trans': batch['part_trans'],
            'gt_quat': gt_rot.convert('quat').rot,
            'pred_rot_raw': pred['rot'],
        }

    # pass 1: forward the whole val set, collect per-sample records
    records, crits = [], []
    for batch in trainer.val_loader:
        data_ids = np.asarray(batch.get('data_id', None))
        rng = jax.random.PRNGKey(len(records))
        device_batch, real_bs = _prep_batch(batch, cfg, trainer.mesh, rng)
        out = jax.tree_util.tree_map(np.asarray, forward(device_batch, rng))
        pts = np.asarray(device_batch['part_pcs'])
        valids = np.asarray(device_batch['part_valids'])
        for b in range(real_bs):
            records.append({
                'data_id': int(data_ids[b]) if data_ids.ndim else -1,
                'pred_trans': out['pred_trans'][b],
                'pred_quat': out['pred_quat'][b],
                'gt_trans': out['gt_trans'][b],
                'gt_quat': out['gt_quat'][b],
                'pred_rot_raw': out['pred_rot_raw'][b],
                'part_pcs': pts[b],
                'part_valids': valids[b],
            })
            crits.append(float(out['crit'][b]))

    top_idx = np.argsort(np.asarray(crits))[:args.vis]  # best first
    dataset = trainer.val_loader.dataset
    is_geometry = cfg.data.dataset == 'geometry'
    save_dir = os.path.join(args.out_dir, args.category or 'all')
    rng_np = np.random.default_rng(0)

    for rank, idx in enumerate(top_idx):
        rec = records[idx]
        p = int(rec['part_valids'].sum())

        if is_geometry and rec['data_id'] >= 0:
            mesh_rel = dataset.data_list[rec['data_id']]
            mesh_dir = os.path.join(dataset.data_dir, mesh_rel)
            mesh_files = sorted(os.listdir(mesh_dir))
            assert len(mesh_files) == p, (mesh_rel, len(mesh_files), p)
            sub = f"rank{rank}-{p}pcs-{mesh_rel.split('/')[-1]}"
            cur = os.path.join(save_dir, mesh_rel.split('/')[-2], sub)
        else:  # PartNet: no meshes on disk; clouds only
            mesh_files = []
            cur = os.path.join(save_dir, f'rank{rank}-{p}pcs-id{idx}')
        os.makedirs(cur, exist_ok=True)

        for i, mesh_file in enumerate(mesh_files):
            verts, faces = load_obj_numpy(os.path.join(mesh_dir, mesh_file))
            save_obj(verts, faces, os.path.join(cur, mesh_file))
            # input pose: R^T (mesh - T) (reference vis.py:80-86)
            gt_rmat = quaternion_to_rmat(rec['gt_quat'][i])
            init_pmat = np.asarray(trans_rmat_to_pmat(
                -(gt_rmat.T @ rec['gt_trans'][i]), gt_rmat.T))
            init_verts = apply_pmat(verts, init_pmat)
            save_obj(init_verts, faces,
                     os.path.join(cur, f'input_{mesh_file}'))
            init_pc = sample_surface_numpy(
                init_verts.astype(np.float32), faces, dataset.num_points,
                rng_np)
            save_pc(init_pc,
                    os.path.join(cur, f'input_{mesh_file[:-4]}.ply'))
            # predicted pose applied to the input mesh (vis.py:92-101)
            pred_pmat = np.asarray(trans_quat_to_pmat(
                rec['pred_trans'][i], rec['pred_quat'][i]))
            pred_verts = apply_pmat(init_verts, pred_pmat)
            save_obj(pred_verts, faces,
                     os.path.join(cur, f'pred_{mesh_file}'))
            pred_pc = sample_surface_numpy(
                pred_verts.astype(np.float32), faces, dataset.num_points,
                rng_np)
            save_pc(pred_pc,
                    os.path.join(cur, f'pred_{mesh_file[:-4]}.ply'))

        # colored whole-assembly clouds (input / gt / pred)
        pred_rot = Rotation3D(rec['pred_rot_raw'], rot_type)
        gt_rot = Rotation3D(rec['gt_quat'], 'quat').convert(rot_type)
        pred_pts = np.asarray(transform_pc(
            rec['pred_trans'], pred_rot, rec['part_pcs']))
        gt_pts = np.asarray(transform_pc(
            rec['gt_trans'], gt_rot, rec['part_pcs']))
        for tag, arr in [('pred', pred_pts), ('gt', gt_pts),
                         ('input', rec['part_pcs'])]:
            pc = colorize_part_pc(arr[:p], colors).reshape(-1, 6)
            save_pc(pc, os.path.join(cur, f'assembly_{tag}.ply'))

    print(f'Saving {len(top_idx)} predictions for visualization to '
          f'{save_dir}...')


if __name__ == '__main__':
    main()
