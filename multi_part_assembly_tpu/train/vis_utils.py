"""Assembly sampling + visualization hooks.

Counterparts of the reference's `BaseModel.sample_assembly`
(base_model.py:427-460) and `PCAssemblyLogCallback` (utils/callback.py:9-46,
which logged wandb.Object3D point clouds every validation epoch).  Here the
sampled assemblies are exported as colored PLY files under the checkpoint
directory.
"""

import os

import jax
import numpy as np

from ..utils.misc import colorize_part_pc, save_pc
from ..utils.rotation import Rotation3D
from ..utils.transforms import transform_pc

__all__ = ['sample_assembly', 'export_assembly_samples']


def sample_assembly(model, variables, data_dict, rng, *, rot_type,
                    sample_iter=1, train=False):
    """Sample `sample_iter` predicted assemblies + the GT assembly.

    Returns (gt_pcs [B, P, N, 3], [sample_iter] list of pred pcs).
    """
    gt_rot = Rotation3D(data_dict['part_quat'], 'quat').convert(rot_type)
    part_pcs = data_dict['part_pcs']
    gt_pcs = transform_pc(data_dict['part_trans'], gt_rot, part_pcs)

    data = dict(data_dict)
    data['part_rot_raw'] = gt_rot.rot
    preds = []
    for i in range(sample_iter):
        k = jax.random.fold_in(rng, i)
        out = model.apply(
            variables, data, train=train,
            rngs={'noise': k, 'dropout': jax.random.fold_in(k, 1)})
        pred_rot = Rotation3D(out['rot'], rot_type)
        preds.append(transform_pc(out['trans'], pred_rot, part_pcs))
    return gt_pcs, preds


def export_assembly_samples(gt_pcs, pred_pcs_list, valids, colors, out_dir,
                            prefix='val', max_shapes=5):
    """Write colored PLYs: one GT + sample_iter predictions per shape."""
    os.makedirs(out_dir, exist_ok=True)
    gt = np.asarray(gt_pcs)
    valids = np.asarray(valids)
    colors = np.asarray(colors)
    n = min(max_shapes, gt.shape[0])
    for b in range(n):
        p = int(valids[b].sum())
        save_pc(
            colorize_part_pc(gt[b, :p], colors).reshape(-1, 6),
            os.path.join(out_dir, f'{prefix}_shape{b}_gt.ply'))
        for s, pred in enumerate(pred_pcs_list):
            pc = np.asarray(pred)[b, :p]
            save_pc(
                colorize_part_pc(pc, colors).reshape(-1, 6),
                os.path.join(out_dir, f'{prefix}_shape{b}_pred{s}.ply'))
    return n
