"""Auto-composed leaf config (rgl_net-32x1-cosine_300e-partnet_chair)."""

import os

from multi_part_assembly_tpu.utils import CN, merge_cfg

_base_ = {
    'exp': '../_base_/default_exp.py',
    'data': '../_base_/datasets/partnet/partnet_chair.py',
    'optimizer': '../_base_/schedules/adam_cosine.py',
    'model': '../_base_/models/rgl_net.py',
    'loss': '../_base_/models/loss/semantic_loss.py',
}

_C = CN()
_C.exp = CN()
_C.exp.num_epochs = 300
_C.exp.val_every = 5
_C.data = CN()
_C.data.data_keys = ('part_ids', 'match_ids', 'contact_points', 'valid_matrix')

def get_cfg_defaults():
    base_cfg = _C.clone()
    cfg = merge_cfg(base_cfg, os.path.dirname(os.path.abspath(__file__)),
                    _base_)
    return cfg
