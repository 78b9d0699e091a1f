"""Auto-composed leaf config (dgl-32x1-cosine_200e-everyday)."""

import os

from multi_part_assembly_tpu.utils import CN, merge_cfg

_base_ = {
    'exp': '../_base_/default_exp.py',
    'data': '../_base_/datasets/breaking_bad/everyday.py',
    'optimizer': '../_base_/schedules/adam_cosine.py',
    'model': '../_base_/models/dgl.py',
    'loss': '../_base_/models/loss/geometric_loss.py',
}

_C = CN()
_C.model = CN()
_C.model.merge_node = False
_C.data = CN()
_C.data.data_keys = ('part_ids', 'valid_matrix')
_C.exp = CN()
_C.exp.val_every = 5

def get_cfg_defaults():
    base_cfg = _C.clone()
    cfg = merge_cfg(base_cfg, os.path.dirname(os.path.abspath(__file__)),
                    _base_)
    return cfg
