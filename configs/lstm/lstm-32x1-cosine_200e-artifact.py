"""Auto-composed leaf config (lstm-32x1-cosine_200e-artifact)."""

import os

from multi_part_assembly_tpu.utils import CN, merge_cfg

_base_ = {
    'exp': '../_base_/default_exp.py',
    'data': '../_base_/datasets/breaking_bad/artifact.py',
    'optimizer': '../_base_/schedules/adam_cosine.py',
    'model': '../_base_/models/lstm.py',
    'loss': '../_base_/models/loss/geometric_loss.py',
}

_C = CN()


def get_cfg_defaults():
    base_cfg = _C.clone()
    cfg = merge_cfg(base_cfg, os.path.dirname(os.path.abspath(__file__)),
                    _base_)
    return cfg
