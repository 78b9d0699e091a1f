"""Auto-composed leaf config (pn_transformer-32x1-cosine_400e-partnet_chair)."""

import os

from multi_part_assembly_tpu.utils import CN, merge_cfg

_base_ = {
    'exp': '../../_base_/default_exp.py',
    'data': '../../_base_/datasets/partnet/partnet_chair.py',
    'optimizer': '../../_base_/schedules/adam_cosine.py',
    'model': '../../_base_/models/pn_transformer/pn_transformer.py',
    'loss': '../../_base_/models/loss/semantic_loss.py',
}

_C = CN()
_C.exp = CN()
_C.exp.num_epochs = 400

_C.optimizer = CN()
_C.optimizer.warmup_ratio = 0.05

def get_cfg_defaults():
    base_cfg = _C.clone()
    cfg = merge_cfg(base_cfg, os.path.dirname(os.path.abspath(__file__)),
                    _base_)
    return cfg
