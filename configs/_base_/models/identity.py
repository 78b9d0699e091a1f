"""Identity model."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.name = 'identity'
_C.rot_type = 'quat'
_C.pc_feat_dim = 128


def get_cfg_defaults():
    return _C.clone()
