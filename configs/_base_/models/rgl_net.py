"""RGL-Net."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.name = 'rgl_net'
_C.rot_type = 'quat'
_C.pc_feat_dim = 128
_C.encoder = 'pointnet'
_C.gnn_iter = 3
_C.merge_node = True


def get_cfg_defaults():
    return _C.clone()
