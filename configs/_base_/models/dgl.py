"""DGL model."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.name = 'dgl'
_C.rot_type = 'quat'
_C.pc_feat_dim = 128
_C.encoder = 'pointnet'
_C.gnn_iter = 3  # 3 is faster and better than 5 per the reference
_C.merge_node = True  # pool/unpool geometrically equivalent parts


def get_cfg_defaults():
    return _C.clone()
