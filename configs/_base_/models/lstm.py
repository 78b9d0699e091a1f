"""LSTM model."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.name = 'lstm'
_C.rot_type = 'quat'
_C.pc_feat_dim = 128
_C.encoder = 'pointnet'
_C.lstm_hidden_size = 256


def get_cfg_defaults():
    return _C.clone()
