"""Default experimental settings."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.ckp_dir = 'checkpoint/'
_C.weight_file = ''
_C.num_workers = 8
_C.batch_size = 32
_C.num_epochs = 200
_C.val_every = 10  # evaluate every n training epochs
_C.val_sample_vis = 5  # sample visualizations
_C.seed = 0


def get_cfg_defaults():
    return _C.clone()
