"""Loss configuration for geometric assembly."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.noise_dim = 0  # no stochastic sampling
_C.sample_iter = 1
_C.trans_loss_w = 1.
_C.rot_pt_cd_loss_w = 10.
_C.transform_pt_cd_loss_w = 10.
_C.use_rot_loss = True  # rotation is hard on this data; direct loss helps
_C.rot_loss_w = 0.2
_C.use_rot_pt_l2_loss = True
_C.rot_pt_l2_loss_w = 1.


def get_cfg_defaults():
    return _C.clone()
