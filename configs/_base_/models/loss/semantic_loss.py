"""Loss configuration for semantic assembly."""

from multi_part_assembly_tpu.utils import CN

_C = CN()
_C.noise_dim = 32  # stochastic PoseRegressor
_C.sample_iter = 5  # MoN loss sampling
_C.trans_loss_w = 1.
_C.rot_pt_cd_loss_w = 10.
_C.transform_pt_cd_loss_w = 10.
_C.use_rot_loss = False  # no direct rotation loss (part symmetry)
_C.use_rot_pt_l2_loss = False


def get_cfg_defaults():
    return _C.clone()
