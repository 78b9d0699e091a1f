from .config_utils import CN, CfgNode, cfg_to_dict, load_cfg_file, merge_cfg
from .eval_utils import (calc_connectivity_acc, calc_part_acc, rot_metrics,
                         trans_metrics)
from .loss import (_valid_mean, repulsion_cd_loss, rot_cosine_loss,
                   rot_l2_loss, rot_points_cd_loss, rot_points_l2_loss,
                   shape_cd_loss, trans_l2_loss)
from .misc import (apply_pmat, colorize_part_pc, pickle_dump, pickle_load,
                   save_obj, save_pc, wd_param_mask)
from .precision import compute_dtype, configure_precision, set_compute_dtype
from .rotation import (Rotation3D, axis_angle_to_matrix,
                       axis_angle_to_quaternion, matrix_to_axis_angle,
                       matrix_to_quaternion, qeuler, quaternion_apply,
                       quaternion_invert, quaternion_multiply,
                       quaternion_to_axis_angle, quaternion_to_matrix,
                       rot6d_to_matrix, standardize_quaternion)
from .transforms import (qmul, qrmat, qrot, qrot_np, qtransform,
                         qtransform_invert, qtransform_np,
                         quaternion_to_rmat, random_quaternions,
                         random_rotation_matrixs, rmat_rot, rmat_rot_np,
                         rmat_transform, rmat_transform_np, rmatq, rot_pc,
                         trans_quat_to_pmat, trans_rmat_to_pmat, transform_pc)
