from .core import calc_loss, loss_one_sample, loss_weights_from_cfg, mon_loss
from .schedules import (build_lr_schedule, cosine_warmup_restarts,
                        linear_warmup)
from .state import TrainState, build_optimizer, create_train_state
from .vis_utils import export_assembly_samples, sample_assembly
