from .encoders import (DGCNN, FeaturePropagation, PointNet, PointNet2MSG,
                       PointNet2SSG, build_encoder)
from .norm import MaskedBatchNorm
from .regressor import PoseRegressor, StochasticPoseRegressor, normalize_rot6d
from .rnn import MaskedGRU
from .transformer import TransformerEncoder
