from .chamfer import (chamfer_diag, chamfer_distance, chamfer_distance_ref,
                      chamfer_pairs, chamfer_parts, nn_distance)
from .knn import get_graph_feature, knn
from .matching import hungarian_scipy, match_parts, solve_lap
from .sampling import (ball_query, furthest_point_sample, gather_points,
                       group_points, three_interpolate, three_nn)
