from .ba import BAProblem, BAState, bundle_adjust, reprojection_residuals
from .ba_sparse import (build_point_tables, bundle_adjust_sparse,
                        gnc_weight_fn)
from .sfm import SfmResult, incremental_sfm
from .posegraph import PoseGraph, optimize_pose_graph
from .twoview import TwoViewResult, match_pair, two_view_pose
