from . import (
    bbox,
    boxes,
    calibration,
    camera,
    conversions,
    depth,
    epipolar,
    homography,
    liegroup,
    line,
    linalg,
    pointcloud,
    pose,
    ransac,
    registration,
    scene,
    solvers,
    subpix,
    transform,
)
from .boxes import Boxes, Keypoints, VideoBoxes
from .pose import NamedPose
from .scene import generate_scene
from .conversions import *  # noqa: F401,F403
from .homography import *  # noqa: F401,F403
from .linalg import *  # noqa: F401,F403
from .liegroup import Quaternion, Se2, Se3, So2, So3
from .ransac import RANSAC, RansacResult
from .subpix import *  # noqa: F401,F403
