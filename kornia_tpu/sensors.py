"""kornia-layout alias: ``kornia_tpu.sensors`` mirrors ``kornia.sensors``
(composable camera models = projection x distortion,
reference: sensors/camera/camera_model.py:68)."""
from .geometry.camera import (  # noqa: F401
    PinholeCamera,
    StereoCamera,
    distort_points_affine,
    distort_points_kannala_brandt,
    dx_distort_points_affine,
    dx_distort_points_kannala_brandt,
    dx_project_points_orthographic,
    dx_project_points_z1,
    project_points,
    project_points_orthographic,
    project_points_z1,
    undistort_points_affine,
    undistort_points_kannala_brandt,
    unproject_points,
    unproject_points_orthographic,
    unproject_points_z1,
)


class CameraModel:
    """Composable camera: projection model x distortion model
    (reference: sensors/camera/camera_model.py CameraModel)."""

    def __init__(self, image_size, projection: str = "z1",
                 distortion: str = "affine", params=None):
        self.image_size = image_size
        self.projection = projection
        self.distortion = distortion
        self.params = params

    def project(self, points_3d):
        if self.projection == "z1":
            pts = project_points_z1(points_3d)
        else:
            pts = project_points_orthographic(points_3d)
        if self.distortion == "affine":
            return distort_points_affine(pts, self.params)
        return distort_points_kannala_brandt(pts, self.params)

    def unproject(self, points_2d, depth):
        if self.distortion == "affine":
            pts = undistort_points_affine(points_2d, self.params)
        else:
            pts = undistort_points_kannala_brandt(points_2d, self.params)
        if self.projection == "z1":
            return unproject_points_z1(pts, depth)
        return unproject_points_orthographic(pts, depth)
