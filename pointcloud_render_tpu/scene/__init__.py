from pointcloud_render_tpu.scene.pointcloud import PointCloud  # noqa: F401
from pointcloud_render_tpu.scene.normalize import (  # noqa: F401
    standardize_point_cloud,
    transform_coordinates,
)
from pointcloud_render_tpu.scene.camera import (  # noqa: F401
    Camera,
    camera_origin,
    look_at_axes,
)
