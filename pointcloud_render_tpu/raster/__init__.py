from pointcloud_render_tpu.raster.primitives import (  # noqa: F401
    ScreenPrimitives,
    KIND_DISC,
    KIND_CAPSULE,
    KIND_TRIANGLE,
)
from pointcloud_render_tpu.raster.project import project_points  # noqa: F401
from pointcloud_render_tpu.raster.render import render, RasterConfig  # noqa: F401
