from pointcloud_render_tpu.run.pipeline import FramePipeline  # noqa: F401
from pointcloud_render_tpu.run.batch import run_batch  # noqa: F401
