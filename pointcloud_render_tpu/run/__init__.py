from pointcloud_render_tpu.run.pipeline import FramePipeline  # noqa: F401
from pointcloud_render_tpu.run.batch import run_batch  # noqa: F401
from pointcloud_render_tpu.run.trajectory import TrajectoryScanRenderer  # noqa: F401
from pointcloud_render_tpu.run.video import write_gif, write_frame_sequence  # noqa: F401
