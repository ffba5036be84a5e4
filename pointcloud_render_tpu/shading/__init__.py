from pointcloud_render_tpu.shading.shade import shade_framebuffer, ShadingConfig  # noqa: F401
