import time, numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, '/root/repo')
from pointcloud_render_tpu.configs import PRESETS
from pointcloud_render_tpu.raster.render import RasterConfig, rasterize
from pointcloud_render_tpu.run.pipeline import build_primitives
from pointcloud_render_tpu.scene.camera import Camera, TARGETS, camera_origin_jax
from pointcloud_render_tpu.shading.shade import ShadingConfig, shade_framebuffer
from pointcloud_render_tpu.run.trajectory import srgb_encode_u8
from pointcloud_render_tpu.utils import aot

rng = np.random.default_rng(0)
preset = PRESETS['traj_ball']

def make(n, backend, with_shade, F=50):
    cfg = RasterConfig(backend=backend, no_triangles=True)
    def chunk(pos, vel, fis):
        def step(carry, fi):
            origin = camera_origin_jax(preset.camera_preset, fi, 220)
            cam = Camera(origin=origin, target=np.asarray(TARGETS[preset.camera_preset], np.float32), fov_x_degrees=36.0)
            prims = build_primitives(preset, cam, pos, vel, fi, None, None)
            d, i = rasterize(prims, cam.width, cam.height, cfg)
            if with_shade:
                rgb = shade_framebuffer(prims, cam, d, i, ShadingConfig())
                out = srgb_encode_u8(rgb).astype(jnp.int32).sum()
            else:
                out = jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
            return carry, out
        _, sums = jax.lax.scan(step, 0, fis)
        return sums
    pos = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 3)) * 2, jnp.float32)
    fis = jnp.arange(F, dtype=jnp.int32)
    c = aot.compile_const_free(chunk, pos, vel, fis)
    out = c(pos, vel, fis); np.asarray(out)
    ts = []
    for _ in range(3):
        t0=time.perf_counter(); out=c(pos, vel, fis); np.asarray(out); ts.append(time.perf_counter()-t0)
    dev = (np.median(ts) - 0.025) / F  # subtract tunnel RTT
    return dev

for n in (2048, 20000):
    for shade in (False, True):
        d = make(n, 'pallas', shade)
        print(f'n={n} shade={shade}: {d*1e3:.2f}ms/frame device = {1/d:.0f} FPS', flush=True)
