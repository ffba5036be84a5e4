import time, numpy as np, jax, jax.numpy as jnp, sys, functools
sys.path.insert(0, '/root/repo')
from pointcloud_render_tpu.raster.primitives import discs_from_points, ScreenPrimitives
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.raster.tiles import bin_primitives
from pointcloud_render_tpu.raster import pallas_kernel
from pointcloud_render_tpu.scene.camera import Camera
from pointcloud_render_tpu.utils import aot

rng = np.random.default_rng(0)
camera = Camera(origin=jnp.asarray(np.array([2.,2.,2.],np.float32)), target=jnp.asarray(np.array([0.,0.,-0.05],np.float32)))
n = 1_000_000
pos = jnp.asarray(rng.uniform(-0.5,0.5,(n,3)), jnp.float32)
rad = jnp.full((n,), 0.002, jnp.float32)

def build(positions, radii):
    return ScreenPrimitives.concatenate([
        ground_plane(camera, 10.0, (0.,0.,-0.5)),
        discs_from_points(positions, camera, radii, np.array([0.3,0.3,0.3],np.float32)),
    ])

def stage_build(positions, radii):
    p = build(positions, radii)
    return p.params.sum()

def stage_bin(positions, radii, mtp):
    p = build(positions, radii)
    b = bin_primitives(p, 1920, 1080, max_per_tile=4096, max_tiles_per_prim=mtp)
    return b.table.sum() + b.counts.max() + b.overflowed

def stage_full(positions, radii, mtp):
    p = build(positions, radii)
    d, i = pallas_kernel.rasterize_pallas(p, 1920, 1080, max_per_tile=4096)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)) + i.sum()

def timed(fn, *a, reps=4):
    c = aot.compile_const_free(fn, *a)
    out = c(*a); v = np.asarray(out)  # force sync via transfer
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); out = c(*a); v = np.asarray(out); ts.append(time.perf_counter()-t0)
    return np.median(ts)

print(f'build+project: {timed(stage_build, pos, rad)*1e3:.1f}ms', flush=True)
print(f'bin mtp=16:    {timed(functools.partial(stage_bin, mtp=16), pos, rad)*1e3:.1f}ms', flush=True)
print(f'bin mtp=4:     {timed(functools.partial(stage_bin, mtp=4), pos, rad)*1e3:.1f}ms', flush=True)
print(f'full mtp=16:   {timed(functools.partial(stage_full, mtp=16), pos, rad)*1e3:.1f}ms', flush=True)
