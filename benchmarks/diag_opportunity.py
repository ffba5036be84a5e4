"""Opportunity analysis: slots where a 2x2-span prim's bbox touches the
diagonal tile but the prim itself cannot cover any of its pixel centers."""
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from pointcloud_render_tpu.configs import PRESETS
from pointcloud_render_tpu.raster.primitives import ScreenPrimitives, discs_from_points
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.run.pipeline import build_primitives
from pointcloud_render_tpu.scene.camera import TARGETS, TOTAL_FRAMES, Camera, camera_origin_jax

scene = sys.argv[1] if len(sys.argv) > 1 else 'disc'
n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
frame = int(sys.argv[3]) if len(sys.argv) > 3 else 120
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
cam = Camera(origin=camera_origin_jax('traj_ball', jnp.int32(frame), TOTAL_FRAMES),
             target=np.asarray(TARGETS['traj_ball'], np.float32))
if scene == 'disc':
    soup = ScreenPrimitives.concatenate([
        ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
        discs_from_points(pos, cam, jnp.full((n,), 0.002, jnp.float32),
                          np.array([0.3, 0.3, 0.3], np.float32))])
else:
    soup = build_primitives(PRESETS['traj_ball'], cam, pos, vel, jnp.int32(frame))

tw = th = 32
W, H = cam.width, cam.height
tiles_x, tiles_y = -(-W // tw), -(-H // th)
bbox = np.asarray(soup.bbox); valid = np.asarray(soup.valid)
kind = np.asarray(soup.kind); par = np.asarray(soup.params)
tx0 = np.clip(np.floor(bbox[:, 0] / tw).astype(np.int64), 0, tiles_x - 1)
tx1 = np.clip(np.floor(bbox[:, 1] / tw).astype(np.int64), 0, tiles_x - 1)
ty0 = np.clip(np.floor(bbox[:, 2] / th).astype(np.int64), 0, tiles_y - 1)
ty1 = np.clip(np.floor(bbox[:, 3] / th).astype(np.int64), 0, tiles_y - 1)
ntx, nty = tx1 - tx0 + 1, ty1 - ty0 + 1
binnable = (kind == 0) | (kind == 1)
small = valid & binnable & (ntx <= 2) & (nty <= 2)
slots = (ntx * nty * small).sum()  # total slot evals (= tile coverage count)
both = small & (ntx == 2) & (nty == 2)

# diag tile pixel-center rect
rx0 = (tx0[both] + 1) * tw + 0.5
ry0 = (ty0[both] + 1) * th + 0.5
rx1 = np.minimum((tx0[both] + 2) * tw, W) - 0.5
ry1 = np.minimum((ty0[both] + 2) * th, H) - 0.5

# distance from capsule segment (disc: zero-length) to rect, vs max radius
x0, y0, r0 = par[both, 0], par[both, 1], par[both, 3]
dx, dy, dr = par[both, 4], par[both, 5], par[both, 7]
# sample t in [0,1] finely; conservative-enough coverage test:
# min over t of dist(point(t), rect) - r(t) > 0  => no coverage
ts = np.linspace(0, 1, 33, dtype=np.float32)
covered = np.zeros(both.sum(), bool)
for t in ts:
    px = x0 + dx * t; py = y0 + dy * t; r = r0 + dr * t
    cx = np.clip(px, rx0, rx1); cy = np.clip(py, ry0, ry1)
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    covered |= d2 <= r * r + 1e-9
miss = (~covered).sum()
print(f"scene={scene} n={n} frame={frame}: prims={soup.count} "
      f"binned_small={small.sum()} slots={slots} both={both.sum()} "
      f"diag_miss={miss}  -> slot saving {miss/slots*100:.2f}% "
      f"(both-miss rate {miss/max(both.sum(),1)*100:.1f}%)")
