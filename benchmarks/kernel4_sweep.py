"""Sweep pallas_csr4 configs on the real chip (traj_ball trail scene).

Run: python benchmarks/kernel4_sweep.py [--points N]
"""
import sys, os, time, argparse, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from pointcloud_render_tpu.configs import PRESETS
from pointcloud_render_tpu.run.pipeline import build_primitives
from pointcloud_render_tpu.raster import pallas_csr4
from pointcloud_render_tpu.scene.camera import TARGETS, Camera, camera_origin_jax
from pointcloud_render_tpu.utils import aot


def timed(name, fn, *a, reps=10):
    try:
        c = aot.compile_const_free(fn, *a)
        out = c(*a)
        chk0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = c(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:56s} {dt * 1e3:8.2f} ms  chk={chk0:.6e}", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--frame", type=int, default=120)
    args = ap.parse_args()

    preset = PRESETS["traj_ball"]
    rng = np.random.default_rng(0)
    n = args.points
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    fi = jnp.int32(args.frame)

    def make(p, v):
        cam = Camera(
            origin=camera_origin_jax(preset.camera_preset, fi,
                                     preset.total_frames),
            target=np.asarray(TARGETS[preset.camera_preset], np.float32),
            fov_x_degrees=preset.fov_x_degrees)
        return build_primitives(preset, cam, p, v, fi), cam

    soup0, cam0 = make(pos, vel)
    W, H = cam0.width, cam0.height
    caps = {}
    for th, tw in ((32, 32), (16, 64)):
        ec = int(pallas_csr4.true_entry_count4(soup0, W, H, tile_h=th,
                                               tile_w=tw))
        caps[(th, tw)] = ((int(ec * 1.15) + 127) // 128) * 128
        print(f"{th}x{tw}: entries {ec} cap {caps[th, tw]}", flush=True)

    def run(p, v, **kw):
        soup, _ = make(p, v)
        d, i = pallas_csr4.rasterize_pallas_csr4(soup, W, H, **kw)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)) + jnp.sum(i % 97)

    for kw in (
        dict(unroll=4, entry_capacity=caps[32, 32]),
        dict(unroll=8, entry_capacity=caps[32, 32]),
        dict(unroll=2, entry_capacity=caps[32, 32]),
        dict(unroll=4, entry_capacity=caps[32, 32], chunk_rows=256),
        dict(unroll=4, entry_capacity=caps[32, 32], chunk_rows=1024),
        dict(unroll=8, entry_capacity=caps[32, 32], chunk_rows=1024),
        dict(unroll=4, tile_h=16, tile_w=64, entry_capacity=caps[16, 64]),
    ):
        name = "v4 " + " ".join(f"{k}={v}" for k, v in kw.items())
        timed(name, functools.partial(run, **kw), pos, vel)


if __name__ == "__main__":
    main()
