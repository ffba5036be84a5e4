"""Stage budget of the v5 chunk-binned disc frame (bench scene, 1080p).

Cumulative stages (each includes the previous ones):
  build   — disc projection + ground + soup concat (Morton-sorted cloud)
  bin     — + chunk reduce + masked span expansion + spill + i32 sort
  rows    — + starts + 128-lane superrow gather
  raster  — + the Pallas CSR v5 kernel (depth + idf image)
  shade   — + the fused in-kernel shading (= the full frame)

Run: python benchmarks/stage_profile5.py [--points N] [--frame F]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(name, fn, *a, reps=10):
    from pointcloud_render_tpu.utils import aot

    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--frame", type=int, default=120)
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--unroll", type=int, default=2)
    ap.add_argument("--chunk-rows", type=int, default=32)
    ap.add_argument("--check-every", type=int, default=2)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from pointcloud_render_tpu.raster import pallas_csr5
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import ground_plane
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )
    from pointcloud_render_tpu.scene.spatial import spatial_sort
    from pointcloud_render_tpu.shading.shade import ShadingConfig

    n = args.points
    rng = np.random.default_rng(0)
    pos_np, _ = spatial_sort(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    pos = jnp.asarray(pos_np)
    radii = jnp.full((n,), args.radius, jnp.float32)
    fi = jnp.int32(args.frame)
    gray = np.array([0.3, 0.3, 0.3], np.float32)

    def make(p):
        cam = Camera(
            origin=camera_origin_jax("traj_ball", fi, TOTAL_FRAMES),
            target=np.asarray(TARGETS["traj_ball"], np.float32))
        soup = ScreenPrimitives.concatenate([
            ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
            discs_from_points(p, cam, radii, gray)])
        return soup, cam

    soup0, cam0 = make(pos)
    W, H = cam0.width, cam0.height
    th = tw = 32
    tiles_y, tiles_x = -(-H // th), -(-W // tw)
    num_tiles = tiles_y * tiles_x
    ec = int(pallas_csr5.true_entry_count5(soup0, W, H, k=args.k))
    cap = ((int(ec * 1.15) + args.chunk_rows - 1)
           // args.chunk_rows) * args.chunk_rows
    print(f"prims {soup0.count} superrow entries {ec} cap {cap} "
          f"({cap * args.k * 32 / 1e6:.0f} MB gather, k={args.k})",
          flush=True)

    def stage_build(p):
        soup, _ = make(p)
        return soup.params.sum()

    def stage_bin(p):
        soup, _ = make(p)
        sk, sc, bl, bc, _zm, _bn, _sp = pallas_csr5._bin_chunks5(
            soup, th, tw, num_tiles, tiles_x, tiles_y, k=args.k)
        return sk[0] + sc[0] + bc

    def stage_rows(p):
        soup, _ = make(p)
        (sk, sc, bl, bc, zm, binnable, (sok, srank)) = \
            pallas_csr5._bin_chunks5(soup, th, tw, num_tiles, tiles_x,
                                     tiles_y, k=args.k)
        starts = jnp.searchsorted(
            sk, np.arange(num_tiles + 1, dtype=np.int32)
            << pallas_csr5.ZQ_BITS).astype(jnp.int32)
        e = min(sc.shape[0], cap)
        sc = sc[:e]
        e_pad = -(-(e + args.chunk_rows) // args.chunk_rows) * args.chunk_rows
        z3 = jnp.zeros((soup.count, 3), jnp.float32)
        table = pallas_csr5._build_table5(soup, binnable, z3, k=args.k)
        c = table.shape[0] // args.k
        sing = pallas_csr5._build_singletons5(
            soup, sok, srank, pallas_csr5.DEFAULT_MAX_SPILL, z3, k=args.k)
        pad_row = jnp.asarray(np.tile(pallas_csr5.PAD8, args.k))[None]
        tab = jnp.concatenate([table.reshape(c, args.k * 8), sing,
                               pad_row])
        chunks_p = jnp.pad(sc, (0, e_pad - e),
                           constant_values=c + pallas_csr5.DEFAULT_MAX_SPILL)
        rows = tab[chunks_p]
        return rows.sum() + starts[0].astype(jnp.float32)

    def stage_raster(p):
        soup, _ = make(p)
        d, i = pallas_csr5.rasterize_pallas_csr5(
            soup, W, H, unroll=args.unroll, entry_capacity=cap,
            chunk_rows=args.chunk_rows, check_every=args.check_every,
            k=args.k)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    def stage_shade(p):
        soup, cam = make(p)
        rgb, d, i = pallas_csr5.render_shaded_csr5(
            soup, cam, ShadingConfig(), unroll=args.unroll,
            entry_capacity=cap, chunk_rows=args.chunk_rows,
            check_every=args.check_every, k=args.k,
            uniform_color=tuple(gray))
        return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                + jnp.sum(rgb[::8, ::8]))

    t1 = timed("build (project+concat)", stage_build, pos)
    t2 = timed("+ bin (chunk reduce+spill+sort)", stage_bin, pos)
    t3 = timed("+ starts + superrow gather", stage_rows, pos)
    t4 = timed("+ CSR v5 kernel", stage_raster, pos)
    t5 = timed("+ fused shading (full frame)", stage_shade, pos)
    print(f"\ndeltas: bin={1e3*(t2-t1):.1f} rows={1e3*(t3-t2):.1f} "
          f"kernel={1e3*(t4-t3):.1f} shade={1e3*(t5-t4):.1f} "
          f"total={1e3*t5:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
