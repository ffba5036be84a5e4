"""Measured verdicts for the three untried disc-ceiling levers
(VERDICT r3 item 4): subtile coverage masks, a conservative prune-only
prefilter, and deeper cross-frame overlap.  All counts are EXACT CPU
evaluations of the production bench scenes (no kernels built — the
numbers bound what any implementation of these ideas could save).

(a) Subtile coverage masks: on the current kernel a 32x32-pixel tile IS
    one (8, 128) f32 VREG (pallas_csr3 "32x32 pixel blocks"), so the
    per-slot vector evaluation is ONE register's worth of ops — there is
    no sub-VREG granularity left to mask away.  The only skippable work
    is a whole slot whose coverage in its tile is EMPTY (bbox overlaps,
    circle/tube doesn't).  This script measures that zero-coverage slot
    fraction exactly.

(b) Prune-only prefilter (may only drop pairs that provably lose): a
    slot provably loses only if some closer primitive FULLY covers its
    tile at a nearer depth everywhere.  This script counts full-cover
    slots and the prims a closest-full-cover z-bound would prune.

(c) Cross-frame overlap has no script: one v5e core runs one program;
    stage_profile6's frame total equals the stage sum (no hidden slack),
    and XLA schedules a lax.scan body serially per iteration — there is
    no second execution stream to overlap stages INTO on-chip.

Run: python benchmarks/prune_opportunity.py [--scene disc|trail]
     (forces CPU; never touches the TPU tunnel)
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 32


def coverage_counts(params, kind, bbox, valid, width, height, tx, ty):
    """Covered-pixel count of each (prim, tile) slot, exact per-pixel
    (the oracle's coverage formula, cpu_reference.py)."""
    qx = (tx[:, None, None] * TILE
          + np.arange(TILE, dtype=np.float32)[None, None, :] + 0.5)
    qy = (ty[:, None, None] * TILE
          + np.arange(TILE, dtype=np.float32)[None, :, None] + 0.5)
    p = params
    dx = qx - p[:, 0, None, None]
    dy = qy - p[:, 1, None, None]
    t = np.clip((dx * p[:, 4, None, None] + dy * p[:, 5, None, None])
                * p[:, 8, None, None], 0.0, 1.0)
    cx = dx - t * p[:, 4, None, None]
    cy = dy - t * p[:, 5, None, None]
    rad = p[:, 3, None, None] + p[:, 7, None, None] * t
    cov = (cx * cx + cy * cy) <= rad * rad
    # Film-edge tiles: pixels past the film don't count as coverage.
    cov &= (qx <= width) & (qy <= height)
    return cov.reshape(cov.shape[0], -1).sum(axis=1)


def analyze(soup, width, height, sample, rng, label):
    kind = np.asarray(soup.kind)
    params = np.asarray(soup.params)
    bbox = np.asarray(soup.bbox)
    valid = np.asarray(soup.valid)
    binnable = valid & (kind != 2)
    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    tx0 = np.clip(np.floor(bbox[:, 0] / TILE), 0, ntx - 1).astype(np.int64)
    tx1 = np.clip(np.floor(bbox[:, 1] / TILE), 0, ntx - 1).astype(np.int64)
    ty0 = np.clip(np.floor(bbox[:, 2] / TILE), 0, nty - 1).astype(np.int64)
    ty1 = np.clip(np.floor(bbox[:, 3] / TILE), 0, nty - 1).astype(np.int64)
    on_film = (binnable & (bbox[:, 1] >= 0) & (bbox[:, 0] <= width)
               & (bbox[:, 3] >= 0) & (bbox[:, 2] <= height))
    spanx = tx1 - tx0 + 1
    spany = ty1 - ty0 + 1
    binned = on_film & (spanx <= 2) & (spany <= 2)
    big = int((on_film & ~binned).sum())

    # Expand binned prims to their slots (span <= 2x2 -> <= 4 each).
    ids, txs, tys = [], [], []
    for ox in (0, 1):
        for oy in (0, 1):
            m = binned & (spanx > ox) & (spany > oy)
            ids.append(np.nonzero(m)[0])
            txs.append(tx0[m] + ox)
            tys.append(ty0[m] + oy)
    ids = np.concatenate(ids)
    txs = np.concatenate(txs)
    tys = np.concatenate(tys)
    n_slots = ids.shape[0]

    take = rng.choice(n_slots, size=min(sample, n_slots), replace=False)
    zero = 0
    full = 0
    counts = np.zeros(take.shape[0], np.int64)
    for k in range(0, take.shape[0], 4096):
        sl = take[k:k + 4096]
        c = coverage_counts(params[ids[sl]], kind[ids[sl]], bbox[ids[sl]],
                            valid[ids[sl]], width, height, txs[sl], tys[sl])
        counts[k:k + 4096] = c
        zero += int((c == 0).sum())
        full += int((c == TILE * TILE).sum())

    print(f"[{label}] prims={kind.shape[0]} binned_slots={n_slots} "
          f"big={big}")
    print(f"[{label}] sampled {take.shape[0]} slots: "
          f"zero-coverage {zero / take.shape[0]:.4%}  "
          f"full-coverage {full / take.shape[0]:.4%}  "
          f"mean covered px {counts.mean():.1f}/{TILE * TILE}")
    # Prune-only bound: a closest-full-cover z would prune at most the
    # slots behind it; with full-coverage at ~0 the bound is ~0 too.
    return dict(slots=n_slots, zero=zero / take.shape[0],
                full=full / take.shape[0], big=big)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--frame", type=int, default=120)
    ap.add_argument("--sample", type=int, default=200_000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pointcloud_render_tpu.configs import PRESETS
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import ground_plane
    from pointcloud_render_tpu.run.pipeline import build_primitives
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )

    rng = np.random.default_rng(0)
    n = args.points
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    cam = Camera(origin=camera_origin_jax("traj_ball",
                                          jnp.int32(args.frame),
                                          TOTAL_FRAMES),
                 target=np.asarray(TARGETS["traj_ball"], np.float32))

    disc_soup = ScreenPrimitives.concatenate([
        ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
        discs_from_points(pos, cam, jnp.full((n,), 0.002, jnp.float32),
                          np.array([0.3, 0.3, 0.3], np.float32))])
    analyze(disc_soup, cam.width, cam.height, args.sample,
            np.random.default_rng(1), "disc 1M f120")

    trail_soup = build_primitives(PRESETS["traj_ball"], cam, pos, vel,
                                  jnp.int32(args.frame))
    analyze(trail_soup, cam.width, cam.height, args.sample,
            np.random.default_rng(2), "trail 1M f120")


if __name__ == "__main__":
    main()
