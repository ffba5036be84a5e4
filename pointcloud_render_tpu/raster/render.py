"""High-level render entry: primitive soup -> framebuffers -> shaded RGB.

Backend dispatch:
  "bruteforce" — chunked all-prims x all-pixels XLA scan (exact, any size,
                 O(P*H*W); the correctness baseline);
  "tiled"      — binned XLA gather rasterizer (exact, scales to ~100k prims);
  "pallas"     — v2 tiled Pallas TPU kernel (compat; superseded by v6);
  "pallas3/4/6"— the binned Pallas generations (v6 = anchor-sorted, the
                 fast path; see docs/KERNEL_NOTES.md);
  "cpu"        — NumPy oracle (host, slow; ground truth);
  "auto"       — pallas6 on TPU, tiled elsewhere.

Retired from dispatch (kept as modules for tests/KERNEL_NOTES lessons):
pallas_csr (v1, superseded twice) and pallas_csr5 (chunk binning — a
measured negative result on per-prim scenes; KERNEL_NOTES "ROUND 3").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_render_tpu.raster import bruteforce, cpu_reference, xla_tiled
from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives,
    triangles_from_mesh,
)
from pointcloud_render_tpu.shading.shade import ShadingConfig, shade_framebuffer


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Plain hashable config (NOT a pytree: it is passed through jit static
    arguments, and pytree-registered statics break pjit's fast path)."""

    backend: str = "auto"
    shading: ShadingConfig = dataclasses.field(default_factory=ShadingConfig)
    # bruteforce chunk / tiled capacity knobs
    chunk: int = 8
    tile_h: int = 8
    tile_w: int = 128
    max_per_tile: int = 512
    max_tiles_per_prim: int = 8
    # pallas: branch-free splat/trail fast path — triangles are forced to
    # the big list (do NOT combine with large small-triangle soups)
    no_triangles: bool = False
    # pallas: 8-float disc rows; capsules AND triangles go to the big
    # list (only for disc-cloud scenes — see pallas_csr2 docstring).
    discs_only: bool = False
    # pallas4: bin small triangles too (mesh-LOD droplet scenes) via the
    # branchless dual eval; only the huge ground triangles stay big.
    bin_triangles: bool = False
    # pallas4/5: big-list capacity (prims too wide to bin).  Probe with
    # bin_diagnostics4/5 and size it so overflow is 0; the kernel cost
    # is O(tiles x actual big count), so keep it as small as the scene
    # allows.
    max_big: int = 1024
    # pallas6: binning span — prims covering <= span x span tiles bin
    # (span*span classes, generated neighbor ranges); wider prims ride
    # the big list.  2 = canonical 5-range CSR; 4/8 serve long-segment
    # soups (fade-frame trails at 8/2 segments per trail) that would
    # otherwise flood the big list.
    span: int = 2
    # pallas6 exit-off walk: tiles rendered per pallas program (grid
    # fusion, amortizes per-grid-step overhead) and DMA ring depth.
    tiles_per_program: int = 1
    dma_slots: int = 2
    # pallas6 sweep-tunable knobs (None = the kernel's own default /
    # policy).  chunk_rows: binned-row DMA chunk; allow_exit: force the
    # depth early-exit walk on/off; starts_method: CSR range-starts
    # stage ("scan" searchsorted vs "sort"-merged bounds).
    chunk_rows: Optional[int] = None
    allow_exit: Optional[bool] = None
    starts_method: str = "scan"
    # pallas6 narrow 10-float capsule rows for tri-less generic soups
    # (12 rows per 128-lane VREG; forces the depth exit off; requires
    # bin_triangles=False).  Same winners, ~37% fewer row bytes.
    cap_rows10: bool = False
    # pallas6 kind-split 8-float rows (one 32 B gather granule; idf
    # rides the sort payload).  Discs bit-exact; binned capsules use
    # the renormalized eval — certified-fidelity mode, NOT bit-equal
    # to cap10/cap16 (oracle twin: rasterize_reference cap8).
    rows8: bool = False
    # rows8 build variant: carry the 8 row columns THROUGH the binning
    # sort instead of gathering them after it.  Bit-identical rows —
    # a pure perf knob (no extra certification).
    rows8_carry: bool = False
    # cap_rows10 build variant: sort-carried 10-float rows (a 40 B row
    # pays TWO 32 B gather granules, so the carried build wins exactly
    # where it lost for rows8).  Bit-identical rows; pure perf knob.
    cap10_carry: bool = False
    # rows9: the rows8 dual encoding with idf IN-ROW (static lanes, no
    # interleave) — same renormalized capsule eval, same cap8 oracle
    # and '<segments>+rows8' certificate records.  rows9_carry = its
    # sort-carried build (bit-identical; pure perf knob).
    rows9: bool = False
    rows9_carry: bool = False
    # pallas6: static cap on the sorted-order row gather — soups with
    # large INVALID tails (adaptive trails) only need rows for the
    # binned prefix.  Exact iff every frame's binned count stays <=
    # the cap: probe with bin_diagnostics6(return_binned=True) and
    # check diag["row_overflow"] == 0 per frame (bench.py does both).
    row_budget: Optional[int] = None
    # pallas: independent merge-accumulator chains (see KERNEL_NOTES).
    unroll: int = 4
    # pallas: static cap on the sorted-entry row gather.  None = exact;
    # finite values REQUIRE true_entry_count(scene) <= capacity (bench.py
    # checks once per scene shape) — entries beyond it are dropped.
    entry_capacity: Optional[int] = None
    # Reconstruction-filter AA: rasterize at supersample x resolution and
    # collapse with the reference-matched gaussian rfilter (shading/aa.py).
    # 1 = bit-exact single-sample contract (default).
    supersample: int = 1
    # pallas3 fused shading: optional ((disc rgb), (preshaded big rgb))
    # for TWO-TONE scenes — narrows the per-pixel winner gather to 4
    # floats (see pallas_csr3.render_shaded_csr3; bit-identical only
    # when the scene's colors really are these two constants).
    uniform_look: Optional[tuple] = None
    # pallas6 per-kind-constant shade: (disc_rep, capsule_rep, tri_rep)
    # prim ids — skips the O(P) preshade rgb pass for trail/droplet
    # soups whose colors are constant per kind (pallas_csr4._shade_by_id
    # derives the three tones from the reps in-graph, bit-identically).
    three_tone: Optional[tuple] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameBuffers:
    rgb: jax.Array  # (H, W, 3) float32
    depth: jax.Array  # (H, W) float32, +inf empty
    index: jax.Array  # (H, W) int32, -1 empty


def _resolve_backend(name: str) -> str:
    if name != "auto":
        return name
    # "auto" means the FAST path: v6 anchor-sorted binning, matching the
    # pipeline's policy (run/pipeline._make_step).  v2 stays reachable by
    # name ("pallas") for compatibility.
    return "pallas6" if jax.default_backend() == "tpu" else "tiled"



def _v6_tiles_per_program(config) -> int:
    """Grid fusion rides the exit-off fori walk only: generic span=2
    scenes default to the (measured-faster) exit-on walk, so the knob
    applies exactly where the exit is off by policy.  ONE place for the
    policy — rasterize() and render() forward the same value (a knob
    that flips the exit policy, as cap_rows10 did, is added here once).
    """
    if (config.discs_only or config.span != 2 or config.cap_rows10
            or config.rows8 or config.rows9
            or config.allow_exit is False):
        return config.tiles_per_program
    return 1

def rasterize(prims: ScreenPrimitives, width: int, height: int,
              config: Optional[RasterConfig] = None):
    """Run the configured backend -> (depth, index) buffers."""
    config = config or RasterConfig()
    backend = _resolve_backend(config.backend)
    if backend == "cpu":
        host = jax.tree_util.tree_map(np.asarray, prims)
        depth, index = cpu_reference.rasterize_reference(host, width, height)
        return jnp.asarray(depth), jnp.asarray(index)
    if backend == "bruteforce":
        return bruteforce.rasterize_bruteforce(
            prims, width, height, chunk=config.chunk)
    if backend == "tiled":
        return xla_tiled.rasterize_tiled(
            prims, width, height,
            tile_h=config.tile_h, tile_w=config.tile_w,
            max_per_tile=config.max_per_tile)
    if backend == "pallas":
        from pointcloud_render_tpu.raster import pallas_csr2  # noqa: PLC0415

        return pallas_csr2.rasterize_pallas_csr2(
            prims, width, height,
            tile_h=config.tile_h, tile_w=config.tile_w,
            max_tiles_per_prim=config.max_tiles_per_prim,
            no_triangles=config.no_triangles,
            discs_only=config.discs_only,
            unroll=config.unroll,
            entry_capacity=config.entry_capacity,
            interpret=jax.default_backend() != "tpu")
    if backend == "pallas3":
        # Disc fast path: 2x2-span discs over LOW-ID furniture only (see
        # pallas_csr3 preconditions); capsules/triangles/wide discs ride
        # the big list.  Use "pallas" (v2) for trail/droplet scenes.
        from pointcloud_render_tpu.raster import pallas_csr3  # noqa: PLC0415

        # v3 defaults its own (32, 32) pixel blocks (the measured
        # optimum); config.tile_h/tile_w describe the strip-tiled
        # backends and are not forwarded.
        return pallas_csr3.rasterize_pallas_csr3(
            prims, width, height,
            unroll=config.unroll,
            entry_capacity=config.entry_capacity,
            interpret=jax.default_backend() != "tpu")
    if backend == "pallas4":
        # Generic binned path: discs AND capsules bin (2x2-span of its
        # 32x32 blocks); triangles/wide prims ride the big list.  Exact
        # ties for every kind mix (per-pair id compare).
        from pointcloud_render_tpu.raster import pallas_csr4  # noqa: PLC0415

        return pallas_csr4.rasterize_pallas_csr4(
            prims, width, height,
            unroll=config.unroll,
            entry_capacity=config.entry_capacity,
            bin_triangles=config.bin_triangles,
            max_big=config.max_big,
            interpret=jax.default_backend() != "tpu")
    if backend == "pallas6":
        # Anchor-sorted binning: one sort slot per prim + 5-range CSR.
        # Same contract/eval as pallas4 with a 4x smaller sort and NO
        # entry-capacity precondition (pallas_csr6 docstring).
        from pointcloud_render_tpu.raster import pallas_csr6  # noqa: PLC0415

        return pallas_csr6.rasterize_pallas_csr6(
            prims, width, height,
            unroll=config.unroll,
            bin_triangles=config.bin_triangles,
            discs_only=config.discs_only,
            max_big=config.max_big, span=config.span,
            dma_slots=config.dma_slots,
            tiles_per_program=_v6_tiles_per_program(config),

            allow_exit=config.allow_exit,
            cap_rows10=config.cap_rows10,
            rows8=config.rows8, rows8_carry=config.rows8_carry,
            cap10_carry=config.cap10_carry,
            rows9=config.rows9, rows9_carry=config.rows9_carry,
            row_budget=config.row_budget,
            starts_method=config.starts_method,
            **({} if config.chunk_rows is None
               else {"chunk_rows": config.chunk_rows}),
            interpret=jax.default_backend() != "tpu")
    raise ValueError(f"unknown backend {backend!r}")


def render(prims: ScreenPrimitives, camera,
           config: Optional[RasterConfig] = None,
           return_diag: bool = False):
    """Rasterize + shade a primitive soup through a Camera -> FrameBuffers.

    ``return_diag=True`` additionally returns the backend's device-side
    exactness certificate ``{"true_entries", "big_overflow"}`` (v4/v5
    kernels; zeros for backends without capacity preconditions).  Carry
    the running max through a scan and check ONE scalar post hoc to
    certify EVERY frame against a finite entry_capacity — the streaming
    pattern (parallel/streaming.py), closing the probe-gap hole.
    """
    config = config or RasterConfig()
    backend = _resolve_backend(config.backend)
    if backend == "pallas4":
        from pointcloud_render_tpu.raster import pallas_csr4  # noqa: PLC0415

        rgb, depth, index, diag = pallas_csr4.render_shaded_csr4(
            prims, camera, config.shading,
            unroll=config.unroll, entry_capacity=config.entry_capacity,
            bin_triangles=config.bin_triangles, max_big=config.max_big,
            interpret=jax.default_backend() != "tpu", return_diag=True)
        fb = FrameBuffers(rgb=rgb, depth=depth, index=index)
        return (fb, diag) if return_diag else fb
    if backend == "pallas6":
        from pointcloud_render_tpu.raster import pallas_csr6  # noqa: PLC0415

        rgb, depth, index, diag = pallas_csr6.render_shaded_csr6(
            prims, camera, config.shading,
            unroll=config.unroll,
            bin_triangles=config.bin_triangles,
            discs_only=config.discs_only, max_big=config.max_big,
            uniform_look=config.uniform_look,
            three_tone=config.three_tone, span=config.span,
            dma_slots=config.dma_slots,
            # Grid fusion rides the exit-off fori walk only; generic
            # span=2 scenes default to the (measured-faster) exit-on
            # walk, so the knob applies where the exit is off by policy.
            tiles_per_program=_v6_tiles_per_program(config),

            allow_exit=config.allow_exit,
            cap_rows10=config.cap_rows10,
            rows8=config.rows8, rows8_carry=config.rows8_carry,
            cap10_carry=config.cap10_carry,
            rows9=config.rows9, rows9_carry=config.rows9_carry,
            row_budget=config.row_budget,
            starts_method=config.starts_method,
            **({} if config.chunk_rows is None
               else {"chunk_rows": config.chunk_rows}),
            interpret=jax.default_backend() != "tpu", return_diag=True)
        fb = FrameBuffers(rgb=rgb, depth=depth, index=index)
        return (fb, diag) if return_diag else fb
    if backend == "pallas3":
        # Fused raster+shade: one 8-float winner-attribute gather instead
        # of the id-resolve + 10-float shade gathers (bit-identical rgb;
        # the index image is still produced, lazily).
        from pointcloud_render_tpu.raster import pallas_csr3  # noqa: PLC0415

        out = pallas_csr3.render_shaded_csr3(
            prims, camera, config.shading,
            unroll=config.unroll, entry_capacity=config.entry_capacity,
            uniform_look=config.uniform_look,
            interpret=jax.default_backend() != "tpu",
            return_diag=return_diag)
        if return_diag:
            rgb, depth, index, diag = out
            return FrameBuffers(rgb=rgb, depth=depth, index=index), diag
        rgb, depth, index = out
        return FrameBuffers(rgb=rgb, depth=depth, index=index)
    depth, index = rasterize(prims, camera.width, camera.height, config)
    rgb = shade_framebuffer(prims, camera, depth, index, config.shading)
    fb = FrameBuffers(rgb=rgb, depth=depth, index=index)
    if return_diag:
        # A zero diag must mean "cannot truncate", not "didn't look":
        # the tiled backend's max_per_tile and v2's entry_capacity/big
        # list DO drop primitives, so their certificates are computed
        # here (cpu/bruteforce are genuinely exact).
        if backend == "tiled":
            from pointcloud_render_tpu.raster.tiles import (  # noqa: PLC0415
                tile_overflow,
            )

            diag = dict(
                true_entries=jnp.int32(0),
                big_overflow=tile_overflow(
                    prims, camera.width, camera.height,
                    tile_h=config.tile_h, tile_w=config.tile_w,
                    max_per_tile=config.max_per_tile))
        elif backend == "pallas":
            from pointcloud_render_tpu.raster import (  # noqa: PLC0415
                pallas_csr as _v2,
            )
            from pointcloud_render_tpu.raster import (  # noqa: PLC0415
                pallas_csr2 as _v2k,
            )

            diag = dict(
                true_entries=_v2k.true_entry_count(
                    prims, camera.width, camera.height,
                    tile_h=config.tile_h, tile_w=config.tile_w,
                    max_tiles_per_prim=config.max_tiles_per_prim,
                    no_triangles=config.no_triangles or config.discs_only),
                big_overflow=_v2.bin_diagnostics(
                    prims, camera.width, camera.height,
                    tile_h=config.tile_h, tile_w=config.tile_w,
                    max_tiles_per_prim=config.max_tiles_per_prim,
                    max_big=1024,  # rasterize_pallas_csr2's default
                    no_triangles=config.no_triangles,
                    discs_only=config.discs_only))
        else:
            diag = dict(true_entries=jnp.int32(0),
                        big_overflow=jnp.int32(0))
        return fb, diag
    return fb


# ---------------------------------------------------------------------------
# Stage geometry (the reference scene's fixed furniture)
# ---------------------------------------------------------------------------

GROUND_COLOR = (1.0, 1.0, 1.0)  # white roughplastic, traj_ball_renderer.py:30-35


def ground_plane(camera, half_extent: float, center=(0.0, 0.0, -0.5),
                 color=GROUND_COLOR) -> ScreenPrimitives:
    """The reference's ground rectangle as two triangles.

    Mitsuba's rectangle is the unit square [-1,1]^2 scaled then translated
    (reference: traj_ball_renderer.py:58-65 — scale 10 -> 20x20 extent at
    z=-0.5; example_renderer.py:55-61 z=-0.2; traj_b0.py:41-48 scale 20 at
    (10,10,-0.8)).
    """
    cx, cy, cz = center
    e = half_extent
    verts = np.array([
        [cx - e, cy - e, cz],
        [cx + e, cy - e, cz],
        [cx + e, cy + e, cz],
        [cx - e, cy + e, cz],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # Shared plane normal: both faces carry bit-identical camera-space
    # normals (per-face cross products differ in the last ulp, which
    # fails the per-kind-constant shade certificate at some frames).
    return triangles_from_mesh(verts, faces, camera, np.asarray(color),
                               face_normal=(0.0, 0.0, 1.0))
