"""Engine configuration.

The reference engine's compile-time ``#define`` block
(ZeldaEngine.cpp:77-98: VIEWPORT 1920x1080, MAX_FRAMES_IN_FLIGHT 2,
PBR_SAMPLER_NUMBER 7, MAX_DIRECTIONAL_LIGHTS_NUM 16 / POINT 512 / SPOT 16,
SHADOWMAP_DIM 1024, feature gates) maps to a frozen, hashable dataclass:
anything here is a *static* jit argument — changing it recompiles, exactly
like rebuilding the C++ binary. Dynamic state (the world JSON, light values,
camera) lives in traced arrays instead.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # Viewport (ZeldaEngine.cpp:78-79)
    width: int = 1920
    height: int = 1080

    # MAX_FRAMES_IN_FLIGHT (ZeldaEngine.cpp:77): with 2, Engine.tick
    # returns the PREVIOUS frame while the current one renders, so the
    # host round trip overlaps the device render (one frame of latency —
    # the reference's swapchain pipelining). 1 = synchronous present.
    frames_in_flight: int = 2
    # Present mode (the swapchain mode choice, ZeldaEngine.cpp:6589-6599:
    # VK_PRESENT_MODE_MAILBOX_KHR preferred, FIFO fallback).
    #   "mailbox": tick never blocks on the device->host frame fetch —
    #     a full present queue replaces its stalest pending frame with
    #     the newest (dropped frames counted in FrameStats.presents_
    #     dropped), and tick returns the newest COMPLETED frame, however
    #     old. The render loop runs uncapped at device speed even when
    #     the host link is slow (a tunneled backend's ~100 ms round trip
    #     otherwise gates the tick at fetch rate).
    #   "fifo": tick waits for a completed frame (staleness bounded by
    #     frames_in_flight) — deterministic, used by tests.
    present_mode: str = "mailbox"

    # Shadow map (ZeldaEngine.cpp:87) and PCF kernel radius (Base.frag:67)
    shadowmap_dim: int = 1024
    pcf_radius: int = 2
    pcf_scale: float = 1.5  # texel scale inside ComputePCF (Common.glsl:326)
    # Shadow depth bias, applied at shadow rasterization exactly like the
    # reference's vkCmdSetDepthBias(1.25, 0, 7.5) (:3280-3287): written
    # depth += slope * max|dz/dpixel| + constant * 2^-23. ``shadow_bias``
    # is an extra compare-time constant (default off).
    shadow_bias_constant: float = 1.25
    shadow_bias_slope: float = 7.5
    shadow_bias: float = 0.0
    # Radius of the procedural skydome sphere (the reference's skydome.obj
    # has a fixed modeled radius); must be < camera zFar to survive clip.
    skydome_radius: float = 30.0
    # "analytic": closed-form ray/sphere dome (exact infinite-tessellation
    # limit, no raster, 1 gather). "mesh": rasterize the dome mesh like the
    # reference (kept for parity testing).
    skydome_mode: str = "analytic"

    # Light capacities (ZeldaEngine.cpp:84-86)
    max_directional_lights: int = 16
    max_point_lights: int = 512
    max_spot_lights: int = 16

    # PBR material texture slots (ZeldaEngine.cpp:80):
    # basecolor, metallic, roughness, normal, AO, emissive, mask
    pbr_sampler_number: int = 7

    # Scene pool capacities (static shapes; the TPU analogue of the
    # reference's MAX_* constants). Scenes are padded up to these.
    max_vertices: int = 1 << 16
    max_triangles: int = 1 << 16
    max_instances: int = 1 << 12
    max_materials: int = 64

    # Texture pool: every 2D texture is resampled to this square size and
    # stacked into one array ("bindless" indexing; ZeldaEngine.cpp:96 TODO).
    texture_size: int = 256
    # Cubemap face size; mip count derives from it.
    cubemap_size: int = 256
    background_size: int = 512

    # Rasterizer tiling. tile_w must divide 128 (narrow tiles are walked
    # as column sub-tiles of a 128-px Pallas block — rasterize_pallas).
    tile_h: int = 32
    tile_w: int = 128
    # Shadow-pass tile shape override (None = same as tile_h/tile_w):
    # the light-space geometry distribution differs from screen space,
    # so the optimal shape can differ (hardware A/B, BASELINE.md).
    shadow_tile_h: int | None = None
    shadow_tile_w: int | None = None
    tri_chunk: int = 128
    # Exact-pair binning: triangles whose bbox covers more than this many
    # tiles spill to supertile pairs, then to a global bucket walked by
    # every tile.
    pair_expand: int = 8
    # Shadow-pass expand (light-space tiles at shadowmap resolution are
    # coarse; prep cost scales with T*expand while the supertile level
    # absorbs the spill, so a smaller budget wins).
    pair_expand_shadow: int = 4
    # Live-pair capacity: dead/culled pairs sort last, so slicing the
    # sorted stream to this many pairs makes the O(P) record gather
    # track the POST-CULL visible count instead of T * pair_expand
    # capacity (the GPU-driven-culling analogue of a sized indirect
    # command buffer). None = uncapped (exact). Live pairs beyond the
    # cap are dropped deterministically and counted by validation mode.
    max_pairs: int | None = None
    max_pairs_shadow: int | None = None
    # Live-triangle compaction (VERDICT r2 #2): when set, live (post-
    # meshlet-cull, on-screen) triangles are cumsum-compacted into this
    # many slots BEFORE pair expansion, so the O(T*expand) key sort and
    # O(T) record build track the CULL RESULT instead of pool capacity.
    # Size it to the worst-case post-cull visible count; overflow is
    # deterministic (highest triangle ids dropped) and counted by
    # validation mode.
    compact_tris: int | None = None
    # Shadow-pass compaction capacity. The SHADOW caster set is NOT the
    # camera-culled set (geometry behind the camera still casts), so it
    # must not inherit ``compact_tris`` — at config-4 scale that
    # silently dropped ~half the 1.03M casters from the map (round-4
    # audit). None = no shadow compaction.
    compact_tris_shadow: int | None = None
    # Light-apex backface-cone cull of meshlets for the SHADOW pass.
    # Exact only for closed (watertight) meshes — a light-backfacing
    # surface of an open mesh still blocks light. The light-frustum
    # test always applies to meshlets (exact for any geometry).
    shadow_cone_cull: bool = False
    # Slice-aligned pair bins: every bin starts at a 128-pair slice
    # boundary so neighboring tiles stop double-walking shared boundary
    # slices (~1 visit/bin). Exact (pad lanes hold the never-record) —
    # but OFF by default: the repositioning costs two extra ~P-needle
    # gathers in prep (+20 ms at demo scale on TPU, vs ~3 ms of skipped
    # visits — BASELINE.md round 4). Kept for the ledger + tests.
    pair_align: bool = False
    # Chunked pair record gather (build_pairs gather_chunks): split the
    # (P,)-needle gather over the record table into G gathers over
    # contiguous row-slices + G selects. Measured on hardware at c4
    # shapes (tools/gather_pair_probe.py): plain gather+transpose
    # 27.2 ms, chunk4 32.2 ms — the per-gather cost is needle-count
    # bound, not table-row bound, so chunking only adds select traffic.
    # REJECTED as a default; mechanism kept for the ledger + tests.
    # 0 = auto (sub-131072-row chunks), 1 = plain gather. Exact for
    # any value.
    pair_gather_chunks: int = 1
    # Packed pair record gather (build_pairs gather_pack): relay the
    # record table G rows per physical row so one wide gather with
    # stri//G needles hits a G-fold smaller table, then group-select by
    # stri%G. Exact. The isolated probe won 2.35x at 75k needles
    # (tools/gather_pair_probe.py), but IN-ENGINE at c4's 512k needles
    # it is a wash (prep_full 54.6 -> 53.6 ms, barrier-materialized):
    # the TPU row gather is NEEDLE-latency bound (~70 ns/needle serial
    # dynamic-slice loop; 48 channels cost the same as 1), so table
    # layout doesn't move it. REJECTED as a default (BASELINE.md round
    # 4); mechanism kept for the ledger + tests. 0 = auto (8 above
    # 262144 table rows), 1 = plain gather.
    pair_gather_pack: int = 1
    # Exact sub-pixel cull: triangles whose bbox straddles no pixel
    # center rasterize nothing and are culled before compaction/pair
    # binning. A pure win at meshlet scale (config 4: ~1 px^2 tris —
    # shrinks the pair stream the needle-bound record gather walks) but
    # measured +2.5 ms on the demo kernel (bin-structure perturbation;
    # BASELINE.md round 5) — off by default, on in the c4 bench config.
    subpixel_cull: bool = False
    # "auto": Pallas tiled kernel on TPU, jnp reference path on CPU.
    raster: str = "auto"  # "auto" | "pallas" | "jnp"
    sub_rows: int = 8
    # Front-to-back pair ordering (build_pairs sort_z): winners cluster
    # in the first slices of every bin, collapsing the fused kernel's
    # phase-2 winner windows (~10 ms of the round-4 demo kernel). Only
    # exact-depth ties between different triangles can change winner.
    raster_zsort: bool = True
    # Y-bucketed pair bins + per-visit sub-block window skip: each bin's
    # pairs are ordered by first covered sub-block row (z within), each
    # record carries the triangle's packed sub-block span, and the walk
    # reduces a slice's spans to one scalar window, skipping sub-blocks
    # outside it. Exact (coverage outside the binning bbox is empty).
    # At meshlet scale tiles see sub-pixel triangles spanning 1 of 8
    # sub-blocks — the dense pixels-x-pairs product drops up to 8x.
    raster_ysort: bool = True
    # Occlusion early-out in the pair walks (needs raster_zsort): every
    # ``early_out_stride`` visits a tile checks whether every pixel is
    # already strictly closer than any REMAINING pair's conservative
    # zmin and skips the rest of the range. Exact (strict-< z test) and
    # covered by equality tests — but OFF by default: measured a net
    # LOSS everywhere tried (demo ranges are 2-3 slices deep; config-4
    # tiles never fully cover, so the per-test cross-lane reduction
    # (+5.7 ms at c4) buys almost no skipped visits — BASELINE.md r4).
    # NOTE: automatically disabled while ``raster_ysort`` is active —
    # y-bucketed bins break the z monotonicity the stop test needs
    # (rasterize_pallas do_eo; ADVICE r4 #2).
    raster_early_out: bool = False
    early_out_stride: int = 4
    # Reflection IBL gather at half resolution + bilinear upsample (the
    # gather is ~all of the reflection cost and rough reflections are
    # low-frequency). Off by default: changes output (not bit-exact to
    # the full-res tap) AND measured a net +5.2 ms at the 1080p demo —
    # the 2x upsample's row/lane interleave relayouts cost more than the
    # halved gather saves (BASELINE.md round 4). Kept as an option for
    # gather-heavier scenes (real roughness textures, big cube tables).
    reflection_half: bool = False
    # PCF backend: "auto"/"packed" = neighborhood-packed table + one flat
    # gather per pixel (exact tap-for-tap everywhere); "pallas" = the
    # windowed one-hot kernel (approximate when a tile's shadow footprint
    # exceeds pcf_window texels); "exact" = 25 XLA gathers.
    pcf_backend: str = "auto"
    pcf_window: int = 256  # Pallas-backend shadow window (texels)
    # "vmem" backend: rows resolved by the kernel's window walk per
    # (8, 128)-pixel block. 48 fits 100% of demo blocks (tap halo
    # included — tools/shadow_span_tpu.py); unfit blocks fall back to
    # an exact in-graph compute_pcf recompute.
    pcf_vmem_rows: int = 48
    # Exactness cap of the vmem backend's unfit-block recompute (a
    # lax.switch of tiered compute_pcf fixups). 0 skips the switch
    # entirely: unfit blocks keep the kernel's clamped-window value and
    # are only counted — control-flow ops are fusion barriers on TPU
    # even when the taken branch is empty (BASELINE.md round-3h).
    pcf_fallback_cap: int = 64

    # Wireframe debug mode (ENABLE_WIREFRAME, ZeldaEngine.cpp:90 /
    # polygonMode LINE :5108-5110): only pixels within this barycentric
    # distance of a triangle edge stay covered; interiors fall through
    # to sky/background, like hardware LINE rasterization.
    wireframe: bool = False
    wireframe_threshold: float = 0.02

    # Rendering toggles (reference gates ENABLE_DEFERRED_SHADING etc.)
    enable_deferred: bool = True
    enable_shadow: bool = True
    enable_skydome: bool = True
    enable_background: bool = False

    # Tiled light culling (the deferred analogue of Forward+): when the
    # point-light capacity exceeds the unroll limit, lights are binned to
    # screen tiles (conservative projected-sphere vs tile rect) and each
    # pixel shades at most max_tile_lights. Tile dims must divide the
    # frame (8 x 128 divides 1080 x 1920).
    max_tile_lights: int = 32
    light_tile_h: int = 8
    light_tile_w: int = 128
    # Engage tiled culling at this point-light TABLE CAPACITY (the
    # unrolled loop wins for small tables; the tiled path's dynamic trip
    # count wins once tables outgrow the busiest tile's light count).
    tiled_lights_min: int = 65
    # Point-light evaluation backend. "pallas": tile-restricted Pallas
    # kernel (ops/lighting_pallas.py) — each (point_block_h, 128) pixel
    # block loops over ITS culled light list, so VPU work tracks the
    # reachable (light, block) pairs instead of capacity x pixels;
    # exact-zero falloff beyond radius keeps the sum bit-compatible
    # with the unrolled loop up to Mosaic lowering ulps. "auto" = pallas
    # on accelerators when the point table holds >= point_kernel_min
    # slots and width % 128 == 0; unrolled/tiled XLA otherwise (CPU
    # keeps the reference path for golden stability). "unroll" = off.
    point_light_kernel: str = "auto"
    # Kernel block height (x128 px). Bigger blocks = fewer grid steps
    # and smaller scalar-prefetch tables (8-row blocks overflow SMEM at
    # 1080p); hardware sweep 8/24/40/120 -> 40 (BASELINE.md round 5).
    point_block_h: int = 40
    point_kernel_min: int = 4

    # Merged environment tap: cubemap reflection + sky + background in
    # ONE gather per pixel (ops/envtap.py) instead of 3-4 separate
    # gathers. Near-exact vs the separate taps; the one semantic
    # restriction: a pixel covered by geometry can no longer be overdrawn
    # by the skydome (possible only when geometry sits BEYOND the dome
    # radius, which a sane scene never does).
    env_merge: bool = False
    # Low-tier cubemap reflection: serve lods >= 1 (roughness >= 0.031)
    # from a half-res RGB mip-pair cube (39-ch rows = the fast gather
    # tier; ~5 ms vs ~13 for the 208-ch env row at 1080p), with an
    # exact cond-gated full-res fallback that only executes when some
    # pixel is shinier. Exact: level k of the half-res chain IS level
    # k+1 of the full chain.
    cube_low_tier: bool = True

    # Pad light tables to next_pow2(count) instead of the full capacity
    # (the unrolled light loop costs per capacity SLOT; see view.py).
    adaptive_light_capacity: bool = True

    # Validation mode (the VK_LAYER_KHRONOS_validation analogue,
    # ZeldaEngine.cpp:799-829): per-frame NaN/inf + silent-drop counters
    # in aux["validation"] / FrameStats.validation. Static flag: off =
    # zero cost, on = recompile (like a Vulkan debug build).
    validation: bool = False

    # zFar sentinel for empty depth buffer
    depth_clear: float = 1.0

    # DIAGNOSTIC ablations for in-context cost attribution (bench/ab
    # tooling only — never correct output): comma-separated set of
    # {"nopcf", "nolight", "notex", "noswitch", "nosky"}.
    ablate: str = ""

    @cached_property
    def n_tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @cached_property
    def n_tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @cached_property
    def padded_height(self) -> int:
        return self.n_tiles_y * self.tile_h

    @cached_property
    def padded_width(self) -> int:
        return self.n_tiles_x * self.tile_w

    @cached_property
    def cubemap_mips(self) -> int:
        # Matches RHICreateTextureCubeResource's full mip chain:
        # floor(log2(size)) + 1
        return self.cubemap_size.bit_length()

    @cached_property
    def texture_mips(self) -> int:
        return self.texture_size.bit_length()

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


# A small config for tests/CI (CPU-friendly shapes).
TEST_CONFIG = EngineConfig(
    width=128,
    height=128,
    shadowmap_dim=256,
    max_vertices=1 << 12,
    max_triangles=1 << 12,
    max_instances=256,
    max_materials=8,
    texture_size=64,
    cubemap_size=32,
    background_size=64,
    tile_h=8,
    tile_w=128,
    tri_chunk=64,
)
