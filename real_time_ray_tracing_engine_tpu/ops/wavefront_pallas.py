"""Fused wavefront path-tracing megakernel (Pallas TPU).

SURVEY.md §7 step 5: one Pallas kernel fuses ray generation → brute-force
intersection → MIS shading → counter RNG → accumulation for a whole bounce
loop, keeping all per-ray state resident in VMEM across bounces instead of
streaming (N, 3) ray buffers through HBM once per bounce the way the pure-JAX
`ops.integrator.trace` path does. This is the TPU analogue of the reference's
`static_render_kernel` (CameraKernels.cu:240-278: one CUDA thread = one pixel
doing every sample and the full `ray_color_cuda` recursion in registers) —
except recursion becomes a `fori_loop` wavefront and warps become (R, 128)
vector planes.

Layout rules (see /opt/skills/guides/pallas_guide.md):
  - A ray tile is R×128 rays; every per-ray quantity is a float32/int32/bool
    plane of shape (R, 128) — sublane × lane — NOT an (N, 3) array, whose
    last-dim-3 would waste 125 of 128 lanes per register.
  - Vectors are component triples (x, y, z) of planes.
  - Scene tables are tiny (Cornell box: ~24 prims) and live in SMEM; the prim
    loop is unrolled with *static* row indices so every prim parameter is a
    scalar read broadcast against ray planes.
  - Material/texture/light "gather" is an unrolled masked-select loop over
    table rows — the tagged-union dispatch of the reference's CUDA side
    (cuda_material_scatter Material.cuh:229-249) becomes `jnp.where` chains.

RNG streams are bit-identical to utils/rng.py (same PCG4D, same tags, same
draw-slot layout), so the pure-JAX integrator is a near-bitwise oracle for
this kernel — mirroring the reference's CPU-renderer-as-oracle-for-CUDA
pattern (StaticCamera.cpp:169-178 fallback chain).

Feature gate: scenes with Perlin-noise textures (or >MAX_MEDIUMS constant
mediums / >MAX_LIGHTS lights / >MAX_PRIMS_SCAN prims) fall back to the
pure-JAX path (`supports_pallas` returns False); everything else — spheres,
quads, all 5 material families, solid/checker textures, sphere+quad MIS
lights, constant mediums (ConstantMedium.cpp free-flight scattering),
defocus, motion blur, stratification — runs in-kernel.

Four intersection strategies, chosen statically by scene shape
(_kernel_modes):
  - unrolled (<=64 prims, Cornell class): Python-unrolled prim loop with
    static SMEM scalar reads + masked-select material/texture gather.
  - vscan (the round-4 DEFAULT for every other scene, use_bvh or not):
    vectorized prim-chunk scan — 128-prim Morton chunks tested against the
    whole tile as (128 prims, 128 rays) outer-product vector ops from VMEM
    planes, whole-tile chunk-AABB culling, a bitcast int32 winner key, and
    once-per-bounce chunked winner gathers. Replaces round 3's per-prim
    scalar-read scan (measured scalar-issue-bound): bouncing-spheres
    5.8 -> 17+ Mpaths/s, grid-4913 1.6 -> 5.5 on v5e.
  - stack BVH (RTX_BVH_STACK=1 only — an opt-in measured loser vs vscan
    at every size tried): whole-tile shared-SMEM-stack traversal of the
    SAH BVH, segregated typed leaves.
  - lane BVH (RTX_LANE_BVH=1, all-sphere use_bvh scenes): per-lane
    STACKLESS skip-link traversal via 128-lane dynamic gathers. The only
    mode whose work scales with what each RAY sees — but each gather costs
    O(table/128) vector selects, so it loses to vscan below ~10k prims
    (measured round 4: 3.6 vs 10.5 Mpaths/s on bouncing-spheres) and is
    watchdog-unusable beyond ~15k (round 5, BASELINE.md).

Backward passes (differentiable rendering — no reference analogue):
  - forward-mode in-kernel gradients (grad_tex): exact tex_color weight
    planes (<= MAX_GRAD_TEXS rows) or the O(1)-in-NT suffix-radiance
    estimator, plus per-slot tangent bundles for fuzz/IOR/geometry; runs
    under the capped+compacted schedule too
    (render_pass_pallas_grad_compacted).
  - ADJOINT reverse-mode in-kernel pass (adjoint=True, round 5): every
    trainable family at O(1) per parameter, no slot cap — winner
    selection detached outside jax.vjp, per-lane gathered values as diff
    inputs, one-hot cotangent scatters; two sweep orchestrations
    (per-sample two-phase, or the segmented-regeneration sweep via
    adjoint_seg>0) that agree to reassociation noise.
"""
from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.flat import (FlatScene, MAT_LAMBERTIAN, MAT_METAL,
                          MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC,
                          TEX_SOLID, TEX_CHECKER, TEX_NOISE)
from ..utils.rng import _pcg4d, _to_unit, _GOLDEN, N_DRAWS, \
    D_PICK, D_LIGHT_SEL, D_LIGHT_U, D_LIGHT_V, D_MAT_U, D_MAT_V, \
    D_FUZZ_U, D_FUZZ_V, D_REFL
from ..utils.perlin import turbulence3 as _turbulence3
from ..models.camera import CAMERA_DRAW_TAG

BIG = 1e30
T_MIN = 1e-3
INV_4PI = 1.0 / (4.0 * math.pi)

# ------------------------------------------------------------------ limits
MAX_PRIMS_UNROLL = 64   # fully unrolled intersection loop bound
# fori_loop prim scan bound. The REAL capacity gate is the measured SMEM
# byte budget below (pallas_gate_reason computes the actual footprint); this
# constant only caps the loop trip count at a sanity level.
MAX_PRIMS_SCAN = 16384
BVH_STACK = 64          # reference BVHNode.cpp:398 traversal stack depth
# v5e scalar memory is 1 MiB per core (measured: "Used 1.10M of 1.00M smem"
# on an 8000-prim scene); leave headroom for the stack scratch + control
SMEM_BUDGET = 920_000


def _smem_table_bytes(flat: FlatScene, n_hard_slots: int = 0) -> int:
    """Actual SMEM footprint of the kernel's scene tables, in bytes.

    Tables are passed transposed (cols, rows) — each of the few cols pads its
    row of `rows` f32/i32 entries to a 128-element multiple — so the cost is
    essentially the data size, and the prim cap is a *derived* budget check
    instead of a guessed constant (round-1 ADVICE: the old 4096 cap was
    untested against real SMEM capacity).

    n_hard_slots > 0 models the fused hard-parameter backward on vscan
    scenes, where the wrapper keeps the FULL sphf + matf tables in SMEM for
    theta aliasing instead of the slimmed 1-row stubs (round-4 ADVICE item
    2: the gate must reflect the grad pass's actual footprint)."""
    def t(cols, rows):
        return 4 * cols * (-(-max(rows, 1) // 128) * 128)

    S = flat.sph_center.shape[0]
    Q = flat.quad_corner.shape[0]
    P = S + Q
    NM = flat.mat_type.shape[0]
    NT = flat.tex_type.shape[0]
    M = flat.med_neg_inv_density.shape[0] if flat.n_mediums else 0
    MQ = flat.med_quad_corner.shape[1]
    MS = flat.med_sph_center.shape[1]
    unroll, lane, bvh, vscan = _kernel_modes(flat)
    # mirror the wrapper's table slimming: unrolled mode drops the resolved
    # per-prim rows; bvh mode drops the mat/tex tables (the resolved rows
    # replace them); lane/vscan modes additionally move sphere + per-prim
    # material data into VMEM gather tables, keeping only quad/medium rows
    # (vscan) or medium rows (lane) in SMEM
    B = flat.bvh_bbox_min.shape[0] if bvh else 1
    vquad = vscan and Q > MAX_QUADS_VSCAN
    n_sph = 1 if (lane or (vscan and not n_hard_slots)) else S
    n_quadf = 1 if vquad else Q
    n_vbox = ((-(-S // VCHUNK)) + (-(-Q // VCHUNK) if vquad else 0)
              if (vscan and S) else 1)
    if unroll:
        n_primmat = 1
    elif lane or vquad:
        n_primmat = max(M, 1)
    elif vscan:
        n_primmat = max(Q + M, 1)
    else:
        n_primmat = P + M
    n_mt = NM if unroll else 1
    n_matf = NM if (unroll or (vscan and n_hard_slots)) else 1
    n_tex = NT if unroll else 1
    return (t(8, n_sph) + t(18, n_quadf) + t(1, P + M)
            + t(25, max(flat.n_lights, 1))
            + t(2, n_mt) + t(2, n_matf) + t(14, n_tex)
            + t(PMCOLS, n_primmat)              # resolved per-prim rows
            + t(6, n_vbox)                      # vscan chunk boxes
            + t(3 + 4 * MS + 17 * MQ, max(M, 1))
            + t(6, B) + t(5, B) + t(1, P if bvh else 1)  # BVH stack tables
            + 4 * (3 + 22))                     # iscal + fscal
MAX_LIGHTS = 32
MAX_MATS = 16           # unrolled masked-select material gather bound
MAX_TEXS = 16
PMCOLS = 19        # resolved per-prim row width (_pack_tables.resolved_rows;
#                    col 18 = mat row id for hard-slot theta aliasing)
MAX_HARD_SLOTS_VSCAN = 32   # per-slot tangent bundles cost 9 lane planes
#                             each; cap the fused hard backward on vscan
#                             scenes where the bundle state stays small
MAX_MEDIUMS = 4         # unrolled constant-medium free-flight bound
# per-medium SMEM row width is 6 + 17*MQ + 1 where MQ = quads per boundary
# (dynamic since arbitrary convex boundaries; see _pack_tables)


def _morton3(x, y, z):
    """30-bit Morton code from 10-bit quantized coords (uint32 planes/vec)."""
    def spread(v):
        v = v & jnp.uint32(0x3FF)
        v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
        return v
    return (spread(x) << jnp.uint32(2)) | (spread(y) << jnp.uint32(1)) \
        | spread(z)


# ------------------------------------------------------- plane-vector math
def _sqrt0(x):
    """sqrt(max(x, 0)) with a finite gradient at the clamp: bit-identical
    forward values, but the reverse-mode cotangent through the x <= 0
    branch is exactly 0 instead of 0 * inf = NaN (the where-NaN-grad trap;
    the adjoint backward pushes zero cotangents through every non-hit
    lane's discriminant, which sits exactly at the clamp)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize3(x, y, z, eps=1e-8):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps * eps))
    return x * inv, y * inv, z * inv


def _where3(m, ax, ay, az, bx, by, bz):
    return jnp.where(m, ax, bx), jnp.where(m, ay, by), jnp.where(m, az, bz)


def _onb_from_w(wx, wy, wz):
    """Orthonormal basis from unit w (vecmath.onb_from_w semantics,
    reference ONB.hpp:19-65)."""
    big = jnp.abs(wx) > 0.9
    ax = jnp.where(big, 0.0, 1.0)
    ay = jnp.where(big, 1.0, 0.0)
    vx, vy, vz = _cross3(wx, wy, wz, ax, ay, jnp.zeros_like(ax))
    vx, vy, vz = _normalize3(vx, vy, vz)
    ux, uy, uz = _cross3(wx, wy, wz, vx, vy, vz)
    return (ux, uy, uz), (vx, vy, vz), (wx, wy, wz)


# ----------------------------------------------------------- RNG (planes)
def _f2u(x_f):
    """Non-negative integer-valued f32 plane -> uint32 (Mosaic has no direct
    float<->uint32 converts; route through int32)."""
    return jax.lax.bitcast_convert_type(x_f.astype(jnp.int32), jnp.uint32)


def _draws(k0, k1, k2, tag, n):
    """n U[0,1) planes for integer tag; identical stream to rng.uniforms."""
    outs = []
    for blk in range(-(-n // 4)):
        ctr = (tag * jnp.uint32(0x0000193) + jnp.uint32(blk)).astype(
            jnp.uint32)
        # no explicit broadcast: _pcg4d broadcasts scalar-or-plane ctr, and
        # an identity broadcast_to of a tiled vector trips a Mosaic relayout
        # ("non-singleton dimension replicated in destination")
        a, b, c, d = _pcg4d(k0, k1, k2, ctr)
        outs += [_to_unit(a), _to_unit(b), _to_unit(c), _to_unit(d)]
    return outs[:n]


# ------------------------------------------------------------ wrapper-side
def pallas_gate_reason(flat: FlatScene) -> str | None:
    """Why this scene cannot run on the fused kernel (None = it can).

    Reads table *values* — call outside jit (scene compile time). The string
    names the feature so drivers can tell the user exactly what knocked the
    scene off the ~1000x faster path instead of silently degrading."""
    if flat.n_mediums > MAX_MEDIUMS:
        return (f"{flat.n_mediums} constant mediums exceeds the kernel bound "
                f"MAX_MEDIUMS={MAX_MEDIUMS}")
    if flat.n_prims == 0:
        return "empty scene (no primitives)"
    if not flat.use_bvh and flat.n_prims > MAX_PRIMS_SCAN:
        return (f"{flat.n_prims} primitives exceeds the kernel scan bound "
                f"MAX_PRIMS_SCAN={MAX_PRIMS_SCAN} (compile with use_bvh)")
    smem = _smem_table_bytes(flat)
    if smem > SMEM_BUDGET:
        return (f"scene tables need {smem} B of TPU scalar memory, over the "
                f"{SMEM_BUDGET} B budget (1 MiB SMEM per core)")
    if flat.n_lights > MAX_LIGHTS:
        return (f"{flat.n_lights} MIS lights exceeds the kernel bound "
                f"MAX_LIGHTS={MAX_LIGHTS}")
    # noise textures run in-kernel since the hash-noise redesign
    # (utils/perlin.py); nested checker DAGs run in every mode since
    # round 4 — the unrolled kernel by static recursion (texture_color),
    # the vscan/BVH/lane kernels by per-lane gather descent over the vtex
    # VMEM table (tex_eval_dag) — so no texture shape gates remain.
    return None


def supports_pallas(flat: FlatScene) -> bool:
    """True if the fused kernel covers this scene's feature set."""
    return pallas_gate_reason(flat) is None


def pallas_grad_gate_reason(flat: FlatScene) -> str | None:
    """Why FULL-family scene-parameter gradients cannot run fused in-kernel
    (None = they can).

    The full grad kernel (tex_color weight planes + hard-parameter tangent
    bundles, see _make_kernel) covers unrolled-mode scenes (Cornell class),
    including constant mediums. Scan/BVH scenes can still run the tex_color-
    only fused backward (pallas_scan_grad_gate_reason); everything else gets
    the pure-JAX replay backward (parallel.train.make_kernel_render)."""
    r = pallas_gate_reason(flat)
    if r is not None:
        return r
    S = flat.sph_center.shape[0]
    Q = flat.quad_corner.shape[0]
    if not _use_unrolled(S, Q, flat.mat_type.shape[0],
                         flat.tex_type.shape[0]):
        return (f"{S + Q} prims / {flat.mat_type.shape[0]} materials / "
                f"{flat.tex_type.shape[0]} textures exceeds the unrolled "
                "kernel bounds (vscan fuses tex_color for any scene plus "
                f"up to MAX_HARD_SLOTS_VSCAN={MAX_HARD_SLOTS_VSCAN} hard "
                "slots; see pallas_hard_slots_gate_reason)")
    return None


def supports_pallas_grad(flat: FlatScene) -> bool:
    return pallas_grad_gate_reason(flat) is None


def pallas_hard_slots_gate_reason(flat: FlatScene,
                                  n_slots: int) -> str | None:
    """Why `n_slots` hard-parameter slots (fuzz/IOR/sphere geometry)
    cannot run fused in-kernel (None = they can). Unrolled scenes: always
    (the scene size bounds the slot count). vscan scenes (round 4):
    post-gather theta aliasing in closest_hit_vscan supports up to
    MAX_HARD_SLOTS_VSCAN slots — each slot pushes a 9-plane tangent bundle
    through the linearized bounce physics, so the bound keeps the carry
    state small. Stack/lane traversal kernels: never (their
    lax.while_loops are not linearizable)."""
    r = pallas_gate_reason(flat)
    if r is not None:
        return r
    unroll, _lane, _bvh, vscan = _kernel_modes(flat)
    if unroll:
        return None
    if not vscan:
        return ("hard-parameter slots need the unrolled or vscan kernel "
                "(stack/lane traversal loops are not linearizable)")
    if n_slots > MAX_HARD_SLOTS_VSCAN:
        return (f"{n_slots} hard slots exceed MAX_HARD_SLOTS_VSCAN="
                f"{MAX_HARD_SLOTS_VSCAN} tangent bundles (replay backward)")
    # the grad wrapper keeps the FULL sphf + matf tables in SMEM for theta
    # aliasing — re-check the budget at the grad pass's actual footprint
    smem = _smem_table_bytes(flat, n_hard_slots=n_slots)
    if smem > SMEM_BUDGET:
        return (f"hard-slot grad tables need {smem} B of TPU scalar "
                f"memory (full sphere+material tables for theta aliasing), "
                f"over the {SMEM_BUDGET} B budget")
    return None


# tex_color weight/cotangent planes cost 6 VMEM lane-planes per texture row
# (~48 KiB/row at R=16); cap the scan-mode fused backward where the carry
# still fits comfortably alongside the wavefront state
MAX_GRAD_TEXS = 32


def pallas_scan_grad_gate_reason(flat: FlatScene) -> str | None:
    """Why the tex_color-ONLY fused backward cannot run on this scene
    (None = it can — any kernel mode, incl. vscan/BVH/lane, any texture
    count). Hard-parameter families (fuzz/IOR/geometry) additionally need
    unrolled mode; callers check their requested slots separately
    (parallel.train).

    Texture tables up to MAX_GRAD_TEXS rows use the exact per-lane
    weight-plane backward; bigger tables (e.g. bouncing_spheres' 460 rows)
    use the O(1)-in-NT two-phase suffix-radiance estimator
    (_make_kernel grad_suffix) — exact except that a channel whose albedo
    is exactly 0 gets a 0 scatter-gradient (one-sided boundary case)."""
    return pallas_gate_reason(flat)


def pallas_adjoint_gate_reason(flat: FlatScene) -> str | None:
    """Why the in-kernel ADJOINT (reverse-mode) backward cannot run on this
    scene (None = it can). The adjoint pass covers EVERY trainable family
    (tex_color + fuzz + IOR + sphere geometry) at O(1) cost per parameter
    with no slot cap and no zero-albedo caveat — it always takes the
    vscan/vquad kernel path, so the only gates are the base kernel gates.
    RTX_ADJOINT=0 disables it (read at bake time, like the other gates)."""
    r = pallas_gate_reason(flat)
    if r is not None:
        return r
    if os.environ.get("RTX_ADJOINT", "1") == "0":
        return "disabled by RTX_ADJOINT=0"
    return None


# trainable-field <-> hard-slot mapping shared with parallel/train.py
HARD_SLOT_FIELDS = {"fuzz": "mat_fuzz", "ior": "mat_ior",
                    "sphc": "sph_center", "sphr": "sph_radius"}


def hard_param_slots(flat: FlatScene, fields=None) -> tuple:
    """Static descriptors of the scalar "hard" trainable parameters (those
    entering through scatter directions / intersection t rather than
    multiplicative throughput): metal fuzz, dielectric IOR, active-sphere
    centers/radii. Reads table VALUES — call at bake time, outside jit.

    fields restricts to a set of FlatScene field names (train.py passes the
    user's requested params so untrained families cost no tangent planes)."""
    mt = np.asarray(flat.mat_type)
    act = np.asarray(flat.sph_active).copy()
    # light-list geometry compiles into INACTIVE sphere rows (excluded from
    # world intersection, scene/compile.py) that still carry gradient through
    # the MIS light pdf/sampling — their slots must exist too
    S = act.shape[0]
    for p in np.asarray(flat.light_prim)[:flat.n_lights]:
        if p < S:
            act[p] = True
    slots = []
    for m in range(mt.shape[0]):
        if mt[m] == MAT_METAL and (fields is None or "mat_fuzz" in fields):
            slots.append(("fuzz", m))
        if mt[m] == MAT_DIELECTRIC and (fields is None
                                        or "mat_ior" in fields):
            slots.append(("ior", m))
    for p in range(S):
        if act[p]:
            if fields is None or "sph_center" in fields:
                slots += [("sphc", p, 0), ("sphc", p, 1), ("sphc", p, 2)]
            if fields is None or "sph_radius" in fields:
                slots.append(("sphr", p))
    return tuple(slots)


def light_sphere_sources(flat: FlatScene) -> tuple:
    """Per MIS-light row: the source sphere's row index, or -1 for quad
    lights — static metadata for the grad kernel's theta aliasing (light rows
    bake COPIES of sphere geometry in _pack_tables). Bake time only."""
    S = flat.sph_center.shape[0]
    lp = np.asarray(flat.light_prim)[:max(flat.n_lights, 1)]
    return tuple(int(p) if p < S else -1 for p in lp)


def _use_unrolled(S, Q, NM, NT) -> bool:
    """Static dispatch between the fully-unrolled Cornell-class kernel and
    the fori_loop prim-scan kernel for large scenes."""
    return S + Q <= MAX_PRIMS_UNROLL and NM <= MAX_MATS and NT <= MAX_TEXS


VCHUNK = 128            # prims per vectorized-scan test chunk (= the
#                         128-lane gather chunk). Measured negative result
#                         (round 4, v5e): 32-prim chunks for 4x finer
#                         culling LOSE (grid4913 3.2 -> 1.6 Mpaths/s) —
#                         a lax.cond inside the bounce loop costs ~2K
#                         cycles once the live wavefront state must be
#                         spilled around the branch, so more/finer culling
#                         branches cost more than the chunk work they skip
VSCAN_BIG = 8           # largest prims split into vscan's unconditional
#                         sub-block (keeps Morton chunk AABBs tight)
MAX_QUADS_VSCAN = 64    # vscan's per-quad fori/unroll bound; beyond it
#                         quads move to their own vectorized 128-chunk
#                         tables (vquad; same outer-product pattern as the
#                         sphere chunks, _pack_vquad_tables)
# bit pattern of BIG with the low 7 mantissa bits cleared — the "no hit"
# value of the vscan winner key (t bits | chunk-local prim id; positive-f32
# bit patterns order like the floats, so int32 min == float min)
_BIG_KEY = int(np.float32(BIG).view(np.int32)) & ~127


def _kernel_env() -> tuple:
    """Kernel-mode env knobs, read OUTSIDE jit and threaded through as a
    static argument so changing them mid-process cannot silently reuse a
    kernel compiled under the old setting (round-3 ADVICE item 1)."""
    return (os.environ.get("RTX_LANE_BVH", "0"),
            os.environ.get("RTX_LANE_GATHER", "take"),
            os.environ.get("RTX_BVH_STACK", "0"),
            os.environ.get("RTX_VSCAN_CULL", "cond"))


def _kernel_modes(flat: FlatScene, env=None):
    """Static kernel-mode dispatch shared by the wrapper and the SMEM gate:
    (unroll, lane_mode, bvh_mode, vscan_mode). Exactly one is True.

    Round-4 default for every non-unrolled scene (use_bvh or not) is the
    vectorized prim-chunk scan — measured faster than both the shared-stack
    and per-lane BVH traversals up to the MAX_PRIMS_SCAN bound, because its
    per-bounce work is dense (128 prims x 128 rays) vector ops with
    Morton-chunk AABB culling, not per-prim scalar reads or per-lane
    gathers. The traversal kernels stay reachable ONLY by env opt-in:
    RTX_BVH_STACK=1 forces the shared-stack mode, RTX_LANE_BVH=1 the
    per-lane skip-link mode; there is no auto-selection of either (round-4
    measurements: both lose to vscan/vquad at every size tried —
    quad-heavy scenes take vquad chunk tables, BASELINE.md)."""
    if env is None:
        env = _kernel_env()
    lane_bvh, _gather, bvh_stack = env[:3]
    S = flat.sph_center.shape[0]
    Q = flat.quad_corner.shape[0]
    unroll = _use_unrolled(S, Q, flat.mat_type.shape[0],
                           flat.tex_type.shape[0])
    lane = (lane_bvh == "1" and bool(flat.use_bvh) and not unroll
            and flat.n_quads == 0
            and flat.bvh_bbox_min.shape[0] <= LANE_BVH_MAX
            and flat.bvh_prims.shape[0] <= LANE_BVH_MAX)
    bvh = (bool(flat.use_bvh) and not unroll and not lane
           and bvh_stack == "1")
    vscan = not unroll and not lane and not bvh
    return unroll, lane, bvh, vscan


def _pack_vscan_tables(flat: FlatScene, primmat_s):
    """Tables for the vectorized prim-chunk scan (closest_hit_vscan).

    The round-3 scan kernel walked prims with dynamic SMEM scalar reads —
    ~7 serialized scalar-core reads per prim per bounce, which bound the
    whole intersection. Round 4 instead tests one 128-prim chunk against
    every ray of the tile as (128 prims, 128 rays) outer-product vector
    ops straight from VMEM planes: the scalar core only issues the chunk
    loop, and the VPU sees dense 16-vreg ops. Spheres are Morton-ordered
    (inactive rows last) so chunks are spatially tight and cullable by one
    whole-tile AABB slab test each — the flat TPU stand-in for the
    reference's per-ray BVH descent (BVHNode.cpp:385-446).

    Layouts:
      vtab (C*128, 8) f32 — prim rows on SUBLANES, fields on lanes
        [cx cy cz cdx cdy cdz r valid]; 8-row-aligned dynamic slices pull
        one chunk's (128, 8) block per loop step.
      ptab (C_g*16, 128) — same fields + the ORIGINAL sphere row id
        (col 8, for hard-slot theta aliasing), chunk-major
        (gather_fields layout) for
        the once-per-bounce winner re-derivation.
      pmtab (C*24, 128) — resolved per-prim material rows (PMCOLS), same
        Morton order, gathered once for the winner.
      vbox (C, 6) f32 — conservative chunk AABBs over motion (SMEM).
    Returns (vtab, ptab, pmtab, vbox, C)."""
    f32 = jnp.float32
    c0 = flat.sph_center
    cd = flat.sph_cdelta
    r = flat.sph_radius[:, None]
    active = (flat.sph_active[:, None]
              & (flat.sph_radius[:, None] > 0.0))
    lo = jnp.minimum(c0, c0 + cd) - r          # motion-swept sphere bbox
    hi = jnp.maximum(c0, c0 + cd) + r
    S = c0.shape[0]
    moving = jnp.any(cd != 0.0, axis=1)
    # the VSCAN_BIG largest active prims (by swept extent) go to a
    # dedicated final chunk tested as a cheap unconditional (8, 128)
    # sub-block: one huge sphere (e.g. bouncing_spheres' r=1000 ground,
    # main.cpp:75-78) would otherwise inflate its Morton chunk's AABB to
    # cover the whole scene and defeat chunk culling for 127 innocents.
    # Picked among STATIC actives when there are enough (the static count
    # is compile-time metadata, so the static-chunk boundary below stays a
    # trace-time constant); a scene of mostly movers falls back to all.
    n_big = VSCAN_BIG if S > VCHUNK else 0
    nas = int(flat.n_sph_active_static)
    pick_static_bigs = nas >= n_big
    extent = jnp.max(hi - lo, axis=1)
    if n_big:
        pool = (active[:, 0] & ~moving) if pick_static_bigs \
            else active[:, 0]
        rank = jnp.argsort(jnp.argsort(-jnp.where(pool, extent, -1.0)))
        is_big = rank < n_big
    else:
        is_big = jnp.zeros((S,), bool)
    mid = 0.5 * (lo + hi)
    wmin = jnp.min(jnp.where(active, mid, BIG), axis=0)
    wmax = jnp.max(jnp.where(active, mid, -BIG), axis=0)
    scale = 1023.0 / jnp.maximum(wmax - wmin, 1e-6)
    q = jnp.clip((mid - wmin) * scale, 0.0, 1023.0).astype(jnp.uint32)
    code = _morton3(q[:, 0], q[:, 1], q[:, 2])
    # order: static smalls (Morton), then moving smalls (Morton) — the
    # leading C_stat whole-static chunks skip the 6 motion ops — then
    # inactive rows (never hit), then the bigs LAST so they land exactly
    # in the final chunk's first rows
    code = jnp.where(active[:, 0] & moving,
                     code | jnp.uint32(1 << 30), code)
    code = jnp.where(active[:, 0], code, jnp.uint32(0xFFFFFFFE))
    code = jnp.where(is_big, jnp.uint32(0xFFFFFFFF), code)
    perm = jnp.argsort(code)
    n_small = S - n_big
    # >= 1 chunk even for sphere-free (all-quad) scenes: the kernel loops
    # over a single all-invalid chunk whose empty box never passes a cull
    C_small = max(-(-n_small // VCHUNK), 1)
    C = C_small + (1 if n_big else 0)
    n_small_static = max(nas - n_big, 0) if pick_static_bigs else 0
    C_stat = min(n_small_static // VCHUNK, C_small)
    valid = active.astype(f32)
    # col 6 = r^2 for valid rows, else -BIG: the (disc > 0) test then
    # rejects invalid/pad rows for free (disc = h^2 - a(|oc|^2 - r2m) is
    # hugely negative), dropping the per-pair valid compare; col 7 keeps
    # the actual radius for the winner's normal
    r2m = jnp.where(valid > 0.5, r * r, -BIG)
    rows = jnp.concatenate([c0, cd, r2m, r], axis=1)[perm]
    lo = jnp.where(active & ~is_big[:, None], lo, BIG)[perm]
    hi = jnp.where(active & ~is_big[:, None], hi, -BIG)[perm]
    # original sphere row ids ride ptab col 8 so hard-slot theta aliasing
    # can compare the winner against a STATIC slot index (pid itself is a
    # Morton-permuted position); f32-exact small ints, -1 on pad rows
    ids = perm.astype(f32)[:, None]
    if n_big:
        rows = jnp.concatenate([
            jnp.pad(rows[:n_small],
                    ((0, C_small * VCHUNK - n_small), (0, 0))),
            jnp.pad(rows[n_small:], ((0, VCHUNK - n_big), (0, 0)))])
        pm = jnp.concatenate([
            jnp.pad(primmat_s[perm][:n_small],
                    ((0, C_small * VCHUNK - n_small), (0, 0))),
            jnp.pad(primmat_s[perm][n_small:],
                    ((0, VCHUNK - n_big), (0, 0)))])
        ids = jnp.concatenate([
            jnp.pad(ids[:n_small], ((0, C_small * VCHUNK - n_small), (0, 0)),
                    constant_values=-1.0),
            jnp.pad(ids[n_small:], ((0, VCHUNK - n_big), (0, 0)),
                    constant_values=-1.0)])
    else:
        pad = C * VCHUNK - S
        rows = jnp.pad(rows, ((0, pad), (0, 0)))          # (C*128, 8)
        pm = jnp.pad(primmat_s[perm], ((0, pad), (0, 0)))
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=-1.0)
    # zero-filled PAD rows would carry r2m = 0 (a sphere of radius 0 at the
    # origin — numerically hittable by a grazing ray); force their r2m to
    # -BIG so (disc > 0) rejects them unconditionally
    rows = rows.at[:, 6].set(
        jnp.where(rows[:, 7] > 0.0, rows[:, 6], -BIG))
    lo = jnp.pad(lo[:n_small] if n_big else lo,
                 ((0, C * VCHUNK - (n_small if n_big else S)), (0, 0)),
                 constant_values=BIG)
    hi = jnp.pad(hi[:n_small] if n_big else hi,
                 ((0, C * VCHUNK - (n_small if n_big else S)), (0, 0)),
                 constant_values=-BIG)
    vbox = jnp.concatenate([lo.reshape(C, VCHUNK, 3).min(axis=1),
                            hi.reshape(C, VCHUNK, 3).max(axis=1)], axis=1)

    ptab, C_g = _gather_table(jnp.concatenate([rows, ids], axis=1).T)
    pmtab, _ = _gather_table(pm.T)
    return rows, ptab, pmtab, vbox, C, C_g, C_stat, n_big


VQF = 17                # vquad test-table fields (below); padded to 24


def _pack_vquad_tables(flat: FlatScene, primmat_q):
    """Quad analogue of _pack_vscan_tables, for scenes whose quad count
    exceeds the per-quad fori bound (MAX_QUADS_VSCAN): Morton-ordered
    128-quad chunks tested as (128 quads, 128 rays) outer-product vector
    ops, chunk AABBs for whole-tile culling. Layouts:

      vqtab (Cq*128, VQF->24) — quad rows on sublanes, fields on lanes
        [nx ny nz d cx cy cz ux uy uz vx vy vz wx wy wz act].
      qptab (C_qg*8, 128) — [nx ny nz d] chunk-major for the winner's
        exact-t re-derivation (validity was decided at selection; the
        plane-equation t needs only the normal and offset).
      qpmtab (C_qg*24, 128) — resolved material rows (PMCOLS).
      qbox (Cq, 6) — chunk AABBs (SMEM, appended after the sphere chunk
        boxes).
    Returns (vqtab, qptab, qpmtab, qbox, Cq, C_qg)."""
    f32 = jnp.float32
    corner = flat.quad_corner
    u, v, n = flat.quad_u, flat.quad_v, flat.quad_normal
    act = flat.quad_active[:, None]
    Qn = corner.shape[0]
    # quad AABB from its 4 corners
    c1 = corner + u
    c2 = corner + v
    c3 = corner + u + v
    lo = jnp.minimum(jnp.minimum(corner, c1), jnp.minimum(c2, c3))
    hi = jnp.maximum(jnp.maximum(corner, c1), jnp.maximum(c2, c3))
    mid = 0.5 * (lo + hi)
    wmin = jnp.min(jnp.where(act, mid, BIG), axis=0)
    wmax = jnp.max(jnp.where(act, mid, -BIG), axis=0)
    scale = 1023.0 / jnp.maximum(wmax - wmin, 1e-6)
    q = jnp.clip((mid - wmin) * scale, 0.0, 1023.0).astype(jnp.uint32)
    code = _morton3(q[:, 0], q[:, 1], q[:, 2])
    code = jnp.where(act[:, 0], code, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(code)
    Cq = -(-Qn // VCHUNK)
    pad = Cq * VCHUNK - Qn
    rows = jnp.concatenate([
        n, flat.quad_d[:, None], corner, u, v, flat.quad_w,
        act.astype(f32)], axis=1)[perm]
    rows = jnp.pad(rows, ((0, pad), (0, 0)))          # (Cq*128, VQF)
    lo = jnp.pad(jnp.where(act, lo, BIG)[perm], ((0, pad), (0, 0)),
                 constant_values=BIG)
    hi = jnp.pad(jnp.where(act, hi, -BIG)[perm], ((0, pad), (0, 0)),
                 constant_values=-BIG)
    qbox = jnp.concatenate([lo.reshape(Cq, VCHUNK, 3).min(axis=1),
                            hi.reshape(Cq, VCHUNK, 3).max(axis=1)], axis=1)
    qptab, C_qg = _gather_table(rows[:, :4].T)
    qpmtab, _ = _gather_table(
        jnp.pad(primmat_q[perm], ((0, pad), (0, 0))).T)
    return rows, qptab, qpmtab, qbox, Cq, C_qg


# Node/prim id bound for the per-lane kernel. The round-3 packed control
# words capped ids at 14 bits (16,383); the round-4 table rewrite stores
# miss/hit-offset/count as SEPARATE f32-exact fields (_pack_lane_tables),
# so the only representability bound left is f32 integer exactness (2^24).
# 2^22 leaves 4x headroom and admits the >16k-prim regime the mode was
# built for (round-5 VERDICT item 4; >16k correctness re-validated against
# the vscan kernel on a 32k-sphere grid, tests/test_bvh.py).
LANE_BVH_MAX = 1 << 22


NODE_FIELDS = 9         # x0 x1 y0 y1 z0 z1 miss hof cnt (lane node table)


def _gather_table(tab):
    """(nf, N) field table -> chunk-major ((Cg*nfp, 128), Cg) layout for
    the kernel's per-lane gather_fields (8-row-aligned field blocks per
    128-entry chunk)."""
    nf, N = tab.shape
    nfp = -(-nf // 8) * 8
    Cg = -(-N // 128)
    tab = jnp.pad(tab, ((0, nfp - nf), (0, Cg * 128 - N)))
    return tab.reshape(nfp, Cg, 128).transpose(1, 0, 2).reshape(
        Cg * nfp, 128), Cg


def _pack_lane_tables(flat: FlatScene, primmatf):
    """Chunked 128-lane tables for the per-lane skip-link BVH kernel.

    Per-lane traversal is possible on TPU because Mosaic supports dynamic
    lookups WITHIN a 128-lane register row: a lookup into an N-entry table
    costs ceil(N/128) per-chunk steps (take_along_axis gather, or a one-hot
    MXU matmul — closest_hit_lane.gather_fields). Tables are laid out as
    (fields * chunks, 128) f32 in VMEM:

      node table (NODE_FIELDS rows/chunk): box min/max per axis (exact
        f32) + miss link, hit-link-or-leaf-offset, leaf count as f32-exact
        small integers (<= 16383 << 2^24, so every value is a REAL float —
        no bit packings whose NaN/denormal patterns a float-typed gather or
        matmul could canonicalize).
      prim table (7 rows/chunk): sphere cx, cy, cz, cdx, cdy, cdz, r in
        BVH leaf order (bvh_prims), full f32.
      pmat table (PMCOLS rows/chunk): the resolved per-prim material rows in
        the same leaf order (winner materials are gathered ONCE per bounce
        after traversal).

    Layout is CHUNK-major — chunk c's field rows are contiguous at
    [c*nfp, c*nfp + nf) with nfp = nf rounded up to 8 sublanes — so the
    gather's fori_loop body fetches one chunk's whole field block with a
    single 8-aligned dynamic VMEM slice (round-4 scoped-VMEM fix: the
    round-3 field-major layout forced a fully unrolled chunk loop whose
    per-chunk one-hot matmul scratch Mosaic stack-allocated all at once,
    36.9 MiB on bouncing_spheres vs the 16 MiB scoped limit)."""
    f32 = jnp.float32

    chunkmajor = _gather_table
    cnt = jnp.where(flat.bvh_leaf, flat.bvh_right, 0)
    hof = jnp.where(flat.bvh_leaf, flat.bvh_left, flat.bvh_hit)
    cols = [flat.bvh_bbox_min[:, 0], flat.bvh_bbox_max[:, 0],
            flat.bvh_bbox_min[:, 1], flat.bvh_bbox_max[:, 1],
            flat.bvh_bbox_min[:, 2], flat.bvh_bbox_max[:, 2],
            flat.bvh_miss.astype(f32), hof.astype(f32), cnt.astype(f32)]
    B = cols[0].shape[0]
    ntab, C_n = chunkmajor(jnp.stack(cols))

    order = flat.bvh_prims
    P = order.shape[0]
    ptab, C_p = chunkmajor(jnp.concatenate([
        flat.sph_center[order], flat.sph_cdelta[order],
        flat.sph_radius[order][:, None]], axis=1).T)          # (7, P)
    pmtab, _ = chunkmajor(primmatf[order].T)             # (PMCOLS, P)
    return ntab, ptab, pmtab, C_n, C_p, B, P


def _pack_tables(flat: FlatScene):
    """Gather the FlatScene into kernel-ready SMEM tables (traced jnp ops)."""
    f32 = jnp.float32
    sphf = jnp.concatenate([
        flat.sph_center, flat.sph_cdelta, flat.sph_radius[:, None],
        flat.sph_active.astype(f32)[:, None]], axis=1)        # (S, 8)
    quadf = jnp.concatenate([
        flat.quad_corner, flat.quad_u, flat.quad_v, flat.quad_normal,
        flat.quad_d[:, None], flat.quad_w, flat.quad_area[:, None],
        flat.quad_active.astype(f32)[:, None]], axis=1)       # (Q, 18)
    prim_mat = jnp.concatenate([flat.sph_mat, flat.quad_mat])  # (S+Q,)

    # lights: resolve unified prim ids into self-contained rows
    S = flat.sph_center.shape[0]
    li = flat.light_prim
    is_sph = (li < S).astype(f32)
    si = jnp.clip(li, 0, S - 1)
    qi = jnp.clip(li - S, 0, flat.quad_corner.shape[0] - 1)
    lightf = jnp.concatenate([
        is_sph[:, None],
        flat.sph_center[si], flat.sph_cdelta[si],
        flat.sph_radius[si][:, None],                          # cols 1-7
        flat.quad_corner[qi], flat.quad_u[qi], flat.quad_v[qi],
        flat.quad_normal[qi], flat.quad_d[qi][:, None],
        flat.quad_w[qi], flat.quad_area[qi][:, None],          # cols 8-24
    ], axis=1)                                                 # (L, 25)

    mati = jnp.stack([flat.mat_type, flat.mat_tex], axis=1)    # (NM, 2)
    matf = jnp.stack([flat.mat_fuzz, flat.mat_ior], axis=1)    # (NM, 2)

    # textures resolved one level deep: checker children -> solid colors.
    # cols 11-12 carry the child row ids so the gradient kernel can route
    # d(attenuation)/d(tex_color) to the parity-selected child row; col 13
    # flags Perlin-noise rows (marble evaluated in-kernel from hash noise).
    even_c = flat.tex_color[flat.tex_child_even]
    odd_c = flat.tex_color[flat.tex_child_odd]
    is_chk = (flat.tex_type == TEX_CHECKER).astype(f32)
    is_noi = (flat.tex_type == TEX_NOISE).astype(f32)
    texf = jnp.concatenate([
        flat.tex_color, flat.tex_scale[:, None], is_chk[:, None],
        even_c, odd_c,
        flat.tex_child_even.astype(f32)[:, None],
        flat.tex_child_odd.astype(f32)[:, None],
        is_noi[:, None]], axis=1)                              # (NT, 14)

    # per-prim resolved material+texture row for the scan-mode kernel: TPU
    # vector units cannot gather by per-lane index, so scan mode reads one
    # fully-resolved scalar row per prim instead of indexing three tables.
    # Medium (isotropic phase) rows are appended after the quads so the
    # scan-mode medium override can gather row S+Q+m. Cols 15-17 carry the
    # texture ROW IDS (own / checker-even child / checker-odd child) so the
    # scan-mode grad_tex kernel can route d(attenuation)/d(tex_color) to the
    # owning table row (the scan analogue of texture_color's eff output).
    def resolved_rows(mt):
        return jnp.concatenate([
            flat.mat_type[mt].astype(f32)[:, None],            # 0 type
            flat.mat_fuzz[mt][:, None],                        # 1 fuzz
            flat.mat_ior[mt][:, None],                         # 2 ior
            is_chk[flat.mat_tex[mt]][:, None],                 # 3 is_checker
            flat.tex_scale[flat.mat_tex[mt]][:, None],         # 4 scale
            flat.tex_color[flat.mat_tex[mt]],                  # 5-7 color
            even_c[flat.mat_tex[mt]],                          # 8-10 even
            odd_c[flat.mat_tex[mt]],                           # 11-13 odd
            is_noi[flat.mat_tex[mt]][:, None],                 # 14 is_noise
            flat.mat_tex[mt].astype(f32)[:, None],             # 15 tex row
            flat.tex_child_even[flat.mat_tex[mt]]
                .astype(f32)[:, None],                         # 16 even row
            flat.tex_child_odd[flat.mat_tex[mt]]
                .astype(f32)[:, None],                         # 17 odd row
            mt.astype(f32)[:, None],                           # 18 mat row
        ], axis=1)
    primmatf = jnp.concatenate(
        [resolved_rows(prim_mat), resolved_rows(flat.med_mat)])
    # (S+Q+M, PMCOLS)

    # constant-medium boundary rows (ConstantMedium.cpp:25-96): density,
    # active, MS sphere boundaries (4 cols each: center, radius), MQ quad
    # boundaries (each 17 cols: corner, u, v, normal, d, w, active),
    # isotropic material index
    mq = flat.med_quad_corner.shape[1]
    ms = flat.med_sph_center.shape[1]
    quad_cols = jnp.concatenate([
        flat.med_quad_corner, flat.med_quad_u, flat.med_quad_v,
        flat.med_quad_normal, flat.med_quad_d[..., None], flat.med_quad_w,
        flat.med_quad_active.astype(f32)[..., None],
    ], axis=2).reshape(flat.med_mat.shape[0], mq * 17)
    sph_cols = jnp.concatenate([
        flat.med_sph_center, flat.med_sph_radius[..., None],
    ], axis=2).reshape(flat.med_mat.shape[0], ms * 4)
    medf = jnp.concatenate([
        flat.med_neg_inv_density[:, None],                     # 0
        flat.med_active.astype(f32)[:, None],                  # 1
        sph_cols,                                              # 2..2+4*MS
        quad_cols,                                             # ..+17*MQ
        flat.med_mat.astype(f32)[:, None],                     # 2+4*MS+17*MQ
    ], axis=1)                                     # (M, 3+4*MS+17*MQ)
    return (sphf, quadf, prim_mat, lightf, mati, matf, texf, primmatf,
            medf)


# ------------------------------------------------------------- the kernel
def _make_kernel(*, S, Q, L, NM, NT, M, R, width, n_pix, n_strata, max_depth,
                 n_samples, sky_gradient, unroll_prims,
                 grad_tex=False, bvh_mode=False, has_noise=False,
                 MQ=6, MS=1, tex_struct=None, hard_slots=(), light_src=(),
                 want_tex=True, lane_mode=False, vscan_mode=False, C_v=1,
                 C_vg=1, vscan_big=0, vscan_motion=True, vscan_stat=0,
                 vscan_big_motion=True,
                 C_n=1, C_p=1, B_n=1,
                 P_n=1, cap=0, resume=False, NT_g=None,
                 lane_gather="take", deep_tex=False, C_t=1,
                 checker_depth=1, vquad_mode=False, C_q=1, C_qg=1,
                 grad_adjoint=False, NM_g=None, adj_seg=0,
                 vscan_cull="cond"):
    """grad_tex=True builds the fused forward+backward variant: alongside the
    radiance image it accumulates d<g, radiance>/d(theta) for trainable scene
    parameters by exact forward-mode differentiation, in two tiers:

      - tex_color (albedo/emission/medium tint; want_tex=True): each lane
        carries weight planes W[t][c] = d(throughput_c)/d(tex_color[t][c])
        with the product-rule recurrence W <- W*at*f + th*f*1[eff_row==t] at
        every scatter (attenuation is channel-diagonal, so no cross-channel
        terms), dotted with the upstream cotangent g at every radiance event
        (miss background, emission). ~0.4x a forward pass on top.
      - "hard" scalar parameters (hard_slots: metal fuzz, dielectric IOR,
        sphere centers/radii) enter through scatter DIRECTIONS and
        intersection t(theta), so the cheap multiplicative recurrence does
        not apply. Instead the whole per-bounce continuous physics is
        factored into physics(theta, ray-state) and `jax.linearize`d once per
        bounce; each slot k then pushes its own tangent bundle
        (d origin, d direction, d throughput — 9 planes) through the shared
        linear map, accumulating d<g, radiance> at every radiance event.
        This is the reparameterized/detached-sampling derivative — discrete
        decisions (which prim won, Schlick reflect-vs-refract, light pick)
        are comparisons with zero tangent, exactly matching the pure-JAX
        replay backward's semantics (parallel/train.py).

    hard_slots entries: ("fuzz", m) | ("ior", m) | ("sphc", p, ax) |
    ("sphr", p). light_src[l] = source sphere index of MIS light row l (or
    -1): light rows bake copies of sphere geometry (_pack_tables), so their
    reads must alias the same theta scalars for gradients to flow through
    light pdf/sampling, as they do in the replay.

    This makes FULL-parameter training run at kernel speed instead of the
    ~1000x slower pure-JAX replay; the reference has no analogue (no autodiff
    in C++/CUDA). Unrolled-prim scenes only."""
    n_prims = S + Q
    K = len(hard_slots)
    if NT_g is None:
        NT_g = NT
    if grad_tex:
        # every mode supports the tex_color backward (weight planes or the
        # suffix estimator; eff row ids ride the resolved per-prim rows).
        # Hard-parameter tangent bundles need theta aliasing: static SMEM
        # reads in unrolled mode (sph_read/matf_read) or post-gather
        # winner overrides in vscan mode (closest_hit_vscan); the
        # stack/lane traversal kernels carry lax.while_loops that
        # jax.linearize cannot differentiate, so K > 0 gates there
        assert unroll_prims or vscan_mode or (want_tex and K == 0), \
            "stack/lane-BVH grad kernel: tex_color only"
        # capped/compacted scheduling works for the grad pass too (round
        # 5, VERDICT item 6): the Wp/Dst/suffix path state rides the spill
        # carry; Gp/dG/acc are accumulators summed across phases
    # O(1)-in-NT suffix-radiance backward for big texture tables (round-4,
    # VERDICT item 2): weight planes cost 6 VMEM planes PER texture row, so
    # beyond MAX_GRAD_TEXS the kernel switches to a two-phase in-lane
    # estimator — trace each path once to learn its total radiance T
    # (phase A), then re-trace the SAME sample (identical counter-RNG
    # streams) routing g·[emit·th + scatter·(T − P_after)/at] to each
    # event's texture row via a 128-row one-hot reduction into shared
    # per-tile accumulators (phase B). ~2.2x a forward pass, independent of
    # NT — this is what lets the 460-texture bouncing_spheres scene train
    # at kernel speed instead of the ~600x pure-JAX replay. Exactness
    # caveat: a channel whose albedo is exactly 0 reports a 0 gradient for
    # scatter events (the suffix (T−P) is 0 there; the true one-sided
    # derivative can be positive) — the weight-plane path stays exact and
    # is used whenever NT fits.
    grad_suffix = grad_tex and want_tex and NT_g > MAX_GRAD_TEXS
    n_wp = (3 * NT_g if (grad_tex and want_tex and not grad_suffix)
            else 0)
    NTc = -(-NT_g // 128) if grad_suffix else 0

    # ---- adjoint (reverse-mode) backward statics (round-5 VERDICT item 1):
    # always the vscan/vquad kernel path; chunked accumulator rows for
    # every trainable family at O(1) cost per parameter
    if NM_g is None:
        NM_g = NM
    if grad_adjoint:
        assert vscan_mode and not grad_tex and not cap and not resume, \
            "adjoint backward: vscan-mode single-pass only"
    Tc_a = -(-NT_g // 128) if grad_adjoint else 0
    Sc_a = -(-max(S, 1) // 128) if grad_adjoint else 0
    Mc_a = -(-max(NM_g, 1) // 128) if grad_adjoint else 0
    # sphere-light geometry reads become traced diff inputs so gradients
    # flow through MIS light pdf/sampling into the source sphere's rows
    adj_light_map = {}
    adj_light_slots = []          # [(light row, lightf col, sphere row)]
    if grad_adjoint:
        for l, si in enumerate(light_src):
            if si is not None and si >= 0:
                for col in (1, 2, 3, 7):
                    adj_light_map[(l, col)] = len(adj_light_slots)
                    adj_light_slots.append((l, col, si))

    # static map (table, row, col) -> theta slot index for the SMEM-read
    # helpers below; sphere-light rows alias their source sphere's slots
    theta_map = {}
    for k, slot in enumerate(hard_slots):
        if slot[0] == "fuzz":
            theta_map[("matf", slot[1], 0)] = k
        elif slot[0] == "ior":
            theta_map[("matf", slot[1], 1)] = k
        elif slot[0] == "sphc":
            theta_map[("sph", slot[1], slot[2])] = k
        elif slot[0] == "sphr":
            theta_map[("sph", slot[1], 6)] = k
        else:
            raise ValueError(slot)
    for l, si in enumerate(light_src):
        if si is None or si < 0:
            continue
        for ax in range(3):
            k = theta_map.get(("sph", si, ax))
            if k is not None:
                theta_map[("light", l, 1 + ax)] = k
        k = theta_map.get(("sph", si, 6))
        if k is not None:
            theta_map[("light", l, 7)] = k

    def kernel(pix_ref, fi_ref, fj_ref, *rest):
        stin_ref = stout_ref = None
        store_ref = None
        if grad_adjoint:
            (g_ref, iscal_ref, fscal_ref, sphf_ref, quadf_ref, pmat_ref,
             lightf_ref, mati_ref, matf_ref, texf_ref, primmat_ref, csph_ref,
             medf_ref, nodef_ref, nodei_ref, bprims_ref, ntab_ref,
             ptab_ref, pmtab_ref, vtex_ref, vqtab_ref, qptab_ref,
             qpmtab_ref, out_ref, dg_ref, stack_ref, store_ref) = rest
        elif grad_tex:
            if resume:
                stin_ref, rest = rest[0], rest[1:]
            (g_ref, iscal_ref, fscal_ref, sphf_ref, quadf_ref, pmat_ref,
             lightf_ref, mati_ref, matf_ref, texf_ref, primmat_ref, csph_ref,
             medf_ref, nodef_ref, nodei_ref, bprims_ref, ntab_ref,
             ptab_ref, pmtab_ref, vtex_ref, vqtab_ref, qptab_ref,
             qpmtab_ref) = rest[:23]
            if cap:
                out_ref, dg_ref, stout_ref, stack_ref = rest[23:]
            else:
                out_ref, dg_ref, stack_ref = rest[23:]
        else:
            if resume:
                stin_ref, rest = rest[0], rest[1:]
            (iscal_ref, fscal_ref, sphf_ref, quadf_ref, pmat_ref, lightf_ref,
             mati_ref, matf_ref, texf_ref, primmat_ref, csph_ref,
             medf_ref, nodef_ref, nodei_ref, bprims_ref, ntab_ref, ptab_ref,
             pmtab_ref, vtex_ref, vqtab_ref, qptab_ref,
             qpmtab_ref) = rest[:22]
            if cap:
                out_ref, stout_ref, stack_ref = rest[22:]
            else:
                out_ref, stack_ref = rest[22:]
        pix = pix_ref[:]                                     # (R,128) int32
        seed = iscal_ref[0].astype(jnp.uint32)
        sample_start_f = iscal_ref[1].astype(jnp.float32)
        pseed = iscal_ref[2].astype(jnp.uint32)              # hash-noise seed
        if grad_tex:
            # upstream cotangent d(loss)/d(pixel) planes (zero on pad lanes)
            cg_r, cg_g, cg_b = g_ref[0], g_ref[1], g_ref[2]

        fs = fscal_ref
        cx, cy, cz = fs[0], fs[1], fs[2]                     # camera center
        p0x, p0y, p0z = fs[3], fs[4], fs[5]                  # pixel00
        dux, duy, duz = fs[6], fs[7], fs[8]                  # pixel_du
        dvx, dvy, dvz = fs[9], fs[10], fs[11]                # pixel_dv
        fux, fuy, fuz = fs[12], fs[13], fs[14]               # defocus_u
        fvx, fvy, fvz = fs[15], fs[16], fs[17]               # defocus_v
        defocus_on = fs[18]
        bgx, bgy, bgz = fs[19], fs[20], fs[21]

        # counter-RNG key planes (rng.ray_keys semantics)
        k0 = pix.astype(jnp.uint32)
        k2 = jnp.broadcast_to(
            seed * jnp.uint32(_GOLDEN) + jnp.uint32(0x85EBCA6B), k0.shape)

        # pixel (i, j) planes precomputed on host (integer div/mod are not
        # vector ops on the VPU)
        i_f = fi_ref[:]
        j_f = fj_ref[:]

        # data-derived zero: a constant-splat zeros_like gets a replicated
        # Mosaic layout, which while_loop carries cannot relayout back into
        zero = i_f * 0.0
        izero = pix * 0

        def gather_fields(ref, C, nf, idx_pl):
            """Per-lane table lookups: out[f][lane] = table_f[idx[lane]]
            for all nf fields of a chunk-major (C*nfp, 128) VMEM table
            (_pack_lane_tables / _pack_vscan_tables layout). Shared by the
            lane-BVH traversal and the vscan winner re-derivation.

            Two statically-selected lowerings (RTX_LANE_GATHER):
              take (default) — one take_along_axis gather + select per
                128-entry chunk, on INT32 views (bit-exact by
                construction). Round 3's Mosaic faulted on this gather
                inside lax.while_loop on v5e; the round-4 toolchain lowers
                it correctly (re-verified against the oracle on hardware),
                so it is the default again — ~30x cheaper than onehot.
              onehot — a one-hot MXU matmul per chunk, fori_loop'd over
                chunks: one compare builds the chunk-masked indicator
                (idx == chunk_base + lane iota ≡ hi==c ∧ lo match), one
                8-aligned dynamic slice fetches the chunk's (nfp, 128)
                field block, one dot_general contracts lanes at
                Precision.HIGHEST. Exactly one indicator per row is
                nonzero across all chunks and every table value is a REAL
                f32, so value*1.0 accumulation is bit-exact; no
                vector-gather primitive is involved. Kept as the fallback
                lowering should a future toolchain regress the gather.
            """
            nfp = -(-nf // 8) * 8
            hi = jax.lax.shift_right_logical(idx_pl, 7)
            lo = idx_pl & 127
            if lane_gather == "onehot":
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (R, 128, 128), 2)

                def chunk(c, acc):
                    oh = ((idx_pl[:, :, None] == iota + c * 128)
                          .astype(jnp.float32).reshape(R * 128, 128))
                    blk = ref[pl.ds(c * nfp, nfp), :]      # (nfp, 128)
                    return acc + jax.lax.dot_general(
                        oh, blk, (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                res = jax.lax.fori_loop(
                    0, C, chunk,
                    jnp.zeros((R * 128, nfp), jnp.float32))
                res = res.reshape(R, 128, nfp)
                return [res[:, :, f] for f in range(nf)]
            outs = [izero] * nf
            for c in range(C):
                m = hi == c
                for f in range(nf):
                    row = ref[c * nfp + f:c * nfp + f + 1, :]  # (1, 128)
                    full = jax.lax.bitcast_convert_type(
                        row, jnp.int32) + izero
                    g = jnp.take_along_axis(full, lo, axis=1)
                    outs[f] = jnp.where(m, g, outs[f])
            return [jax.lax.bitcast_convert_type(o, jnp.float32)
                    for o in outs]

        # trainable "hard" scalars, read ONCE from SMEM so the per-bounce
        # physics can be jax.linearize'd with respect to them (grad path);
        # the read helpers below route every aliased table read (sphere
        # tables, material fuzz/ior columns, baked sphere-light rows) to the
        # same traced scalar
        theta = tuple(
            matf_ref[0, s[1]] if s[0] == "fuzz" else
            matf_ref[1, s[1]] if s[0] == "ior" else
            sphf_ref[s[2], s[1]] if s[0] == "sphc" else
            sphf_ref[6, s[1]]
            for s in hard_slots)

        def sph_read(th_, col, p):
            k = theta_map.get(("sph", p, col))
            return th_[k] if k is not None else sphf_ref[col, p]

        def matf_read(th_, col, m):
            k = theta_map.get(("matf", m, col))
            return th_[k] if k is not None else matf_ref[col, m]

        def light_read(th_, col, l):
            k = theta_map.get(("light", l, col))
            return th_[k] if k is not None else lightf_ref[col, l]

        # ----------------------------- closest hit over all prims (unrolled)
        def closest_hit(th_, ox, oy, oz, dx, dy, dz, tm):
            best_t = zero + BIG
            mat = jnp.zeros_like(pix)
            nx, ny, nz = zero, zero, zero                  # outward normal
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            for p in range(S):
                scx = sph_read(th_, 0, p) + tm * sphf_ref[3, p]
                scy = sph_read(th_, 1, p) + tm * sphf_ref[4, p]
                scz = sph_read(th_, 2, p) + tm * sphf_ref[5, p]
                rad = sph_read(th_, 6, p)
                ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
                h = _dot3(dx, dy, dz, ocx, ocy, ocz)
                c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
                disc = h * h - a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                r0 = (h - sq) * inv_a
                r1 = (h + sq) * inv_a
                in0 = (r0 > T_MIN) & (r0 < best_t)
                in1 = (r1 > T_MIN) & (r1 < best_t)
                t_p = jnp.where(in0, r0, r1)
                take = ((disc > 0.0) & (in0 | in1)
                        & (sphf_ref[7, p] > 0.5) & (rad > 0.0))
                inv_r = 1.0 / jnp.maximum(rad, 1e-12)
                hx = ox + t_p * dx
                hy = oy + t_p * dy
                hz = oz + t_p * dz
                best_t = jnp.where(take, t_p, best_t)
                mat = jnp.where(take, pmat_ref[p], mat)
                nx = jnp.where(take, (hx - scx) * inv_r, nx)
                ny = jnp.where(take, (hy - scy) * inv_r, ny)
                nz = jnp.where(take, (hz - scz) * inv_r, nz)
            for q in range(Q):
                qnx, qny, qnz = quadf_ref[9, q], quadf_ref[10, q], \
                    quadf_ref[11, q]
                denom = _dot3(dx, dy, dz, qnx, qny, qnz)
                par = jnp.abs(denom) < 1e-8
                t_q = (quadf_ref[12, q] - _dot3(ox, oy, oz, qnx, qny, qnz)) \
                    / jnp.where(par, 1.0, denom)
                hx = ox + t_q * dx - quadf_ref[0, q]
                hy = oy + t_q * dy - quadf_ref[1, q]
                hz = oz + t_q * dz - quadf_ref[2, q]
                uxq, uyq, uzq = quadf_ref[3, q], quadf_ref[4, q], \
                    quadf_ref[5, q]
                vxq, vyq, vzq = quadf_ref[6, q], quadf_ref[7, q], \
                    quadf_ref[8, q]
                wxq, wyq, wzq = quadf_ref[13, q], quadf_ref[14, q], \
                    quadf_ref[15, q]
                c1 = _cross3(hx, hy, hz, vxq, vyq, vzq)
                alpha = _dot3(wxq, wyq, wzq, *c1)
                c2 = _cross3(uxq, uyq, uzq, hx, hy, hz)
                beta = _dot3(wxq, wyq, wzq, *c2)
                take = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                        & (beta >= 0.0) & (beta <= 1.0)
                        & (t_q > T_MIN) & (t_q < best_t)
                        & (quadf_ref[17, q] > 0.5))
                best_t = jnp.where(take, t_q, best_t)
                mat = jnp.where(take, pmat_ref[S + q], mat)
                nx = jnp.where(take, qnx + zero, nx)
                ny = jnp.where(take, qny + zero, ny)
                nz = jnp.where(take, qnz + zero, nz)
            hit = best_t < BIG * 0.5
            t_safe = jnp.where(hit, best_t, 1.0)
            px = ox + t_safe * dx
            py = oy + t_safe * dy
            pz = oz + t_safe * dz
            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            return hit, best_t, px, py, pz, nx * sgn, ny * sgn, nz * sgn, \
                front, mat

        # ------------------- closest hit, scan mode (fori_loop over prims)
        def closest_hit_scan(ox, oy, oz, dx, dy, dz, tm, alive):
            """Shared-stack BVH variant (bvh_mode): leaf prims run fori_loop
            masked tests with dynamic scalar SMEM reads, gathering the
            winner's resolved material row (primmat_ref) inline — material
            parameters ride the intersection carry. The plain `elif S` fori
            fallback below is kept as a mode-free safety net (vscan is the
            round-4 default for all non-unrolled scenes)."""
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a

            def gather_mat(p, take, mats):
                return tuple(
                    jnp.where(take, primmat_ref[c, p], mats[c])
                    for c in range(PMCOLS))

            def sph_body(p, cr):
                best_t, nx, ny, nz, mats = cr
                scx = sphf_ref[0, p] + tm * sphf_ref[3, p]
                scy = sphf_ref[1, p] + tm * sphf_ref[4, p]
                scz = sphf_ref[2, p] + tm * sphf_ref[5, p]
                rad = sphf_ref[6, p]
                ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
                h = _dot3(dx, dy, dz, ocx, ocy, ocz)
                c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
                disc = h * h - a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                r0 = (h - sq) * inv_a
                r1 = (h + sq) * inv_a
                in0 = (r0 > T_MIN) & (r0 < best_t)
                in1 = (r1 > T_MIN) & (r1 < best_t)
                t_p = jnp.where(in0, r0, r1)
                take = ((disc > 0.0) & (in0 | in1)
                        & (sphf_ref[7, p] > 0.5) & (rad > 0.0))
                inv_r = 1.0 / jnp.maximum(rad, 1e-12)
                best_t = jnp.where(take, t_p, best_t)
                nx = jnp.where(take, (ox + t_p * dx - scx) * inv_r, nx)
                ny = jnp.where(take, (oy + t_p * dy - scy) * inv_r, ny)
                nz = jnp.where(take, (oz + t_p * dz - scz) * inv_r, nz)
                return best_t, nx, ny, nz, gather_mat(p, take, mats)

            def quad_body(q, cr):
                best_t, nx, ny, nz, mats = cr
                qnx, qny, qnz = quadf_ref[9, q], quadf_ref[10, q], \
                    quadf_ref[11, q]
                denom = _dot3(dx, dy, dz, qnx, qny, qnz)
                par = jnp.abs(denom) < 1e-8
                t_q = (quadf_ref[12, q]
                       - _dot3(ox, oy, oz, qnx, qny, qnz)) \
                    / jnp.where(par, 1.0, denom)
                hx = ox + t_q * dx - quadf_ref[0, q]
                hy = oy + t_q * dy - quadf_ref[1, q]
                hz = oz + t_q * dz - quadf_ref[2, q]
                c1 = _cross3(hx, hy, hz, quadf_ref[6, q], quadf_ref[7, q],
                             quadf_ref[8, q])
                alpha = _dot3(quadf_ref[13, q], quadf_ref[14, q],
                              quadf_ref[15, q], *c1)
                c2 = _cross3(quadf_ref[3, q], quadf_ref[4, q],
                             quadf_ref[5, q], hx, hy, hz)
                beta = _dot3(quadf_ref[13, q], quadf_ref[14, q],
                             quadf_ref[15, q], *c2)
                take = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                        & (beta >= 0.0) & (beta <= 1.0)
                        & (t_q > T_MIN) & (t_q < best_t)
                        & (quadf_ref[17, q] > 0.5))
                best_t = jnp.where(take, t_q, best_t)
                nx = jnp.where(take, qnx + zero, nx)
                ny = jnp.where(take, qny + zero, ny)
                nz = jnp.where(take, qnz + zero, nz)
                return best_t, nx, ny, nz, gather_mat(S + q, take, mats)

            mats0 = tuple(zero for _ in range(PMCOLS))
            cr = (zero + BIG, zero, zero, zero, mats0)
            if bvh_mode:
                # -------- shared-stack flat-BVH traversal (the TPU form of
                # the reference's hit_flattened, BVHNode.cpp:385-446): one
                # uniform SMEM stack per tile, descend into a node when ANY
                # live lane's ray hits its box (scalar reduce + lax.cond —
                # per-lane stacks are impossible without per-lane gather),
                # near-child-first by the tile's mean ray direction on the
                # node's split axis. Leaves run the per-prim masked tests
                # with dynamic SMEM reads in bvh_prims leaf order.
                eps = 1e-12
                idx = 1.0 / jnp.where(jnp.abs(dx) < eps,
                                      jnp.where(dx < 0, -eps, eps), dx)
                idy = 1.0 / jnp.where(jnp.abs(dy) < eps,
                                      jnp.where(dy < 0, -eps, eps), dy)
                idz = 1.0 / jnp.where(jnp.abs(dz) < eps,
                                      jnp.where(dz < 0, -eps, eps), dz)
                mdx = jnp.sum(jnp.where(alive, dx, 0.0))
                mdy = jnp.sum(jnp.where(alive, dy, 0.0))
                mdz = jnp.sum(jnp.where(alive, dz, 0.0))

                # leaves are segregated spheres-first (ops.bvh
                # _segregate_leaves) so each type runs a cond-free loop
                def sph_leaf(i, c):
                    return sph_body(bprims_ref[i], c)

                def quad_leaf(i, c):
                    return quad_body(bprims_ref[i] - S, c)

                def t_body(carry):
                    sp, c = carry
                    node = stack_ref[sp - 1]
                    sp = sp - 1
                    best_t = c[0]
                    t0x = (nodef_ref[0, node] - ox) * idx
                    t1x = (nodef_ref[3, node] - ox) * idx
                    t0y = (nodef_ref[1, node] - oy) * idy
                    t1y = (nodef_ref[4, node] - oy) * idy
                    t0z = (nodef_ref[2, node] - oz) * idz
                    t1z = (nodef_ref[5, node] - oz) * idz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), T_MIN))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), best_t))
                    want = alive & (tn <= tf)
                    any_hit = jnp.sum(jnp.where(want, 1.0, 0.0)) > 0.0
                    left = nodei_ref[0, node]
                    right = nodei_ref[1, node]
                    axis = nodei_ref[2, node]
                    is_leaf = nodei_ref[3, node] > 0

                    def when_hit(args):
                        sp, c = args

                        def do_leaf(args):
                            sp, c = args
                            nsph = nodei_ref[4, node]
                            if S:
                                c = jax.lax.fori_loop(
                                    left, left + nsph, sph_leaf, c)
                            if Q:
                                c = jax.lax.fori_loop(
                                    left + nsph, left + right, quad_leaf, c)
                            return sp, c

                        def do_inner(args):
                            sp, c = args
                            md = jnp.where(
                                axis == 0, mdx,
                                jnp.where(axis == 1, mdy, mdz))
                            near = jnp.where(md >= 0.0, left, right)
                            far = jnp.where(md >= 0.0, right, left)
                            stack_ref[sp] = far
                            stack_ref[sp + 1] = near   # popped first
                            return sp + 2, c

                        return jax.lax.cond(is_leaf, do_leaf, do_inner,
                                            (sp, c))

                    return jax.lax.cond(any_hit, when_hit, lambda a: a,
                                        (sp, c))

                stack_ref[0] = 0
                _, cr = jax.lax.while_loop(
                    lambda carry: carry[0] > 0, t_body,
                    (jnp.int32(1), cr))
            elif S:
                cr = jax.lax.fori_loop(0, S, sph_body, cr)
            if Q and not bvh_mode:       # the BVH covers quads too
                cr = jax.lax.fori_loop(0, Q, quad_body, cr)
            best_t, nx, ny, nz, mats = cr
            hit = best_t < BIG * 0.5
            t_safe = jnp.where(hit, best_t, 1.0)
            px = ox + t_safe * dx
            py = oy + t_safe * dy
            pz = oz + t_safe * dz
            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            return (hit, best_t, px, py, pz, nx * sgn, ny * sgn, nz * sgn,
                    front, mats)

        # ------- closest hit, vectorized prim-chunk scan (round-4 default
        # for every non-unrolled scene; tables in _pack_vscan_tables)
        def vscan_select(ox0, oy0, oz0, dx0, dy0, dz0, tm0, alive):
            """Winner SELECTION for the vectorized prim-chunk scan: one
            Morton chunk of 128 prims is tested against the whole tile as
            (128 prims, 128 rays) outer-product vector ops per ray-row —
            prim fields broadcast from (128, 1) VMEM columns, ray fields
            from (1, 128) plane rows — so the VPU runs dense 16-vreg ops
            and the scalar core only issues the chunk loop plus one
            whole-tile AABB cull per chunk (the flat TPU stand-in for the
            reference's per-ray BVH descent, BVHNode.cpp:385-446). The
            running winner is a bitcast int32 key
            [t bits & ~127 | 7-bit chunk-local prim id] reduced over the
            prim (sublane) axis: positive-f32 bit patterns order like the
            floats, so int-min == float-min, and the id steals the low
            mantissa bits (~2^-17 relative selection fuzz between
            near-coincident surfaces; the winner's record is re-derived
            EXACTLY in vscan_record). Quads beyond MAX_QUADS_VSCAN get
            their own chunk tables here (vquad); smaller quad counts run a
            per-quad masked loop in vscan_record instead.
            Returns (sphere hit, sphere pid, quad hit, quad pid)."""
            # the chunk/cull phase (winner SELECTION) is discrete: run it on
            # stop_gradient'd ray state so jax.linearize (hard-slot tangent
            # bundles) never differentiates through the bitcast winner keys
            # — detached-sampling semantics, exactly like the unrolled
            # kernel's zero-tangent comparisons. The winner's t/normal are
            # RE-DERIVED below from live values, which is where tangents
            # flow (through the theta-aliased gathers).
            sg = jax.lax.stop_gradient
            ox, oy, oz = sg(ox0), sg(oy0), sg(oz0)
            dx, dy, dz = sg(dx0), sg(dy0), sg(dz0)
            tm = sg(tm0)
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            eps = 1e-12
            idx = 1.0 / jnp.where(jnp.abs(dx) < eps,
                                  jnp.where(dx < 0, -eps, eps), dx)
            idy = 1.0 / jnp.where(jnp.abs(dy) < eps,
                                  jnp.where(dy < 0, -eps, eps), dy)
            idz = 1.0 / jnp.where(jnp.abs(dz) < eps,
                                  jnp.where(dz < 0, -eps, eps), dz)
            C_small = C_v - 1 if vscan_big else C_v
            pid_col = jax.lax.broadcasted_iota(jnp.int32, (VCHUNK, 1), 0)
            pid_big = jax.lax.broadcasted_iota(
                jnp.int32, (max(vscan_big, 1), 1), 0)

            def chunk_cols(blk):
                return (blk[:, 0:1], blk[:, 1:2], blk[:, 2:3], blk[:, 3:4],
                        blk[:, 4:5], blk[:, 5:6], blk[:, 6:7])

            def test_rows(cols, pid0, motion):
                """(n prims, 128 rays) outer-product sphere tests, one
                ray-row at a time; returns the block's min winner keys
                (R, 128). Prim fields broadcast from (n, 1) columns of the
                VMEM block, ray fields from (1, 128) plane row slices.
                `motion` is static: whole-static chunks (the packer sorts
                statics first, boundary C_stat) skip the 6 motion ops.
                Invalid/pad prims carry r2m = -BIG in col 6, so (disc > 0)
                rejects them without a dedicated valid compare."""
                cxp, cyp, czp, cdx_, cdy_, cdz_, r2p = cols
                out = []
                for s in range(R):
                    sl = slice(s, s + 1)
                    if motion:
                        scx = cxp + tm[sl] * cdx_
                        scy = cyp + tm[sl] * cdy_
                        scz = czp + tm[sl] * cdz_
                    else:
                        scx, scy, scz = cxp, cyp, czp
                    ocx = scx - ox[sl]
                    ocy = scy - oy[sl]
                    ocz = scz - oz[sl]
                    h = dx[sl] * ocx + dy[sl] * ocy + dz[sl] * ocz
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - r2p
                    disc = h * h - a[sl] * cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    r0 = (h - sq) * inv_a[sl]
                    r1 = (h + sq) * inv_a[sl]
                    # nearest admissible root; no best_t term needed — the
                    # key min performs the same rejection exactly
                    t_p = jnp.where(r0 > T_MIN, r0, r1)
                    take = (disc > 0.0) & (t_p > T_MIN)
                    tt = jnp.where(take, t_p, BIG)
                    key = (jax.lax.bitcast_convert_type(tt, jnp.int32)
                           & ~127) | pid0
                    out.append(jnp.min(key, axis=0, keepdims=True))
                return jnp.concatenate(out, axis=0)            # (R, 128)

            def box_any(k, best_key):
                """Whole-tile cull: does ANY live lane's ray hit chunk k's
                AABB before its current best t (key bitcast back ≈ t)?
                One scalar branch per chunk per bounce — per-row branching
                was measured ~2K cycles per lax.cond on v5e, wiping out
                its finer culling."""
                best_t = jax.lax.bitcast_convert_type(best_key, jnp.float32)
                t0x = (csph_ref[0, k] - ox) * idx
                t1x = (csph_ref[3, k] - ox) * idx
                t0y = (csph_ref[1, k] - oy) * idy
                t1y = (csph_ref[4, k] - oy) * idy
                t0z = (csph_ref[2, k] - oz) * idz
                t1z = (csph_ref[5, k] - oz) * idz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), T_MIN))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best_t))
                want = alive & (tn <= tf)
                return jnp.sum(jnp.where(want, 1.0, 0.0)) > 0.0

            def chunk_hits(c, cr, motion):
                bk, bc = cr
                blk = ntab_ref[pl.ds(c * VCHUNK, VCHUNK), :]   # (128, 8)
                ck = test_rows(chunk_cols(blk), pid_col, motion)
                better = ck < bk
                return (jnp.where(better, ck, bk),
                        jnp.where(better, c + izero, bc))

            def chunk_body_static(c, cr):
                if vscan_cull == "none":
                    return chunk_hits(c, cr, False)
                return jax.lax.cond(box_any(c, cr[0]),
                                    lambda cr_: chunk_hits(c, cr_, False),
                                    lambda cr_: cr_, cr)

            def chunk_body_moving(c, cr):
                if vscan_cull == "none":
                    return chunk_hits(c, cr, vscan_motion)
                return jax.lax.cond(box_any(c, cr[0]),
                                    lambda cr_: chunk_hits(
                                        c, cr_, vscan_motion),
                                    lambda cr_: cr_, cr)

            # leading whole-static chunks (packer boundary C_stat) run the
            # motion-free test even in mixed static/moving scenes
            cr0 = (izero + _BIG_KEY, izero)
            C_stat_k = C_small if not vscan_motion else min(vscan_stat,
                                                            C_small)
            cr0 = jax.lax.fori_loop(0, C_stat_k, chunk_body_static, cr0)
            best_key, best_chunk = jax.lax.fori_loop(
                C_stat_k, C_small, chunk_body_moving, cr0)
            if vscan_big:
                # the big-prim block: tested unconditionally as a cheap
                # (8, 128) strip — no box could cull a ground-sized sphere
                # anyway, and excluding the giants keeps every Morton
                # chunk's AABB tight enough to cull
                blk = ntab_ref[pl.ds(C_small * VCHUNK, vscan_big), :]
                ck = test_rows(chunk_cols(blk), pid_big, vscan_big_motion)
                better = ck < best_key
                best_key = jnp.where(better, ck, best_key)
                best_chunk = jnp.where(better, C_small + izero, best_chunk)

            hit = best_key < _BIG_KEY
            pid = jnp.where(hit, best_chunk * VCHUNK + (best_key & 127), 0)
            if not vquad_mode:
                return hit, pid, hit, pid

            # ---- quad chunks (Q > MAX_QUADS_VSCAN): the same
            # outer-product/cull/winner-key pattern over the vqtab table;
            # chunk boxes follow the sphere boxes in csph (cols C_v..)
            def qtest_rows(blk):
                nxp, nyp, nzp = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                dp = blk[:, 3:4]
                cxp, cyp, czp = blk[:, 4:5], blk[:, 5:6], blk[:, 6:7]
                uxp, uyp, uzp = blk[:, 7:8], blk[:, 8:9], blk[:, 9:10]
                vxp, vyp, vzp = blk[:, 10:11], blk[:, 11:12], blk[:, 12:13]
                wxp, wyp, wzp = blk[:, 13:14], blk[:, 14:15], blk[:, 15:16]
                actp = blk[:, 16:17] > 0.5
                out = []
                for s in range(R):
                    sl = slice(s, s + 1)
                    denom = (dx[sl] * nxp + dy[sl] * nyp + dz[sl] * nzp)
                    par = jnp.abs(denom) < 1e-8
                    t_q = (dp - (ox[sl] * nxp + oy[sl] * nyp
                                 + oz[sl] * nzp)) \
                        / jnp.where(par, 1.0, denom)
                    hx = ox[sl] + t_q * dx[sl] - cxp
                    hy = oy[sl] + t_q * dy[sl] - cyp
                    hz = oz[sl] + t_q * dz[sl] - czp
                    c1x = hy * vzp - hz * vyp
                    c1y = hz * vxp - hx * vzp
                    c1z = hx * vyp - hy * vxp
                    alpha = wxp * c1x + wyp * c1y + wzp * c1z
                    c2x = uyp * hz - uzp * hy
                    c2y = uzp * hx - uxp * hz
                    c2z = uxp * hy - uyp * hx
                    beta = wxp * c2x + wyp * c2y + wzp * c2z
                    take = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                            & (beta >= 0.0) & (beta <= 1.0)
                            & (t_q > T_MIN) & actp)
                    tt = jnp.where(take, t_q, BIG)
                    key = (jax.lax.bitcast_convert_type(tt, jnp.int32)
                           & ~127) | pid_col
                    out.append(jnp.min(key, axis=0, keepdims=True))
                return jnp.concatenate(out, axis=0)

            def qbox_any(k, best_key_):
                best_t = jax.lax.bitcast_convert_type(best_key_,
                                                      jnp.float32)
                t0x = (csph_ref[0, C_v + k] - ox) * idx
                t1x = (csph_ref[3, C_v + k] - ox) * idx
                t0y = (csph_ref[1, C_v + k] - oy) * idy
                t1y = (csph_ref[4, C_v + k] - oy) * idy
                t0z = (csph_ref[2, C_v + k] - oz) * idz
                t1z = (csph_ref[5, C_v + k] - oz) * idz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), T_MIN))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best_t))
                want = alive & (tn <= tf)
                return jnp.sum(jnp.where(want, 1.0, 0.0)) > 0.0

            def qchunk_hits(c, cr):
                bk, bc = cr
                blk = vqtab_ref[pl.ds(c * VCHUNK, VCHUNK), :]
                ck = qtest_rows(blk)
                better = ck < bk
                return (jnp.where(better, ck, bk),
                        jnp.where(better, c + izero, bc))

            def qchunk_body(c, cr):
                return jax.lax.cond(qbox_any(c, cr[0]),
                                    lambda cr_: qchunk_hits(c, cr_),
                                    lambda cr_: cr_, cr)

            qbest_key, qbest_chunk = jax.lax.fori_loop(
                0, C_q, qchunk_body, (izero + _BIG_KEY, izero))
            qhit = qbest_key < _BIG_KEY
            qpid = jnp.where(qhit,
                             qbest_chunk * VCHUNK + (qbest_key & 127), 0)
            return hit, pid, qhit, qpid

        def vscan_record(th_, hit, pid, qhit, qpid, ox_, oy_, oz_, dx_,
                         dy_, dz_, tm0):
            """Differentiable half of the vscan closest hit: gathers the
            selected winner (pid from vscan_select, which runs OUTSIDE the
            linearized physics — its fori/cond/ref-read control flow has no
            JVP), applies hard-slot theta aliasing, and re-derives the
            exact t/normal/material record through LIVE ray state."""
            (cxw, cyw, czw, cdxw, cdyw, cdzw, _r2w, radw,
             origw) = gather_fields(ptab_ref, C_vg, 9, pid)
            # hard-slot theta aliasing (grad path; K slots, vscan): the
            # winner's gathered scalars are overridden by the SAME value
            # read as a traced theta scalar wherever a slot owns it —
            # compared against ORIGINAL sphere row ids (ptab col 8), since
            # pid is a Morton-permuted position — so linearize sees
            # d(gather)/d(theta) = 1[winner == slot prim]
            if K and vscan_mode:
                for kk, slot in enumerate(hard_slots):
                    if slot[0] == "sphc":
                        own = origw == float(slot[1])
                        if slot[2] == 0:
                            cxw = jnp.where(own, th_[kk] + zero, cxw)
                        elif slot[2] == 1:
                            cyw = jnp.where(own, th_[kk] + zero, cyw)
                        else:
                            czw = jnp.where(own, th_[kk] + zero, czw)
                    elif slot[0] == "sphr":
                        radw = jnp.where(origw == float(slot[1]),
                                         th_[kk] + zero, radw)
            a_ = _dot3(dx_, dy_, dz_, dx_, dy_, dz_)
            inv_a_ = 1.0 / a_
            if vscan_motion:
                scx = cxw + tm0 * cdxw
                scy = cyw + tm0 * cdyw
                scz = czw + tm0 * cdzw
            else:
                scx, scy, scz = cxw, cyw, czw
            ocx, ocy, ocz = scx - ox_, scy - oy_, scz - oz_
            h = _dot3(dx_, dy_, dz_, ocx, ocy, ocz)
            cc = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - radw * radw
            sq = jnp.sqrt(jnp.maximum(h * h - a_ * cc, 0.0))
            r0 = (h - sq) * inv_a_
            r1 = (h + sq) * inv_a_
            tw = jnp.where(r0 > T_MIN, r0, r1)          # exact winner t
            best_t = jnp.where(hit, tw, zero + BIG)
            t_safe = jnp.where(hit, tw, 1.0)
            inv_r = 1.0 / jnp.maximum(radw, 1e-12)
            nx = jnp.where(hit, (ox_ + t_safe * dx_ - scx) * inv_r, 0.0)
            ny = jnp.where(hit, (oy_ + t_safe * dy_ - scy) * inv_r, 0.0)
            nz = jnp.where(hit, (oz_ + t_safe * dz_ - scz) * inv_r, 0.0)
            mats = tuple(jnp.where(hit, mv, 0.0)
                         for mv in gather_fields(pmtab_ref, C_vg, PMCOLS,
                                                 pid))
            if Q and not vquad_mode:
                # quad rows: primmat quad rows start at 0 in vscan mode
                # (sphere rows moved to the VMEM gather tables)
                def quad_body_v(q, cr):
                    best_t, nx, ny, nz, mats = cr
                    qnx, qny, qnz = quadf_ref[9, q], quadf_ref[10, q], \
                        quadf_ref[11, q]
                    denom = _dot3(dx_, dy_, dz_, qnx, qny, qnz)
                    par = jnp.abs(denom) < 1e-8
                    t_q = (quadf_ref[12, q]
                           - _dot3(ox_, oy_, oz_, qnx, qny, qnz)) \
                        / jnp.where(par, 1.0, denom)
                    hx = ox_ + t_q * dx_ - quadf_ref[0, q]
                    hy = oy_ + t_q * dy_ - quadf_ref[1, q]
                    hz = oz_ + t_q * dz_ - quadf_ref[2, q]
                    c1 = _cross3(hx, hy, hz, quadf_ref[6, q],
                                 quadf_ref[7, q], quadf_ref[8, q])
                    alpha = _dot3(quadf_ref[13, q], quadf_ref[14, q],
                                  quadf_ref[15, q], *c1)
                    c2 = _cross3(quadf_ref[3, q], quadf_ref[4, q],
                                 quadf_ref[5, q], hx, hy, hz)
                    beta = _dot3(quadf_ref[13, q], quadf_ref[14, q],
                                 quadf_ref[15, q], *c2)
                    take = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                            & (beta >= 0.0) & (beta <= 1.0)
                            & (t_q > T_MIN) & (t_q < best_t)
                            & (quadf_ref[17, q] > 0.5))
                    best_t = jnp.where(take, t_q, best_t)
                    nx = jnp.where(take, qnx + zero, nx)
                    ny = jnp.where(take, qny + zero, ny)
                    nz = jnp.where(take, qnz + zero, nz)
                    mats = tuple(
                        jnp.where(take, primmat_ref[ci, q], mats[ci])
                        for ci in range(PMCOLS))
                    return best_t, nx, ny, nz, mats

                if K:
                    # linearized path: unroll (fori/scan with ref reads
                    # has no JVP partial-eval); Q <= MAX_QUADS_VSCAN
                    cr_q = (best_t, nx, ny, nz, mats)
                    for q in range(Q):
                        cr_q = quad_body_v(q, cr_q)
                    best_t, nx, ny, nz, mats = cr_q
                else:
                    best_t, nx, ny, nz, mats = jax.lax.fori_loop(
                        0, Q, quad_body_v, (best_t, nx, ny, nz, mats))
                hit = best_t < BIG * 0.5
                t_safe = jnp.where(hit, best_t, 1.0)
            if vquad_mode:
                # merge the selected quad winner: validity was decided at
                # selection; only the plane-equation t is re-derived (it
                # needs just the normal + offset, and must be EXACT for
                # the cross-class comparison against the sphere winner)
                qnx, qny, qnz, qd = gather_fields(qptab_ref, C_qg, 4,
                                                  qpid)
                denom = _dot3(dx_, dy_, dz_, qnx, qny, qnz)
                t_q = (qd - _dot3(ox_, oy_, oz_, qnx, qny, qnz)) \
                    / jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
                better = qhit & (t_q < best_t)
                best_t = jnp.where(better, t_q, best_t)
                nx = jnp.where(better, qnx + zero, nx)
                ny = jnp.where(better, qny + zero, ny)
                nz = jnp.where(better, qnz + zero, nz)
                qmats = gather_fields(qpmtab_ref, C_qg, PMCOLS, qpid)
                mats = tuple(jnp.where(better, qm, ms)
                             for qm, ms in zip(qmats, mats))
                hit = hit | better
                t_safe = jnp.where(hit, best_t, 1.0)
            if K and vscan_mode:
                # fuzz/IOR theta aliasing via the resolved row's mat id
                # (col 18), AFTER the quad loop so quad winners alias too
                mats = list(mats)
                for kk, slot in enumerate(hard_slots):
                    if slot[0] == "fuzz":
                        mats[1] = jnp.where(mats[18] == float(slot[1]),
                                            th_[kk] + zero, mats[1])
                    elif slot[0] == "ior":
                        mats[2] = jnp.where(mats[18] == float(slot[1]),
                                            th_[kk] + zero, mats[2])
                mats = tuple(mats)
            px = ox_ + t_safe * dx_
            py = oy_ + t_safe * dy_
            pz = oz_ + t_safe * dz_
            front = _dot3(dx_, dy_, dz_, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            return (hit, best_t, px, py, pz, nx * sgn, ny * sgn, nz * sgn,
                    front, mats)

        # --------- closest hit, per-lane stackless skip-link BVH traversal
        def closest_hit_lane(ox, oy, oz, dx, dy, dz, tm, alive):
            """Every lane walks its OWN pointer chain through the skip-link
            BVH (ops.bvh._skip_links) — no shared stack, no whole-tile
            any-lane descent, per-lane best_t tightening — using Mosaic's
            128-lane dynamic gathers for node/prim fetches (chunked over
            ceil(N/128) register rows; see _pack_lane_tables). Leaf prims
            drain one per step through a pending (off, cnt) pair so a step's
            vector cost is one node fetch + one prim fetch regardless of
            divergence. This is the TPU-native answer to the reference's
            per-thread flattened traversal (BVHNode.cpp:385-446)."""
            eps = 1e-12
            idx = 1.0 / jnp.where(jnp.abs(dx) < eps,
                                  jnp.where(dx < 0, -eps, eps), dx)
            idy = 1.0 / jnp.where(jnp.abs(dy) < eps,
                                  jnp.where(dy < 0, -eps, eps), dy)
            idz = 1.0 / jnp.where(jnp.abs(dz) < eps,
                                  jnp.where(dz < 0, -eps, eps), dz)
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a

            END = B_n
            node0 = jnp.where(alive, izero, izero + END)
            st0 = (node0, izero, izero, zero + BIG, izero - 1)

            def step(st):
                node, poff, pcnt, best_t, win = st
                trav = (node < END) & (pcnt == 0)
                nidx = jnp.minimum(node, END - 1)
                (x0, x1, y0, y1, z0, z1, missf, hoff, cntf) = gather_fields(
                    ntab_ref, C_n, NODE_FIELDS, nidx)
                miss_l = missf.astype(jnp.int32)
                hof = hoff.astype(jnp.int32)
                cnt = cntf.astype(jnp.int32)
                t0x = (x0 - ox) * idx
                t1x = (x1 - ox) * idx
                t0y = (y0 - oy) * idy
                t1y = (y1 - oy) * idy
                t0z = (z0 - oz) * idz
                t1z = (z1 - oz) * idz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), T_MIN))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best_t))
                hitbox = trav & (tn <= tf)
                is_leaf = cnt > 0
                take_leaf = hitbox & is_leaf
                poff = jnp.where(take_leaf, hof, poff)
                pcnt = jnp.where(take_leaf, cnt, pcnt)
                node = jnp.where(trav,
                                 jnp.where(hitbox & ~is_leaf, hof, miss_l),
                                 node)

                # one pending prim test per step (whole-tile skip when no
                # lane holds pending prims)
                def prim_test(args):
                    poff, pcnt, best_t, win = args
                    do_p = pcnt > 0
                    pidx = jnp.minimum(poff, P_n - 1)
                    (scx0, scy0, scz0, cdx, cdy, cdz,
                     rad) = gather_fields(ptab_ref, C_p, 7, pidx)
                    scx = scx0 + tm * cdx
                    scy = scy0 + tm * cdy
                    scz = scz0 + tm * cdz
                    ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
                    h = _dot3(dx, dy, dz, ocx, ocy, ocz)
                    c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
                    disc = h * h - a * c
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    r0 = (h - sq) * inv_a
                    r1 = (h + sq) * inv_a
                    in0 = (r0 > T_MIN) & (r0 < best_t)
                    in1 = (r1 > T_MIN) & (r1 < best_t)
                    t_p = jnp.where(in0, r0, r1)
                    take = (do_p & (disc > 0.0) & (in0 | in1)
                            & (rad > 0.0))
                    best_t = jnp.where(take, t_p, best_t)
                    win = jnp.where(take, pidx, win)
                    dpi = do_p.astype(jnp.int32)
                    return poff + dpi, pcnt - dpi, best_t, win

                any_p = jnp.sum(jnp.where(pcnt > 0, 1.0, 0.0)) > 0.0
                poff, pcnt, best_t, win = jax.lax.cond(
                    any_p, prim_test, lambda x: x,
                    (poff, pcnt, best_t, win))
                return node, poff, pcnt, best_t, win

            def w_cond(st):
                node, poff, pcnt, best_t, win = st
                act = (node < END) | (pcnt > 0)
                return jnp.sum(jnp.where(act, 1.0, 0.0)) > 0.0

            node, poff, pcnt, best_t, win = jax.lax.while_loop(
                w_cond, step, st0)

            hit = win >= 0
            widx = jnp.maximum(win, 0)
            (scx0, scy0, scz0, cdx, cdy, cdz, rad) = gather_fields(
                ptab_ref, C_p, 7, widx)
            scx = scx0 + tm * cdx
            scy = scy0 + tm * cdy
            scz = scz0 + tm * cdz
            t_safe = jnp.where(hit, best_t, 1.0)
            px = ox + t_safe * dx
            py = oy + t_safe * dy
            pz = oz + t_safe * dz
            inv_r = 1.0 / jnp.maximum(rad, 1e-12)
            nx = (px - scx) * inv_r
            ny = (py - scy) * inv_r
            nz = (pz - scz) * inv_r
            mats = tuple(gather_fields(pmtab_ref, C_p, PMCOLS, widx))
            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            return (hit, best_t, px, py, pz, nx * sgn, ny * sgn, nz * sgn,
                    front, mats)

        # --------------------- checker/solid color from resolved tex planes
        def tex_eval_planes(is_chk_f, scale, cr, cg, cb, er, eg, eb,
                            o_r, o_g, o_b, is_noi_f, row_own, row_even,
                            row_odd, px, py, pz, turb):
            """Color planes + the EFFECTIVE texture row id (the row whose
            tex_color the result reads: parity-selected checker child, the
            row itself for solids, -1 for noise) — scan/BVH/lane-mode
            analogue of texture_color's eff output for grad routing."""
            inv = 1.0 / jnp.maximum(scale, 1e-12)
            fx = jnp.floor(inv * px).astype(jnp.int32)
            fy = jnp.floor(inv * py).astype(jnp.int32)
            fz = jnp.floor(inv * pz).astype(jnp.int32)
            even = ((fx + fy + fz) & 1) == 0
            chk = is_chk_f > 0.5
            tr = jnp.where(chk, jnp.where(even, er, o_r), cr)
            tg = jnp.where(chk, jnp.where(even, eg, o_g), cg)
            tb = jnp.where(chk, jnp.where(even, eb, o_b), cb)
            eff = jnp.where(chk, jnp.where(even, row_even, row_odd), row_own)
            if turb is not None:
                # marble: grayscale 0.5*(1+sin(scale*z + 10*turb))
                # (NoiseTexture.cpp:8-33); turb is row-independent
                marble = 0.5 * (1.0 + jnp.sin(scale * pz + 10.0 * turb))
                noi = is_noi_f > 0.5
                tr = jnp.where(noi, marble, tr)
                tg = jnp.where(noi, marble, tg)
                tb = jnp.where(noi, marble, tb)
                eff = jnp.where(noi, -1.0, eff)
            return tr, tg, tb, eff

        def tex_eval_dag(row0, px, py, pz, turb, full=False):
            """Arbitrary-depth checker DAGs for the non-unrolled modes
            (round-4, VERDICT item 7): descend the texture table per lane
            via chunked gathers over the vtex VMEM table (fields [cr cg cb
            scale is_chk is_noi even odd]), each level selecting its child
            by that level's own parity plane (CheckerTexture.cpp:14-55
            recursive children). The loop is static over the scene's
            checker_depth; the final gather reads the leaf color, and the
            leaf row id is the grad path's eff row exactly like
            texture_color's static recursion."""
            row = row0.astype(jnp.int32)
            for _ in range(checker_depth):
                (_, _, _, scale, is_chk, _, ev, od) = gather_fields(
                    vtex_ref, C_t, 8, row)
                inv = 1.0 / jnp.maximum(scale, 1e-12)
                fx = jnp.floor(inv * px).astype(jnp.int32)
                fy = jnp.floor(inv * py).astype(jnp.int32)
                fz = jnp.floor(inv * pz).astype(jnp.int32)
                even = ((fx + fy + fz) & 1) == 0
                nxt = jnp.where(even, ev, od).astype(jnp.int32)
                row = jnp.where(is_chk > 0.5, nxt, row)
            (cr, cg, cb, scale, _, is_noi, _, _) = gather_fields(
                vtex_ref, C_t, 8, row)
            eff = row.astype(jnp.float32)
            if turb is not None:
                marble = 0.5 * (1.0 + jnp.sin(scale * pz + 10.0 * turb))
                noi = is_noi > 0.5
                cr = jnp.where(noi, marble, cr)
                cg = jnp.where(noi, marble, cg)
                cb = jnp.where(noi, marble, cb)
                eff = jnp.where(noi, -1.0, eff)
            if full:
                # adjoint ctx wants the RAW leaf fields (marble is applied
                # on the differentiated side from the leaf scale/noi flags)
                return cr, cg, cb, eff, scale, is_noi
            return cr, cg, cb, eff

        # ----------------------------- texture color at (point, tex index)
        def texture_color(tex, px, py, pz, turb):
            """Color planes; with grad_tex also the *effective* texture row
            so gradients route to the owning tex_color row.

            The texture DAG structure (tex_struct: type/even/odd per row) is
            a bake-time constant, so rows evaluate by STATIC recursion —
            checker children may themselves be checkers or noise to any
            depth (CheckerTexture.cpp:14-55 recursive textures), each level
            selecting per lane by its own parity plane. Colors/scales stay
            runtime SMEM reads (tex_color is trainable). Noise leaves
            evaluate hash-noise marble in-kernel and carry no tex_color
            dependence (eff = -1); shared subtrees memoize."""
            cache = {}

            def eval_row(t):
                if t in cache:
                    return cache[t]
                ttype, ev, od = tex_struct[t]
                if ttype == TEX_NOISE and turb is not None:
                    marble = 0.5 * (1.0 + jnp.sin(
                        texf_ref[3, t] * pz + 10.0 * turb))
                    out = (marble, marble, marble, zero - 1.0)
                elif ttype == TEX_CHECKER:
                    inv = 1.0 / jnp.maximum(texf_ref[3, t], 1e-12)
                    fx = jnp.floor(inv * px).astype(jnp.int32)
                    fy = jnp.floor(inv * py).astype(jnp.int32)
                    fz = jnp.floor(inv * pz).astype(jnp.int32)
                    # parity via bit-and (int % is not a VPU op; two's
                    # complement &1 gives the same answer for negatives)
                    even = ((fx + fy + fz) & 1) == 0
                    er, eg, eb, ee = eval_row(ev)
                    orr, og, ob, oe = eval_row(od)
                    out = (jnp.where(even, er, orr),
                           jnp.where(even, eg, og),
                           jnp.where(even, eb, ob),
                           jnp.where(even, ee, oe))
                else:           # solid (or noise in a noise-free build)
                    out = (texf_ref[0, t] + zero, texf_ref[1, t] + zero,
                           texf_ref[2, t] + zero, zero + float(t))
                cache[t] = out
                return out

            rr, gg, bb = zero, zero, zero
            eff = zero - 1.0
            for t in range(NT):
                cr, cg, cb, ce = eval_row(t)
                m = tex == t
                rr = jnp.where(m, cr, rr)
                gg = jnp.where(m, cg, gg)
                bb = jnp.where(m, cb, bb)
                if grad_tex:
                    eff = jnp.where(m, ce, eff)
            return rr, gg, bb, eff

        # ----------------------------- light pdf / sample (unrolled over L)
        def light_pdf(th_, ox, oy, oz, dx, dy, dz, tm, lread=None):
            """Uniform-average solid-angle pdf (lights.light_pdf_value).
            lread overrides the theta-aliased SMEM read (the adjoint pass
            substitutes traced diff inputs for sphere-light geometry)."""
            if lread is None:
                lread = light_read
            total = zero
            for l in range(L):
                is_s = lightf_ref[0, l] > 0.5
                # sphere: hit test + cone solid angle (Sphere.cpp:145-158)
                scx = lread(th_, 1, l) + tm * lightf_ref[4, l]
                scy = lread(th_, 2, l) + tm * lightf_ref[5, l]
                scz = lread(th_, 3, l) + tm * lightf_ref[6, l]
                rad = lread(th_, 7, l)
                ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
                a = _dot3(dx, dy, dz, dx, dy, dz)
                h = _dot3(dx, dy, dz, ocx, ocy, ocz)
                c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
                disc = h * h - a * c
                sq = _sqrt0(disc)
                r0 = (h - sq) / a
                r1 = (h + sq) / a
                hit_s = ((disc > 0.0) & (rad > 0.0)
                         & ((r0 > T_MIN) | (r1 > T_MIN)))
                dist2 = _dot3(ocx, ocy, ocz, ocx, ocy, ocz)
                ratio = jnp.clip(1.0 - rad * rad
                                 / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
                cos_max = jnp.sqrt(jnp.maximum(ratio, 1e-12))
                solid = 2.0 * math.pi * (1.0 - cos_max)
                pdf_s = jnp.where(hit_s,
                                  1.0 / jnp.maximum(solid, 1e-12), 0.0)
                # quad: hit test + dist^2/(cos*area) (Plane.cpp:115-126)
                qnx, qny, qnz = lightf_ref[17, l], lightf_ref[18, l], \
                    lightf_ref[19, l]
                denom = _dot3(dx, dy, dz, qnx, qny, qnz)
                par = jnp.abs(denom) < 1e-8
                t_q = (lightf_ref[20, l]
                       - _dot3(ox, oy, oz, qnx, qny, qnz)) \
                    / jnp.where(par, 1.0, denom)
                hx = ox + t_q * dx - lightf_ref[8, l]
                hy = oy + t_q * dy - lightf_ref[9, l]
                hz = oz + t_q * dz - lightf_ref[10, l]
                wxq, wyq, wzq = lightf_ref[21, l], lightf_ref[22, l], \
                    lightf_ref[23, l]
                c1 = _cross3(hx, hy, hz, lightf_ref[14, l],
                             lightf_ref[15, l], lightf_ref[16, l])
                alpha = _dot3(wxq, wyq, wzq, *c1)
                c2 = _cross3(lightf_ref[11, l], lightf_ref[12, l],
                             lightf_ref[13, l], hx, hy, hz)
                beta = _dot3(wxq, wyq, wzq, *c2)
                hit_q = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                         & (beta >= 0.0) & (beta <= 1.0) & (t_q > T_MIN))
                cosine = jnp.abs(denom)   # dr unit
                pdf_q = jnp.where(
                    hit_q,
                    t_q * t_q / jnp.maximum(cosine * lightf_ref[24, l],
                                            1e-12),
                    0.0)
                total = total + jnp.where(is_s, pdf_s, pdf_q)
            return total / max(L, 1)

        def light_sample(th_, ox, oy, oz, tm, u_sel, u1, u2, lread=None):
            """Direction toward a uniformly chosen light (lights.light_sample)."""
            if lread is None:
                lread = light_read
            sel = jnp.clip((u_sel * L).astype(jnp.int32), 0, max(L - 1, 0))
            gx, gy, gz = zero, zero, zero
            for l in range(L):
                is_s = lightf_ref[0, l] > 0.5
                # sphere: cone sample via ONB toward center (Sphere.cpp:160-188)
                scx = lread(th_, 1, l) + tm * lightf_ref[4, l]
                scy = lread(th_, 2, l) + tm * lightf_ref[5, l]
                scz = lread(th_, 3, l) + tm * lightf_ref[6, l]
                rad = lread(th_, 7, l)
                tox, toy, toz = scx - ox, scy - oy, scz - oz
                dist2 = jnp.maximum(
                    _dot3(tox, toy, toz, tox, toy, toz), 1e-12)
                ratio = jnp.clip(1.0 - rad * rad / dist2, 0.0, 1.0)
                zc = 1.0 + u2 * (jnp.sqrt(jnp.maximum(ratio, 1e-12)) - 1.0)
                phi = (2.0 * math.pi) * u1
                sc = jnp.sqrt(jnp.maximum(1.0 - zc * zc, 1e-12))
                lx = jnp.cos(phi) * sc
                ly = jnp.sin(phi) * sc
                wx, wy, wz = _normalize3(tox, toy, toz)
                (ux, uy, uz), (vx, vy, vz), _ = _onb_from_w(wx, wy, wz)
                sxx = lx * ux + ly * vx + zc * wx
                syy = lx * uy + ly * vy + zc * wy
                szz = lx * uz + ly * vz + zc * wz
                # quad: uniform area point (Plane.cpp:128-133)
                qx = (lightf_ref[8, l] + u1 * lightf_ref[11, l]
                      + u2 * lightf_ref[14, l]) - ox
                qy = (lightf_ref[9, l] + u1 * lightf_ref[12, l]
                      + u2 * lightf_ref[15, l]) - oy
                qz = (lightf_ref[10, l] + u1 * lightf_ref[13, l]
                      + u2 * lightf_ref[16, l]) - oz
                m = sel == l
                gx = jnp.where(m, jnp.where(is_s, sxx, qx), gx)
                gy = jnp.where(m, jnp.where(is_s, syy, qy), gy)
                gz = jnp.where(m, jnp.where(is_s, szz, qz), gz)
            return _normalize3(gx, gy, gz)

        # --------------- constant-medium free flight (ops.intersect.
        # medium_scatter semantics; ConstantMedium.cpp:25-96): boundary
        # entry/exit over the full real line from the sphere's 2 roots + 6
        # quads, clamped to [T_MIN, t_surf], exponential hit distance, min
        # over mediums. Unrolled over M (<= MAX_MEDIUMS).
        def medium_free_flight(ox, oy, oz, dx, dy, dz, tm, t_surf, u_med):
            t_best = zero + BIG
            row_best = zero            # winning medium id (f32 plane)
            a = _dot3(dx, dy, dz, dx, dy, dz)
            raylen = jnp.sqrt(a)
            for m in range(M):
                ts = []
                for js in range(MS):
                    bs = 2 + 4 * js
                    scx, scy, scz = medf_ref[bs, m], medf_ref[bs + 1, m], \
                        medf_ref[bs + 2, m]
                    rad = medf_ref[bs + 3, m]
                    ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
                    h = _dot3(dx, dy, dz, ocx, ocy, ocz)
                    c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
                    disc = h * h - a * c
                    sq = _sqrt0(disc)
                    ok_s = (disc > 0.0) & (rad > 0.0)
                    ts += [jnp.where(ok_s, (h - sq) / a, BIG),
                           jnp.where(ok_s, (h + sq) / a, BIG)]
                for j in range(MQ):
                    b = 2 + 4 * MS + 17 * j
                    qnx, qny, qnz = medf_ref[b + 9, m], medf_ref[b + 10, m], \
                        medf_ref[b + 11, m]
                    denom = _dot3(dx, dy, dz, qnx, qny, qnz)
                    par = jnp.abs(denom) < 1e-8
                    t_q = (medf_ref[b + 12, m]
                           - _dot3(ox, oy, oz, qnx, qny, qnz)) \
                        / jnp.where(par, 1.0, denom)
                    hx = ox + t_q * dx - medf_ref[b + 0, m]
                    hy = oy + t_q * dy - medf_ref[b + 1, m]
                    hz = oz + t_q * dz - medf_ref[b + 2, m]
                    c1 = _cross3(hx, hy, hz, medf_ref[b + 6, m],
                                 medf_ref[b + 7, m], medf_ref[b + 8, m])
                    alpha = _dot3(medf_ref[b + 13, m], medf_ref[b + 14, m],
                                  medf_ref[b + 15, m], *c1)
                    c2 = _cross3(medf_ref[b + 3, m], medf_ref[b + 4, m],
                                 medf_ref[b + 5, m], hx, hy, hz)
                    beta = _dot3(medf_ref[b + 13, m], medf_ref[b + 14, m],
                                 medf_ref[b + 15, m], *c2)
                    ok_q = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                            & (beta >= 0.0) & (beta <= 1.0)
                            & (medf_ref[b + 16, m] > 0.5))
                    ts.append(jnp.where(ok_q, t_q, BIG))
                entry = ts[0]
                for t in ts[1:]:
                    entry = jnp.minimum(entry, t)
                exit_ = zero + BIG
                for t in ts:
                    exit_ = jnp.minimum(
                        exit_, jnp.where(t > entry + 1e-4, t, BIG))
                crossed = (entry < BIG * 0.5) & (exit_ < BIG * 0.5)
                t1 = jnp.maximum(entry, T_MIN)
                t2 = jnp.minimum(exit_, t_surf)
                span_ok = crossed & (t1 < t2) & (medf_ref[1, m] > 0.5)
                t2_safe = jnp.where(span_ok, t2, t1 + 1.0)
                dist_inside = (t2_safe - t1) * raylen
                hit_dist = medf_ref[0, m] * jnp.log(
                    jnp.maximum(u_med[m], 1e-12))
                scat = span_ok & (hit_dist < dist_inside)
                t_med = jnp.where(scat, t1 + hit_dist / raylen, BIG)
                take = t_med < t_best
                t_best = jnp.where(take, t_med, t_best)
                row_best = jnp.where(take, float(m), row_best)
            return t_best, row_best

        # ------------- shared shading/MIS core (miss -> emit -> scatter ->
        # mixture pdf -> ray-state update): the uniform tail of every
        # bounce once the hit record + material values are resolved. Used
        # by `physics` (forward + linearized tangent paths) AND by the
        # adjoint backward's per-bounce VJP function, so both directions
        # differentiate the IDENTICAL estimator math. lread overrides the
        # sphere-light geometry reads (adjoint diff inputs).
        def shade_core(th_, alive, hit, px, py, pz, nx, ny, nz, front,
                       fuzz, ior, tr, tg, tb, eff_tex,
                       is_light, is_metal, is_diel, is_iso, u, tm,
                       ox, oy, oz, dx, dy, dz, thx, thy, thz, lread=None):
            # 1. miss -> background (Camera.cpp:242-243)
            if sky_gradient:
                a_sky = 0.5 * (dy + 1.0)
                sbx = (1.0 - a_sky) + a_sky * 0.5
                sby = (1.0 - a_sky) + a_sky * 0.7
                sbz = (1.0 - a_sky) + a_sky * 1.0
            else:
                sbx, sby, sbz = bgx + zero, bgy + zero, bgz + zero
            miss = alive & ~hit
            drx = jnp.where(miss, thx * sbx, 0.0)
            dry = jnp.where(miss, thy * sby, 0.0)
            drz = jnp.where(miss, thz * sbz, 0.0)

            # 2. emitted (front faces only, DiffuseLight.cpp:12-23)
            live_hit = alive & hit
            emit_on = live_hit & is_light & front
            drx = drx + jnp.where(emit_on, thx * tr, 0.0)
            dry = dry + jnp.where(emit_on, thy * tg, 0.0)
            drz = drz + jnp.where(emit_on, thz * tb, 0.0)

            # 3-4. scatter (materials.scatter semantics)
            # metal: mirror + fuzz jitter (MetalMaterial.cpp:10-62)
            dvn = _dot3(dx, dy, dz, nx, ny, nz)
            rfx = dx - 2.0 * dvn * nx
            rfy = dy - 2.0 * dvn * ny
            rfz = dz - 2.0 * dvn * nz
            rfx, rfy, rfz = _normalize3(rfx, rfy, rfz)
            # unit_vector_from_uv(u_fuzz1, u_fuzz2)
            zj = 1.0 - 2.0 * u[D_FUZZ_U]
            rj = jnp.sqrt(jnp.maximum(1e-12, 1.0 - zj * zj))
            pj = (2.0 * math.pi) * u[D_FUZZ_V]
            mx = rfx + fuzz * rj * jnp.cos(pj)
            my = rfy + fuzz * rj * jnp.sin(pj)
            mz = rfz + fuzz * zj
            mx, my, mz = _normalize3(mx, my, mz)
            metal_ok = _dot3(mx, my, mz, nx, ny, nz) > 0.0

            # dielectric (DielectricMaterial.cpp:11-86)
            ri = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-dvn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
            cannot = ri * sin_t > 1.0
            r0s = (1.0 - ri) / (1.0 + ri)
            r0s = r0s * r0s
            schlick = r0s + (1.0 - r0s) * (1.0 - cos_t) ** 5
            do_refl = cannot | (schlick > u[D_REFL])
            # refract (vecmath.refract)
            rpx = ri * (dx + cos_t * nx)
            rpy = ri * (dy + cos_t * ny)
            rpz = ri * (dz + cos_t * nz)
            rp2 = _dot3(rpx, rpy, rpz, rpx, rpy, rpz)
            rpar = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - rp2), 1e-12))
            gx_, gy_, gz_ = _normalize3(rpx + rpar * nx, rpy + rpar * ny,
                                        rpz + rpar * nz)
            ddx, ddy, ddz = _where3(do_refl, rfx, rfy, rfz,
                                    gx_, gy_, gz_)

            atx = jnp.where(is_diel, 1.0, tr)
            aty = jnp.where(is_diel, 1.0, tg)
            atz = jnp.where(is_diel, 1.0, tb)
            scatters = ~is_light & ~(is_metal & ~metal_ok)
            skip_pdf = is_metal | is_diel
            skx, sky_, skz = _where3(is_metal, mx, my, mz, ddx, ddy, ddz)

            # material pdf sample: cosine hemisphere / uniform sphere
            (ux, uy, uz), (vx, vy, vz), (wx, wy, wz) = _onb_from_w(
                *_normalize3(nx, ny, nz))
            phm = (2.0 * math.pi) * u[D_MAT_U]
            sq2 = jnp.sqrt(jnp.maximum(u[D_MAT_V], 1e-12))
            zc = jnp.sqrt(jnp.maximum(1e-12, 1.0 - u[D_MAT_V]))
            ccx = jnp.cos(phm) * sq2
            ccy = jnp.sin(phm) * sq2
            cdx = ccx * ux + ccy * vx + zc * wx
            cdy = ccx * uy + ccy * vy + zc * wy
            cdz = ccx * uz + ccy * vz + zc * wz
            cdx, cdy, cdz = _normalize3(cdx, cdy, cdz)
            # uniform sphere (isotropic) reuses the same two uniforms
            zs = 1.0 - 2.0 * u[D_MAT_U]
            rs = jnp.sqrt(jnp.maximum(1e-12, 1.0 - zs * zs))
            ps = (2.0 * math.pi) * u[D_MAT_V]
            sdx = rs * jnp.cos(ps)
            sdy = rs * jnp.sin(ps)
            sdz = zs
            mdx, mdy, mdz = _where3(is_iso, sdx, sdy, sdz, cdx, cdy, cdz)

            if L > 0:
                ldx, ldy, ldz = light_sample(th_, px, py, pz, tm,
                                             u[D_LIGHT_SEL],
                                             u[D_LIGHT_U], u[D_LIGHT_V],
                                             lread=lread)
                pick = u[D_PICK] < 0.5
                gdx, gdy, gdz = _where3(pick, ldx, ldy, ldz,
                                        mdx, mdy, mdz)
                cosv = jnp.maximum(
                    0.0, _dot3(gdx, gdy, gdz, wx, wy, wz)) / math.pi
                mat_pdf = jnp.where(is_iso, INV_4PI, cosv)
                pdf_val = 0.5 * light_pdf(th_, px, py, pz, gdx, gdy, gdz,
                                          tm, lread=lread) + 0.5 * mat_pdf
            else:
                gdx, gdy, gdz = mdx, mdy, mdz
                cosv = jnp.maximum(
                    0.0, _dot3(gdx, gdy, gdz, wx, wy, wz)) / math.pi
                pdf_val = jnp.where(is_iso, INV_4PI, cosv)

            coss = jnp.maximum(
                0.0, _dot3(gdx, gdy, gdz, wx, wy, wz)) / math.pi
            spdf = jnp.where(is_iso, INV_4PI, coss)
            pdf_ok = pdf_val > 1e-8
            mis = spdf / jnp.where(pdf_ok, pdf_val, 1.0)
            factor = jnp.where(skip_pdf, 1.0, mis)
            ndx, ndy, ndz = _where3(skip_pdf, skx, sky_, skz,
                                    gdx, gdy, gdz)

            n_thx = jnp.where(live_hit, thx * atx * factor, thx)
            n_thy = jnp.where(live_hit, thy * aty * factor, thy)
            n_thz = jnp.where(live_hit, thz * atz * factor, thz)
            n_ox, n_oy, n_oz = _where3(live_hit, px, py, pz, ox, oy, oz)
            n_dx, n_dy, n_dz = _where3(live_hit, ndx, ndy, ndz,
                                       dx, dy, dz)
            return dict(
                o=(n_ox, n_oy, n_oz), d=(n_dx, n_dy, n_dz),
                th=(n_thx, n_thy, n_thz), drad=(drx, dry, drz),
                miss=miss, live_hit=live_hit, emit_on=emit_on,
                scatters=scatters, skip_pdf=skip_pdf, pdf_ok=pdf_ok,
                at=(atx, aty, atz), factor=factor, tcol=(tr, tg, tb),
                eff_tex=eff_tex, is_diel=is_diel)

        # --------------------------- camera ray for per-lane sample ids
        def gen_ray(s_abs_f):
            """Camera ray planes for absolute sample ids s_abs_f (f32 plane).

            Same draws/stratification as camera.generate_rays (tag
            CAMERA_DRAW_TAG, stratum (s % n, s // n), Camera.cpp:208-216)."""
            k1 = _f2u(s_abs_f)
            u0, u1c, u2c, u3c, u4c = _draws(
                k0, k1, k2, jnp.uint32(CAMERA_DRAW_TAG), 5)
            n_s = jnp.float32(n_strata)
            s_i = s_abs_f - jnp.floor(s_abs_f / n_s) * n_s
            s_j = jnp.floor(s_abs_f / n_s)
            inv = 1.0 / n_strata
            off_x = (s_i + u0) * inv - 0.5
            off_y = (s_j + u1c) * inv - 0.5
            psx = p0x + (i_f + off_x) * dux + (j_f + off_y) * dvx
            psy = p0y + (i_f + off_x) * duy + (j_f + off_y) * dvy
            psz = p0z + (i_f + off_x) * duz + (j_f + off_y) * dvz
            # defocus disk (rng.in_unit_disk_from_uv)
            rr = jnp.sqrt(u2c)
            phi = (2.0 * math.pi) * u3c
            da = rr * jnp.cos(phi) * defocus_on
            db = rr * jnp.sin(phi) * defocus_on
            ox = cx + da * fux + db * fvx
            oy = cy + da * fuy + db * fvy
            oz = cz + da * fuz + db * fvz
            dx, dy, dz = _normalize3(psx - ox, psy - oy, psz - oz)
            return ox, oy, oz, dx, dy, dz, u4c   # u4c = motion-blur time

        # ------------------------------------------------ one path bounce
        def bounce(st):
            """One wavefront step with lane regeneration.

            A lane whose path terminated immediately restarts on its pixel's
            next stratified sample (persistent-threads regeneration): lanes
            stay busy for ~n_samples * E[path length] + max_depth iterations
            instead of n_samples * max_depth. RNG streams per
            (pixel, sample, bounce) are unchanged, so results still match the
            pure-JAX oracle."""
            (ox, oy, oz, dx, dy, dz, thx, thy, thz,
             rx, ry, rz, alive_f, b_f, s_f, tm, _work) = st[:17]
            if grad_tex:
                Wp = list(st[17:17 + n_wp])        # d th_c / d tex[t, c]
                Gp = list(st[17 + n_wp:17 + 2 * n_wp])  # tex cotangents
                gbase = 17 + 2 * n_wp
                Dst = list(st[gbase:gbase + 9 * K])
                dG = list(st[gbase + 9 * K:gbase + 10 * K])
                if grad_suffix:
                    sbase = gbase + 10 * K
                    phB = st[sbase]                # 0 = trace, 1 = replay
                    Tr = list(st[sbase + 1:sbase + 4])   # path total rad
                    Pr = list(st[sbase + 4:sbase + 7])   # replay prefix
                    acc = list(st[sbase + 7:sbase + 7 + 3 * NTc])

            # --- regenerate dead lanes that still have samples left
            if grad_suffix:
                # two-phase lifecycle: a finished phase-A path replays the
                # SAME sample as phase B (the gradient events need the
                # path's total radiance T from A; counter RNG makes the
                # replay bit-identical); a finished phase B advances to the
                # next sample's phase A
                dead = alive_f < 0.5
                to_B = dead & (phB < 0.5)
                to_A = dead & (phB > 0.5) & (s_f + 1.0 < n_samples)
                regen = to_B | to_A
                s_f = jnp.where(to_A, s_f + 1.0, s_f)
                phB = jnp.where(to_A, 0.0, jnp.where(to_B, 1.0, phB))
                Tr = [jnp.where(to_A, 0.0, t) for t in Tr]
                Pr = [jnp.where(regen, 0.0, p) for p in Pr]
            else:
                regen = (alive_f < 0.5) & (s_f + 1.0 < n_samples)
                s_f = jnp.where(regen, s_f + 1.0, s_f)
            s_abs_f = sample_start_f + s_f
            gox, goy, goz, gdx0, gdy0, gdz0, gtm = gen_ray(s_abs_f)
            ox = jnp.where(regen, gox, ox)
            oy = jnp.where(regen, goy, oy)
            oz = jnp.where(regen, goz, oz)
            dx = jnp.where(regen, gdx0, dx)
            dy = jnp.where(regen, gdy0, dy)
            dz = jnp.where(regen, gdz0, dz)
            tm = jnp.where(regen, gtm, tm)
            thx = jnp.where(regen, 1.0, thx)
            thy = jnp.where(regen, 1.0, thy)
            thz = jnp.where(regen, 1.0, thz)
            b_f = jnp.where(regen, 0.0, b_f)
            alive = (alive_f > 0.5) | regen
            if grad_tex:
                # a fresh path starts with throughput 1 (no param dependence)
                Wp = [jnp.where(regen, 0.0, w) for w in Wp]
                Dst = [jnp.where(regen, 0.0, v) for v in Dst]

            k1 = _f2u(s_abs_f)
            u = _draws(k0, k1, k2,
                       jnp.uint32(0x4000000) + _f2u(b_f), N_DRAWS)
            u_med = _draws(k0, k1, k2,
                           jnp.uint32(1_000_000) + _f2u(b_f), M) if M else ()

            # vscan winner selection runs OUTSIDE physics: its fori/cond/
            # ref-read control flow has no JVP rule, and selection is
            # detached (zero tangent) by design — physics closes over the
            # (hit, pid) result as constants and re-derives the record
            # differentiably (vscan_record)
            vsel = (vscan_select(ox, oy, oz, dx, dy, dz, tm, alive)
                    if vscan_mode else None)

            def physics(th_, ox, oy, oz, dx, dy, dz, thx, thy, thz):
                """The whole continuous per-bounce computation — closest hit
                through scatter/MIS to the ray-state update — as a pure
                function of the hard-parameter scalars th_ and the
                differentiable ray state, so the grad path can
                jax.linearize it (see _make_kernel docstring). Discrete
                context (alive mask, RNG draws, ray time) is closed over:
                its tangents are zero by detached-sampling semantics."""
                if unroll_prims:
                    (hit, best_t, px, py, pz, nx, ny, nz, front,
                     mat) = closest_hit(th_, ox, oy, oz, dx, dy, dz, tm)
                elif lane_mode:
                    (hit, best_t, px, py, pz, nx, ny, nz, front,
                     mats) = closest_hit_lane(ox, oy, oz, dx, dy, dz, tm,
                                              alive)
                elif vscan_mode:
                    (hit, best_t, px, py, pz, nx, ny, nz, front,
                     mats) = vscan_record(th_, *vsel,
                                          ox, oy, oz, dx, dy, dz, tm)
                else:
                    (hit, best_t, px, py, pz, nx, ny, nz, front,
                     mats) = closest_hit_scan(ox, oy, oz, dx, dy, dz, tm,
                                              alive)

                # constant mediums preempt the surface hit (same draw stream
                # as ops.integrator: tag 1_000_000 + bounce, one per medium)
                if M:
                    t_surf = jnp.where(hit, best_t, BIG)
                    t_med, med_row = medium_free_flight(
                        ox, oy, oz, dx, dy, dz, tm, t_surf, u_med)
                    med_on = t_med < BIG * 0.5
                    hit = hit | med_on
                    px = jnp.where(med_on, ox + t_med * dx, px)
                    py = jnp.where(med_on, oy + t_med * dy, py)
                    pz = jnp.where(med_on, oz + t_med * dz, pz)
                    nx = jnp.where(med_on, 1.0, nx)   # arbitrary normal,
                    ny = jnp.where(med_on, 0.0, ny)   # front face (isotropic
                    nz = jnp.where(med_on, 0.0, nz)   # phase ignores it)
                    front = med_on | front
                    if unroll_prims:
                        for m in range(M):
                            sel = med_on & (med_row == float(m))
                            mat = jnp.where(
                                sel,
                                medf_ref[2 + 4 * MS + 17 * MQ,
                                         m].astype(jnp.int32),
                                mat)
                    else:
                        # primmat medium rows follow whatever else each
                        # mode keeps in SMEM: lane/vquad = mediums only,
                        # vscan = quads then mediums, stack-BVH = the full
                        # table
                        med_base = (0 if (lane_mode or vquad_mode)
                                    else Q if vscan_mode else S + Q)
                        for m in range(M):
                            sel = med_on & (med_row == float(m))
                            mats = tuple(
                                jnp.where(sel, primmat_ref[c, med_base + m],
                                          mats[c])
                                for c in range(PMCOLS))

                # hash-noise turbulence at the hit point, shared by every
                # noise texture row this bounce (the marble phase is the only
                # per-row term; NoiseTexture.cpp:8-33). Static-gated:
                # noise-free scenes trace no turbulence ops at all. Inside
                # physics so geometry tangents flow through marble shading.
                turb = _turbulence3(px, py, pz, pseed) if has_noise else None

                if unroll_prims:
                    # gather material row (masked-select over NM rows)
                    mtype = jnp.zeros_like(mat)
                    mtex = jnp.zeros_like(mat)
                    fuzz = zero
                    ior = zero + 1.0
                    for m in range(NM):
                        sel = mat == m
                        mtype = jnp.where(sel, mati_ref[0, m], mtype)
                        mtex = jnp.where(sel, mati_ref[1, m], mtex)
                        fuzz = jnp.where(sel, matf_read(th_, 0, m), fuzz)
                        ior = jnp.where(sel, matf_read(th_, 1, m), ior)
                    tr, tg, tb, eff_tex = texture_color(mtex, px, py, pz,
                                                        turb)
                    is_light = mtype == MAT_DIFFUSE_LIGHT
                    is_metal = mtype == MAT_METAL
                    is_diel = mtype == MAT_DIELECTRIC
                    is_iso = mtype == MAT_ISOTROPIC
                else:
                    mtype_f, fuzz, ior = mats[0], mats[1], mats[2]
                    ior = jnp.where(ior == 0.0, 1.0, ior)  # padded rows
                    if deep_tex:
                        # nested checker children: per-lane DAG descent
                        # (mats[15] = the hit's own texture row id)
                        tr, tg, tb, eff_tex = tex_eval_dag(
                            mats[15], px, py, pz, turb)
                    else:
                        tr, tg, tb, eff_tex = tex_eval_planes(
                            *mats[3:18], px, py, pz, turb)
                    is_light = mtype_f == float(MAT_DIFFUSE_LIGHT)
                    is_metal = mtype_f == float(MAT_METAL)
                    is_diel = mtype_f == float(MAT_DIELECTRIC)
                    is_iso = mtype_f == float(MAT_ISOTROPIC)

                return shade_core(
                    th_, alive, hit, px, py, pz, nx, ny, nz, front,
                    fuzz, ior, tr, tg, tb, eff_tex,
                    is_light, is_metal, is_diel, is_iso, u, tm,
                    ox, oy, oz, dx, dy, dz, thx, thy, thz)

            if K:
                # linearize once, push one 9-plane tangent bundle per hard
                # parameter through the shared linear map; theta unit
                # tangents are literal 0/1 constants, so XLA folds the
                # injection terms of every other slot out of each bundle
                P_, jvp_fn = jax.linearize(
                    physics, theta, ox, oy, oz, dx, dy, dz, thx, thy, thz)
                one = jnp.ones((), jnp.float32)
                nul = jnp.zeros((), jnp.float32)
                for k in range(K):
                    dth_in = tuple(one if i == k else nul for i in range(K))
                    T_ = jvp_fn(dth_in, *Dst[9 * k:9 * k + 9])
                    dgk = (cg_r * T_["drad"][0]
                           + cg_g * T_["drad"][1]
                           + cg_b * T_["drad"][2])
                    if grad_suffix:
                        # phase B replays the same radiance events with
                        # identical tangents — count phase A only
                        dgk = jnp.where(phB < 0.5, dgk, 0.0)
                    dG[k] = dG[k] + dgk
                    Dst[9 * k:9 * k + 9] = [
                        T_["o"][0], T_["o"][1], T_["o"][2],
                        T_["d"][0], T_["d"][1], T_["d"][2],
                        T_["th"][0], T_["th"][1], T_["th"][2]]
            else:
                P_ = physics(theta, ox, oy, oz, dx, dy, dz, thx, thy, thz)

            if grad_suffix:
                # phase A owns the image (phase B would double-count) and
                # accumulates the path total T; phase B accumulates the
                # replay prefix P (AFTER this bounce's events, for the
                # suffix T - P_after below)
                inA = phB < 0.5
                rx = rx + jnp.where(inA, P_["drad"][0], 0.0)
                ry = ry + jnp.where(inA, P_["drad"][1], 0.0)
                rz = rz + jnp.where(inA, P_["drad"][2], 0.0)
                Tr = [t + jnp.where(inA, d, 0.0)
                      for t, d in zip(Tr, P_["drad"])]
                Pr = [p + jnp.where(inA, 0.0, d)
                      for p, d in zip(Pr, P_["drad"])]
            else:
                rx = rx + P_["drad"][0]
                ry = ry + P_["drad"][1]
                rz = rz + P_["drad"][2]
            live_hit = P_["live_hit"]

            if n_wp:
                gc = (cg_r, cg_g, cg_b)
                thc = (thx, thy, thz)          # pre-scatter throughput
                miss = P_["miss"]
                emit_on = P_["emit_on"]
                tc = P_["tcol"]
                atc = P_["at"]
                eff_tex = P_["eff_tex"]
                is_diel = P_["is_diel"]
                factor = P_["factor"]
                # miss radiance event: through th only (background const).
                # Background color must be recomputed cheaply for the W dot:
                if sky_gradient:
                    a_sky = 0.5 * (dy + 1.0)
                    sb = ((1.0 - a_sky) + a_sky * 0.5,
                          (1.0 - a_sky) + a_sky * 0.7,
                          (1.0 - a_sky) + a_sky * 1.0)
                else:
                    sb = (bgx + zero, bgy + zero, bgz + zero)
                for t in range(NT_g):
                    ind = eff_tex == float(t)
                    for c in range(3):
                        Gp[3 * t + c] = Gp[3 * t + c] + jnp.where(
                            miss, gc[c] * Wp[3 * t + c] * sb[c], 0.0
                        ) + jnp.where(
                            emit_on,
                            gc[c] * (Wp[3 * t + c] * tc[c]
                                     + jnp.where(ind, thc[c], 0.0)),
                            0.0)
                # product rule through th <- th * at * factor; at is the
                # eff_tex row's color for every family except dielectric
                # (at=1 const), and factor never depends on tex_color
                for t in range(NT_g):
                    ind = (eff_tex == float(t)) & ~is_diel
                    for c in range(3):
                        w_new = (Wp[3 * t + c] * atc[c]
                                 + jnp.where(ind, thc[c], 0.0)) * factor
                        Wp[3 * t + c] = jnp.where(live_hit, w_new,
                                                  Wp[3 * t + c])
            elif grad_suffix:
                # suffix-radiance events (phase-B lanes only): the
                # emission's direct term is g·th (exact, no division); the
                # scatter term is g·(T − P_after)/at — everything radiated
                # after this bounce is proportional to this bounce's
                # attenuation at (the MIS mixture pdf folds into the
                # tex-independent `factor`), so one division recovers
                # th·factor·L(next) without any per-row state. Both events
                # share the hit's eff_tex row: one one-hot routing/bounce.
                gc = (cg_r, cg_g, cg_b)
                thc = (thx, thy, thz)
                inB = phB > 0.5
                emit_b = P_["emit_on"] & inB
                scat_b = P_["live_hit"] & ~P_["is_diel"] & inB
                atc = P_["at"]
                vals = []
                for c in range(3):
                    sfx = Tr[c] - Pr[c]
                    div = jnp.where(jnp.abs(atc[c]) > 1e-8,
                                    sfx / jnp.where(jnp.abs(atc[c]) > 1e-8,
                                                    atc[c], 1.0), 0.0)
                    vals.append(gc[c] * (jnp.where(emit_b, thc[c], 0.0)
                                         + jnp.where(scat_b, div, 0.0)))
                iota3 = jax.lax.broadcasted_iota(
                    jnp.int32, (R, 128, 128), 2)
                eff_i = P_["eff_tex"].astype(jnp.int32)
                for nc in range(NTc):
                    oh = (eff_i[:, :, None] == iota3 + nc * 128).astype(
                        jnp.float32)
                    for c in range(3):
                        red = jnp.sum(oh * vals[c][:, :, None],
                                      axis=(0, 1))
                        acc[c * NTc + nc] = (acc[c * NTc + nc]
                                             + red.reshape(1, 128))

            ox, oy, oz = P_["o"]
            dx, dy, dz = P_["d"]
            thx, thy, thz = P_["th"]
            # the reference terminates the recursion at depth==max_depth
            # (Camera.cpp:236-237): a path still alive after its
            # max_depth-th bounce contributes nothing further
            b_f = b_f + 1.0
            alive_new = (live_hit & P_["scatters"]
                         & (P_["skip_pdf"] | P_["pdf_ok"])
                         & (b_f < max_depth))
            work = alive_new | (s_f + 1.0 < n_samples)
            if grad_suffix:
                # a dead phase-A lane still owes its phase-B replay
                work = work | (phB < 0.5)
            out = (ox, oy, oz, dx, dy, dz, thx, thy, thz,
                   rx, ry, rz, jnp.where(alive_new, zero + 1.0, zero), b_f,
                   s_f, tm, jnp.where(work, zero + 1.0, zero))
            if grad_tex:
                out = out + tuple(Wp) + tuple(Gp) + tuple(Dst) + tuple(dG)
                if grad_suffix:
                    out = out + (phB,) + tuple(Tr) + tuple(Pr) + tuple(acc)
            if cap:
                out = out + (st[-1] + 1,)
            return out

        # ============ adjoint (reverse-mode) backward: per-sample two-phase
        # loop (round-5; ROADMAP "adjoint pass"). Phase F traces the sample
        # forward storing 10 state planes per bounce in VMEM scratch; phase
        # R walks the bounces BACKWARD, re-deriving each bounce's discrete
        # context (winner selection is detached by detached-sampling
        # semantics, so it runs outside the VJP) and applying jax.vjp of
        # the dense record+shade math with the winner's GATHERED per-lane
        # values as differentiable inputs. The state cotangent lambda
        # (d<g,L>/d(o,d,th)) chains across bounces in registers; parameter
        # cotangents one-hot-scatter into chunked accumulator rows. Cost is
        # O(1) per parameter — this is what lets 2,000-slot geometry
        # training run fused instead of the ~600x pure-JAX replay, and it
        # has no zero-albedo caveat (no division by `at`). Reference
        # analogue: the device integrator is the only hot path for
        # everything (CameraKernels.cu:106-202).
        if grad_adjoint:
            cg_r, cg_g, cg_b = g_ref[0], g_ref[1], g_ref[2]
            lth_vals = tuple(lightf_ref[c, l]
                             for (l, c, _si) in adj_light_slots)
            lz = i_f[0:1, :] * 0.0
            n_acc = 3 * Tc_a + 4 * Sc_a + 2 * Mc_a

            def make_lread(lth):
                def lread(th_, col, l):
                    k = adj_light_map.get((l, col))
                    return lth[k] + zero if k is not None \
                        else lightf_ref[col, l]
                return lread

            def adj_ctx(ox, oy, oz, dx, dy, dz, tm, alive, u_med):
                """Discrete per-bounce context, computed OUTSIDE the VJP on
                the stored (non-differentiated) state: winner ids, the full
                record via vscan_record (authoritative winner resolution,
                incl. quad merge + materials), medium override, and the
                assembled per-lane leaf values that become diff inputs."""
                hit_s, pid, qhit, qpid = vscan_select(
                    ox, oy, oz, dx, dy, dz, tm, alive)
                (cxw, cyw, czw, cdxw, cdyw, cdzw, _r2, radw,
                 origw) = gather_fields(ptab_ref, C_vg, 9, pid)
                (hit, best_t, px, py, pz, _nx, _ny, _nz, _front,
                 mats) = vscan_record((), hit_s, pid, qhit, qpid,
                                      ox, oy, oz, dx, dy, dz, tm)
                if vquad_mode:
                    qn = gather_fields(qptab_ref, C_qg, 4, qpid)
                else:
                    qn = None
                if M:
                    t_surf = jnp.where(hit, best_t, BIG)
                    t_med, med_row = medium_free_flight(
                        ox, oy, oz, dx, dy, dz, tm, t_surf, u_med)
                    med_on = t_med < BIG * 0.5
                    med_base = 0 if vquad_mode else Q
                    for m in range(M):
                        sel = med_on & (med_row == float(m))
                        mats = tuple(
                            jnp.where(sel, primmat_ref[c, med_base + m],
                                      mats[c])
                            for c in range(PMCOLS))
                # leaf texture fields + effective row for cotangent routing
                # (parity/descent on the SAME numeric hit point the diff
                # side re-derives, so the frozen selection is exact)
                if deep_tex:
                    (clr, clg, clb, effrow, scale0,
                     noi_f) = tex_eval_dag(mats[15], px, py, pz, None,
                                           full=True)
                    noi = noi_f > 0.5
                    eff = jnp.where(noi, -1.0, effrow)
                else:
                    scale0 = mats[4]
                    chk = mats[3] > 0.5
                    inv = 1.0 / jnp.maximum(scale0, 1e-12)
                    fx = jnp.floor(inv * px).astype(jnp.int32)
                    fy = jnp.floor(inv * py).astype(jnp.int32)
                    fz = jnp.floor(inv * pz).astype(jnp.int32)
                    even = ((fx + fy + fz) & 1) == 0
                    clr = jnp.where(chk, jnp.where(even, mats[8], mats[11]),
                                    mats[5])
                    clg = jnp.where(chk, jnp.where(even, mats[9], mats[12]),
                                    mats[6])
                    clb = jnp.where(chk, jnp.where(even, mats[10],
                                                   mats[13]), mats[7])
                    noi = mats[14] > 0.5
                    eff = jnp.where(
                        noi, -1.0,
                        jnp.where(chk, jnp.where(even, mats[16], mats[17]),
                                  mats[15]))
                return dict(hit_s=hit_s, qhit=qhit,
                            cd=(cdxw, cdyw, cdzw), origw=origw, qn=qn,
                            sph=(cxw, cyw, czw, radw), fuzz0=mats[1],
                            ior0=mats[2], leaf=(clr, clg, clb), eff=eff,
                            noi=noi, scale0=scale0, mtype=mats[0],
                            matid=mats[18])

            def adj_record(cxw, cyw, czw, radw, ctx, ox_, oy_, oz_,
                           dx_, dy_, dz_, tm0):
                """vscan_record's record math with the winner's sphere
                geometry as DIFF inputs (quad geometry is untrainable and
                stays in SMEM/const planes; its t still differentiates
                through the ray state)."""
                hit0 = ctx["hit_s"]
                cdxw, cdyw, cdzw = ctx["cd"]
                a_ = _dot3(dx_, dy_, dz_, dx_, dy_, dz_)
                inv_a_ = 1.0 / a_
                if vscan_motion:
                    scx = cxw + tm0 * cdxw
                    scy = cyw + tm0 * cdyw
                    scz = czw + tm0 * cdzw
                else:
                    scx, scy, scz = cxw, cyw, czw
                ocx, ocy, ocz = scx - ox_, scy - oy_, scz - oz_
                h = _dot3(dx_, dy_, dz_, ocx, ocy, ocz)
                cc = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - radw * radw
                sq = _sqrt0(h * h - a_ * cc)
                r0 = (h - sq) * inv_a_
                r1 = (h + sq) * inv_a_
                tw = jnp.where(r0 > T_MIN, r0, r1)
                best_t = jnp.where(hit0, tw, zero + BIG)
                t_safe = jnp.where(hit0, tw, 1.0)
                inv_r = 1.0 / jnp.maximum(radw, 1e-12)
                nx = jnp.where(hit0, (ox_ + t_safe * dx_ - scx) * inv_r,
                               0.0)
                ny = jnp.where(hit0, (oy_ + t_safe * dy_ - scy) * inv_r,
                               0.0)
                nz = jnp.where(hit0, (oz_ + t_safe * dz_ - scz) * inv_r,
                               0.0)
                hit = hit0
                if Q and not vquad_mode:
                    # unrolled (vjp has no fori partial-eval); quad fields
                    # are SMEM constants, takes re-derive identically
                    for q in range(Q):
                        qnx, qny, qnz = quadf_ref[9, q], quadf_ref[10, q], \
                            quadf_ref[11, q]
                        denom = _dot3(dx_, dy_, dz_, qnx, qny, qnz)
                        par = jnp.abs(denom) < 1e-8
                        t_q = (quadf_ref[12, q]
                               - _dot3(ox_, oy_, oz_, qnx, qny, qnz)) \
                            / jnp.where(par, 1.0, denom)
                        hx = ox_ + t_q * dx_ - quadf_ref[0, q]
                        hy = oy_ + t_q * dy_ - quadf_ref[1, q]
                        hz = oz_ + t_q * dz_ - quadf_ref[2, q]
                        c1 = _cross3(hx, hy, hz, quadf_ref[6, q],
                                     quadf_ref[7, q], quadf_ref[8, q])
                        alpha = _dot3(quadf_ref[13, q], quadf_ref[14, q],
                                      quadf_ref[15, q], *c1)
                        c2 = _cross3(quadf_ref[3, q], quadf_ref[4, q],
                                     quadf_ref[5, q], hx, hy, hz)
                        beta = _dot3(quadf_ref[13, q], quadf_ref[14, q],
                                     quadf_ref[15, q], *c2)
                        take = (~par & (alpha >= 0.0) & (alpha <= 1.0)
                                & (beta >= 0.0) & (beta <= 1.0)
                                & (t_q > T_MIN) & (t_q < best_t)
                                & (quadf_ref[17, q] > 0.5))
                        best_t = jnp.where(take, t_q, best_t)
                        nx = jnp.where(take, qnx + zero, nx)
                        ny = jnp.where(take, qny + zero, ny)
                        nz = jnp.where(take, qnz + zero, nz)
                    hit = best_t < BIG * 0.5
                    t_safe = jnp.where(hit, best_t, 1.0)
                if vquad_mode:
                    qnx, qny, qnz, qd = ctx["qn"]
                    denom = _dot3(dx_, dy_, dz_, qnx, qny, qnz)
                    t_q = (qd - _dot3(ox_, oy_, oz_, qnx, qny, qnz)) \
                        / jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
                    better = ctx["qhit"] & (t_q < best_t)
                    best_t = jnp.where(better, t_q, best_t)
                    nx = jnp.where(better, qnx + zero, nx)
                    ny = jnp.where(better, qny + zero, ny)
                    nz = jnp.where(better, qnz + zero, nz)
                    hit = hit | better
                    t_safe = jnp.where(hit, best_t, 1.0)
                px = ox_ + t_safe * dx_
                py = oy_ + t_safe * dy_
                pz = oz_ + t_safe * dz_
                front = _dot3(dx_, dy_, dz_, nx, ny, nz) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                return (hit, best_t, px, py, pz, nx * sgn, ny * sgn,
                        nz * sgn, front)

            def adj_step(ctx, u, u_med, tm, alive, dins, st9, want_aux):
                """One bounce as a pure function of (diff inputs, state):
                the function phase R differentiates with jax.vjp, and phase
                F evaluates directly (identical numerics both phases)."""
                (cxw, cyw, czw, radw, fuzz0, ior0r, lr, lg, lb,
                 *lth) = dins
                ox, oy, oz, dx, dy, dz, thx, thy, thz = st9
                (hit, best_t, px, py, pz, nx, ny, nz,
                 front) = adj_record(cxw, cyw, czw, radw, ctx,
                                     ox, oy, oz, dx, dy, dz, tm)
                if M:
                    t_surf = jnp.where(hit, best_t, BIG)
                    t_med, med_row = medium_free_flight(
                        ox, oy, oz, dx, dy, dz, tm, t_surf, u_med)
                    med_on = t_med < BIG * 0.5
                    hit = hit | med_on
                    px = jnp.where(med_on, ox + t_med * dx, px)
                    py = jnp.where(med_on, oy + t_med * dy, py)
                    pz = jnp.where(med_on, oz + t_med * dz, pz)
                    nx = jnp.where(med_on, 1.0, nx)
                    ny = jnp.where(med_on, 0.0, ny)
                    nz = jnp.where(med_on, 0.0, nz)
                    front = med_on | front
                turb = (_turbulence3(px, py, pz, pseed) if has_noise
                        else None)
                if turb is not None:
                    marble = 0.5 * (1.0 + jnp.sin(ctx["scale0"] * pz
                                                  + 10.0 * turb))
                    tr = jnp.where(ctx["noi"], marble, lr)
                    tg = jnp.where(ctx["noi"], marble, lg)
                    tb = jnp.where(ctx["noi"], marble, lb)
                else:
                    tr, tg, tb = lr, lg, lb
                ior = jnp.where(ior0r == 0.0, 1.0, ior0r)
                mtype_f = ctx["mtype"]
                is_light = mtype_f == float(MAT_DIFFUSE_LIGHT)
                is_metal = mtype_f == float(MAT_METAL)
                is_diel = mtype_f == float(MAT_DIELECTRIC)
                is_iso = mtype_f == float(MAT_ISOTROPIC)
                P_ = shade_core(
                    (), alive, hit, px, py, pz, nx, ny, nz, front,
                    fuzz0, ior, tr, tg, tb, ctx["eff"],
                    is_light, is_metal, is_diel, is_iso, u, tm,
                    ox, oy, oz, dx, dy, dz, thx, thy, thz,
                    lread=make_lread(lth))
                out9 = P_["o"] + P_["d"] + P_["th"]
                if want_aux:
                    return out9, P_["drad"], (
                        P_["live_hit"], P_["scatters"], P_["skip_pdf"],
                        P_["pdf_ok"])
                return out9, P_["drad"]

            def scatter_rows(accs, base, n_chunks, idx_f, vals):
                """accs[base + f*n_chunks + c] += one-hot chunk reduction
                of per-lane cotangents `vals` routed by row ids `idx_f`
                (-1 / out-of-range ids never match an iota -> dropped).
                Same (R,128,128) broadcast-reduce the suffix estimator
                uses (Mosaic-proven; a (R*128, nf) matmul layout fails to
                lower — nf-wide lane dims reshape badly)."""
                idx = idx_f.astype(jnp.int32)
                iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
                accs = list(accs)
                for c in range(n_chunks):
                    oh = (idx[:, :, None] == iota + c * 128).astype(
                        jnp.float32)
                    for f, v in enumerate(vals):
                        red = jnp.sum(oh * v[:, :, None], axis=(0, 1))
                        k = base + f * n_chunks + c
                        accs[k] = accs[k] + red.reshape(1, 128)
                return tuple(accs)

            def bounce_ctx(b_f, k1, tm, ox, oy, oz, dx, dy, dz, alive):
                """Discrete context for one bounce at per-lane (sample,
                bounce) coordinates: b_f / k1 / tm are PLANES so the
                segmented (regenerating) sweep can mix samples per lane."""
                u = _draws(k0, k1, k2,
                           jnp.uint32(0x4000000) + _f2u(b_f), N_DRAWS)
                u_med = (_draws(k0, k1, k2,
                                jnp.uint32(1_000_000) + _f2u(b_f), M)
                         if M else ())
                ctx = adj_ctx(ox, oy, oz, dx, dy, dz, tm, alive, u_med)
                dins = (ctx["sph"][0], ctx["sph"][1], ctx["sph"][2],
                        ctx["sph"][3], ctx["fuzz0"], ctx["ior0"],
                        ctx["leaf"][0], ctx["leaf"][1], ctx["leaf"][2],
                        *lth_vals)
                return ctx, u, u_med, dins

            def apply_vjp(lam, accs, ctx, u, u_med, tm, alive, dins, st9):
                """jax.vjp of one bounce + cotangent scatters; returns
                (d_st9, accs)."""
                def fn(dins_, st9_):
                    return adj_step(ctx, u, u_med, tm, alive,
                                    dins_, st9_, False)

                _, vjp = jax.vjp(fn, dins, st9)
                d_dins, d_st9 = vjp((tuple(lam), (cg_r, cg_g, cg_b)))
                (d_cx, d_cy, d_cz, d_rad, d_fz, d_io, d_lr, d_lg,
                 d_lb, *d_lth) = d_dins
                accs = scatter_rows(accs, 0, Tc_a, ctx["eff"],
                                    [d_lr, d_lg, d_lb])
                accs = scatter_rows(accs, 3 * Tc_a, Sc_a, ctx["origw"],
                                    [d_cx, d_cy, d_cz, d_rad])
                accs = scatter_rows(accs, 3 * Tc_a + 4 * Sc_a, Mc_a,
                                    ctx["matid"], [d_fz, d_io])
                if adj_light_slots:
                    accs = list(accs)
                    lane_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 128), 1)
                    for k, (l, col, si) in enumerate(adj_light_slots):
                        f = {1: 0, 2: 1, 3: 2, 7: 3}[col]
                        row = 3 * Tc_a + f * Sc_a + si // 128
                        oh = (lane_iota == (si % 128)).astype(jnp.float32)
                        accs[row] = accs[row] + oh * d_lth[k]
                    accs = tuple(accs)
                return d_st9, accs

            # ========== segmented-regeneration adjoint (round 5, late):
            # instead of one synchronized two-phase loop per sample (which
            # pays max-path-length-over-the-tile x 2 iterations per
            # sample), run the REGENERATING wavefront — full lane
            # occupancy, mixed samples per lane — checkpointing the carry
            # every SEG iterations (sweep 1), then walk segments backward:
            # restore a boundary, re-run its SEG iterations storing
            # per-iteration records, reverse them with jax.vjp, and cut
            # the lambda chain where a lane regenerated (the cotangent of
            # where(regen, fresh_camera_ray, prev_state) w.r.t. prev is 0).
            if adj_seg:
                SEG = adj_seg
                NSEG_MAX = -(-(n_samples * max_depth) // SEG) + 1
                bd_base = SEG * 14 * R          # boundaries after records

                def awf_advance(st, slot=None):
                    """One regenerating wavefront iteration (the adjoint
                    flavor of `bounce`): slot, when given, stores the
                    post-regen iteration record (14 planes) for the
                    reverse pass."""
                    (ox, oy, oz, dx, dy, dz, thx, thy, thz, alive_f,
                     b_f, s_f, tm, rx, ry, rz) = st
                    regen = (alive_f < 0.5) & (s_f + 1.0 < n_samples)
                    s_f = jnp.where(regen, s_f + 1.0, s_f)
                    s_abs_f = sample_start_f + s_f
                    gox, goy, goz, gdx0, gdy0, gdz0, gtm = gen_ray(
                        s_abs_f)
                    ox = jnp.where(regen, gox, ox)
                    oy = jnp.where(regen, goy, oy)
                    oz = jnp.where(regen, goz, oz)
                    dx = jnp.where(regen, gdx0, dx)
                    dy = jnp.where(regen, gdy0, dy)
                    dz = jnp.where(regen, gdz0, dz)
                    tm = jnp.where(regen, gtm, tm)
                    thx = jnp.where(regen, 1.0, thx)
                    thy = jnp.where(regen, 1.0, thy)
                    thz = jnp.where(regen, 1.0, thz)
                    b_f = jnp.where(regen, 0.0, b_f)
                    alive = (alive_f > 0.5) | regen
                    if slot is not None:
                        base = slot * (14 * R)
                        for f, pln in enumerate((
                                ox, oy, oz, dx, dy, dz, thx, thy, thz,
                                jnp.where(alive, zero + 1.0, zero),
                                jnp.where(regen, zero + 1.0, zero),
                                b_f, s_abs_f, tm)):
                            store_ref[pl.ds(base + f * R, R), :] = pln
                    ctx, u, u_med, dins = bounce_ctx(
                        b_f, _f2u(s_abs_f), tm, ox, oy, oz, dx, dy, dz,
                        alive)
                    st9 = (ox, oy, oz, dx, dy, dz, thx, thy, thz)
                    out9, dr3, aux = adj_step(ctx, u, u_med, tm, alive,
                                              dins, st9, True)
                    live_hit, scatters, skip_pdf, pdf_ok = aux
                    b_f = b_f + 1.0
                    alive_new = (live_hit & scatters
                                 & (skip_pdf | pdf_ok)
                                 & (b_f < max_depth))
                    return out9 + (
                        jnp.where(alive_new, zero + 1.0, zero), b_f, s_f,
                        tm, rx + dr3[0], ry + dr3[1], rz + dr3[2])

                # ---- sweep 1: forward with regeneration, one 13-plane
                # boundary snapshot per segment; the primal image
                # accumulates here
                gox, goy, goz, gdx0, gdy0, gdz0, gtm = gen_ray(
                    sample_start_f + zero)
                st0 = (gox, goy, goz, gdx0, gdy0, gdz0,
                       zero + 1.0, zero + 1.0, zero + 1.0,
                       zero + 1.0, zero, zero, gtm,
                       zero, zero, zero)

                def s1_cond(c):
                    nseg, st = c[0], c[1:]
                    work = (st[9] > 0.5) | (st[11] + 1.0 < n_samples)
                    return (jnp.sum(jnp.where(work, 1.0, 0.0)) > 0.0) \
                        & (nseg < NSEG_MAX)

                def s1_body(c):
                    nseg, st = c[0], c[1:]
                    base = bd_base + nseg * (13 * R)
                    for f in range(13):
                        store_ref[pl.ds(base + f * R, R), :] = st[f]
                    st = jax.lax.fori_loop(
                        0, SEG, lambda i, s: awf_advance(s), st)
                    return (nseg + 1,) + st

                outS = jax.lax.while_loop(s1_cond, s1_body,
                                          (jnp.int32(0),) + st0)
                nseg = outS[0]
                rxA, ryA, rzA = outS[14], outS[15], outS[16]

                # ---- sweep 2: segments in reverse; lambda carries across
                # segment boundaries in registers
                def rev_one(j, c):
                    lam = c[:9]
                    accs = c[9:]
                    slot = SEG - 1 - j
                    base = slot * (14 * R)
                    pls = [store_ref[pl.ds(base + f * R, R), :]
                           for f in range(14)]
                    st9 = tuple(pls[:9])
                    alive = pls[9] > 0.5
                    regen = pls[10] > 0.5
                    b_f, s_abs_f, tm = pls[11], pls[12], pls[13]
                    ctx, u, u_med, dins = bounce_ctx(
                        b_f, _f2u(s_abs_f), tm, *st9[:6], alive)
                    d_st9, accs = apply_vjp(lam, accs, ctx, u, u_med,
                                            tm, alive, dins, st9)
                    lam = tuple(jnp.where(regen, 0.0, d) for d in d_st9)
                    return lam + tuple(accs)

                def s2_body(kk, c):
                    k = nseg - 1 - kk
                    base = bd_base + k * (13 * R)
                    pls = [store_ref[pl.ds(base + f * R, R), :]
                           for f in range(13)]
                    st = tuple(pls) + (zero, zero, zero)
                    st2 = jax.lax.fori_loop(
                        0, SEG, lambda i, s: awf_advance(s, slot=i), st)
                    # data-dependence tie: the re-run exists only for its
                    # store_ref records — keep it from being DCE'd
                    c = (c[0] + 0.0 * st2[12],) + tuple(c[1:])
                    return jax.lax.fori_loop(0, SEG, rev_one, c)

                carry2 = jax.lax.fori_loop(
                    0, nseg, s2_body,
                    tuple(zero for _ in range(9))
                    + tuple(lz for _ in range(n_acc)))
                out_ref[0] = rxA
                out_ref[1] = ryA
                out_ref[2] = rzA
                dg_ref[0] = jnp.stack(
                    [carry2[9 + k][0] for k in range(n_acc)])
                return

            def sample_body(s, carry):
                rx0, ry0, rz0 = carry[:3]
                accs = carry[3:]
                s_abs_f = sample_start_f + (zero + s.astype(jnp.float32))
                k1 = _f2u(s_abs_f)
                gox, goy, goz, gdx0, gdy0, gdz0, gtm = gen_ray(s_abs_f)

                # ---- phase F: forward trace, storing each bounce's input
                # state (o, d, th, alive = 10 planes) at 8-aligned offsets
                def f_body(st):
                    (ox, oy, oz, dx, dy, dz, thx, thy, thz, alive_f,
                     rx, ry, rz, b) = st
                    base = b * (10 * R)
                    for f, pln in enumerate((ox, oy, oz, dx, dy, dz,
                                             thx, thy, thz, alive_f)):
                        store_ref[pl.ds(base + f * R, R), :] = pln
                    alive = alive_f > 0.5
                    ctx, u, u_med, dins = bounce_ctx(
                        zero + b.astype(jnp.float32), k1, gtm,
                        ox, oy, oz, dx, dy, dz, alive)
                    st9 = (ox, oy, oz, dx, dy, dz, thx, thy, thz)
                    out9, dr3, aux = adj_step(ctx, u, u_med, gtm, alive,
                                              dins, st9, True)
                    live_hit, scatters, skip_pdf, pdf_ok = aux
                    alive_new = (live_hit & scatters & (skip_pdf | pdf_ok)
                                 & (b + 1 < max_depth))
                    return out9 + (
                        jnp.where(alive_new, zero + 1.0, zero),
                        rx + dr3[0], ry + dr3[1], rz + dr3[2], b + 1)

                def f_cond(st):
                    return (jnp.sum(st[9]) > 0.0) & (st[13] < max_depth)

                stF = jax.lax.while_loop(f_cond, f_body, (
                    gox, goy, goz, gdx0, gdy0, gdz0,
                    zero + 1.0, zero + 1.0, zero + 1.0, zero + 1.0,
                    rx0, ry0, rz0, jnp.int32(0)))
                rx, ry, rz = stF[10], stF[11], stF[12]
                n_used = stF[13]

                # ---- phase R: reverse sweep, chaining lambda and
                # scattering parameter cotangents
                def r_body(i, carry):
                    lam = carry[:9]
                    accs = carry[9:]
                    b = n_used - 1 - i
                    base = b * (10 * R)
                    pls = [store_ref[pl.ds(base + f * R, R), :]
                           for f in range(10)]
                    (ox, oy, oz, dx, dy, dz, thx, thy, thz,
                     alive_f) = pls
                    alive = alive_f > 0.5
                    ctx, u, u_med, dins = bounce_ctx(
                        zero + b.astype(jnp.float32), k1, gtm,
                        ox, oy, oz, dx, dy, dz, alive)
                    st9 = (ox, oy, oz, dx, dy, dz, thx, thy, thz)
                    d_st9, accs = apply_vjp(lam, accs, ctx, u, u_med,
                                            gtm, alive, dins, st9)
                    return d_st9 + tuple(accs)

                carry2 = jax.lax.fori_loop(
                    0, n_used, r_body,
                    tuple(zero for _ in range(9)) + tuple(accs))
                return (rx, ry, rz) + tuple(carry2[9:])

            outA = jax.lax.fori_loop(
                0, n_samples, sample_body,
                (zero, zero, zero) + tuple(lz for _ in range(n_acc)))
            out_ref[0] = outA[0]
            out_ref[1] = outA[1]
            out_ref[2] = outA[2]
            dg_ref[0] = jnp.stack([outA[3 + k][0] for k in range(n_acc)])
            return

        # persistent-wavefront loop: run until every lane is dead AND has
        # exhausted its samples (capped mode: or until `cap` bounce
        # iterations, leaving the carry state for a compacted resume pass)
        if resume:
            state = (stin_ref[5], stin_ref[6], stin_ref[7],      # origin
                     stin_ref[8], stin_ref[9], stin_ref[10],     # direction
                     stin_ref[11], stin_ref[12], stin_ref[13],   # throughput
                     zero, zero, zero,                           # radiance
                     stin_ref[1],                                # alive
                     stin_ref[2],                                # bounce
                     stin_ref[3],                                # sample idx
                     stin_ref[4],                                # ray time
                     stin_ref[0])                                # work-left
        else:
            gox, goy, goz, gdx0, gdy0, gdz0, gtm = gen_ray(
                sample_start_f + zero)
            state = (gox, goy, goz, gdx0, gdy0, gdz0,
                     zero + 1.0, zero + 1.0, zero + 1.0,   # throughput
                     zero, zero, zero,                      # radiance
                     zero + 1.0,                            # alive mask (f32)
                     zero,                                  # bounce count
                     zero,                                  # local sample idx
                     gtm,                                   # ray time
                     zero + 1.0)                            # work-left mask
        if grad_tex:
            # Wp and Dst are PATH state (they ride the compaction carry at
            # rows 14..); Gp/dG/acc are per-pass accumulators reset to 0
            if resume:
                state = state + tuple(
                    stin_ref[14 + k] for k in range(n_wp))            # Wp
                state = state + tuple(zero for _ in range(n_wp))      # Gp
                state = state + tuple(
                    stin_ref[14 + n_wp + k] for k in range(9 * K))   # Dst
                state = state + tuple(zero for _ in range(K))         # dG
            else:
                state = state + tuple(
                    zero for _ in range(2 * n_wp + 10 * K))
            if grad_suffix:
                # phB, T (3), P (3) lane planes + 3*NTc shared (1, 128)
                # accumulator rows (data-derived zeros: see `zero` above)
                lz = i_f[0:1, :] * 0.0
                if resume:
                    sb0 = 14 + n_wp + 9 * K
                    state = state + tuple(
                        stin_ref[sb0 + k] for k in range(7))
                else:
                    state = state + tuple(zero for _ in range(7))
                state = state + tuple(lz for _ in range(3 * NTc))
        if cap:
            state = state + (jnp.int32(0),)

        def w_cond(st):
            more = jnp.sum(st[16]) > 0.0
            return (more & (st[-1] < cap)) if cap else more

        out = jax.lax.while_loop(w_cond, bounce, state)
        out_ref[0] = out[9]
        out_ref[1] = out[10]
        out_ref[2] = out[11]
        if cap:
            # carry state for the compacted resume pass (wrapper layout:
            # work, alive, bounce, sample, time, o, d, th — 14 planes;
            # grad passes append Wp, Dst [, phB/T/P] path state)
            stout_ref[0] = out[16]
            stout_ref[1] = out[12]
            stout_ref[2] = out[13]
            stout_ref[3] = out[14]
            stout_ref[4] = out[15]
            for c in range(3):
                stout_ref[5 + c] = out[0 + c]
                stout_ref[8 + c] = out[3 + c]
                stout_ref[11 + c] = out[6 + c]
            if grad_tex:
                for k in range(n_wp):
                    stout_ref[14 + k] = out[17 + k]
                for k in range(9 * K):
                    stout_ref[14 + n_wp + k] = out[17 + 2 * n_wp + k]
                if grad_suffix:
                    sb = 17 + 2 * n_wp + 10 * K
                    for k in range(7):
                        stout_ref[14 + n_wp + 9 * K + k] = out[sb + k]
        if grad_tex:
            # per-tile partial gradient rows (tex cotangents then hard
            # cotangents): reduce the lane planes over sublanes here, leave
            # the (tile, lane) reduction to XLA. Suffix mode instead emits
            # its 3*NTc accumulator rows, whose LANES are texture-row ids
            # (the wrapper sums over tiles only)
            if grad_suffix:
                sb = 17 + 2 * n_wp + 10 * K + 7
                rows = [out[sb + k][0] for k in range(3 * NTc)]
            else:
                rows = [jnp.sum(out[17 + n_wp + k], axis=0)
                        for k in range(n_wp)]
            rows += [jnp.sum(out[17 + 2 * n_wp + 9 * K + k], axis=0)
                     for k in range(K)]
            dg_ref[0] = jnp.stack(rows)

    return kernel


def render_pass_pallas(flat: FlatScene, cam, seed, sample_start, **kw):
    """Public entry: resolves the RTX_* kernel-mode env knobs OUTSIDE the
    jit boundary and threads them through as the static `_env` argument, so
    changing an env var mid-process recompiles instead of silently reusing
    a kernel compiled under the old setting (round-3 ADVICE item 1). When
    called inside an outer jit (compacted schedule, train step) the env is
    read at that trace time — same caveat, one level up."""
    kw.setdefault("_env", _kernel_env())
    return _render_pass_pallas(flat, cam, seed, sample_start, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_strata", "max_depth", "n_samples",
                     "sky_gradient", "rows_per_tile", "interpret",
                     "hard_slots", "light_src", "want_tex", "cap", "_env",
                     "adjoint", "adjoint_seg"))
def _render_pass_pallas(flat: FlatScene, cam, seed, sample_start, *,
                        width: int, height: int, n_strata: int,
                        max_depth: int, n_samples: int,
                        sky_gradient: bool = False,
                        rows_per_tile: int | None = None,
                        interpret: bool = False, row0=0, cotangent=None,
                        hard_slots: tuple = (), light_src: tuple = (),
                        want_tex: bool = True, cap: int = 0, carry=None,
                        pix_lanes=None, _env: tuple = None,
                        adjoint: bool = False, adjoint_seg: int = 0):
    """Sum of n_samples stratified samples, (height, width, 3) — fused kernel.

    Drop-in replacement for models.render._render_pass (same RNG streams,
    same estimator; see module docstring for the feature gate).

    row0 (traced int) offsets pixel ids by row0*width: a mesh shard renders
    its local `height` rows with ABSOLUTE pixel ids, so per-(pixel, sample)
    RNG streams — and the image — are invariant to the mesh layout.

    cotangent ((height, width, 3) = d(loss)/d(image sum)): build the fused
    forward+backward variant instead — returns (image, dG_tex, dG_hard):
    dG_tex (NT, 3) = d(loss)/d(flat.tex_color) (zeros when want_tex=False),
    dG_hard (len(hard_slots),) = d(loss)/d(each hard scalar slot), both by
    in-kernel forward-mode accumulation (see _make_kernel). hard_slots /
    light_src are STATIC descriptors computed at bake time by
    hard_param_slots / light_sphere_sources. Unrolled-mode scenes only (use
    supports_pallas_grad to gate).

    adjoint=True (round 5; requires cotangent, gate with
    pallas_adjoint_gate_reason): the reverse-mode in-kernel backward
    instead — returns (image, grads) with grads a dict over ALL of
    tex_color/sph_center/sph_radius/mat_fuzz/mat_ior, O(1) per parameter,
    no slot cap (hard_slots/want_tex are ignored). adjoint_seg > 0 selects
    the segmented-regeneration sweep with that segment length (identical
    gradients to the per-sample sweep; faster at large max_depth).

    Capped/compacted scheduling (render_pass_pallas_compacted drives this;
    forward-only):
      cap > 0: stop the wavefront loop after `cap` bounce iterations and
        return raw lane-major planes instead of an image —
        (radiance (3, n_lanes), carry state (14, n_lanes)) with state rows
        [work, alive, bounce, sample, time, o xyz, d xyz, th xyz].
      carry ((14, n_lanes)): resume from that carried state instead of
        generating fresh camera rays (sample_start must match the capped
        pass so RNG streams line up).
      pix_lanes ((n_lanes,) int32 absolute pixel ids): explicit lane->pixel
        assignment (a compaction permutation of the identity layout);
        returns raw radiance planes so the caller can invert the
        permutation. n_lanes must equal n_tiles*rows_per_tile*128 of the
        identity layout.
    """
    if _env is None:
        _env = _kernel_env()
    S = flat.sph_center.shape[0]
    Q = flat.quad_corner.shape[0]
    L = flat.n_lights
    (sphf, quadf, prim_mat, lightf, mati, matf, texf, primmatf,
     medf) = _pack_tables(flat)
    lightf = lightf[:max(L, 1)]
    M = medf.shape[0] if flat.n_mediums else 0
    if not M:
        medf = medf[:1]                # unread; keep SMEM slim
        primmatf = primmatf[:S + Q]    # drop medium rows
    unroll, lane_mode, bvh_mode, vscan_mode = _kernel_modes(flat, _env)
    NM_full = int(mati.shape[0])
    if adjoint:
        # the adjoint backward always takes the vscan/vquad path (one code
        # shape for ANY scene size; winner selection is detached, so even
        # Cornell-class unrolled scenes run it for gradients)
        assert cotangent is not None and not cap and carry is None
        unroll = lane_mode = bvh_mode = False
        vscan_mode = True
    if rows_per_tile is None:
        # measured sweet spots (BASELINE.md): 32 rows for unrolled Cornell-
        # class scenes; 16 for vscan/stack-BVH scenes, where smaller tiles
        # make whole-tile chunk/node culling noticeably tighter; 8 for per-
        # lane traversal (smaller tiles bound the per-tile max step count)
        # and for the adjoint (its per-sample two-phase loop runs
        # max-path-length-over-the-tile iterations: bouncing full-family
        # 1.30 -> 1.51 Mpaths/s at R=8 vs 16, measured round 5)
        rows_per_tile = (8 if (adjoint or lane_mode)
                         else 32 if unroll else 16)
    csph = jnp.zeros((1, 6), jnp.float32)
    ntab = jnp.zeros((8, 128), jnp.float32)
    ptab = jnp.zeros((8, 128), jnp.float32)
    pmtab = jnp.zeros((24, 128), jnp.float32)
    C_n = C_p = B_n = P_n = C_v = C_vg = C_q = C_qg = 1
    n_big = C_stat = 0
    vquad_mode = False
    vqtab = jnp.zeros((VCHUNK, 24), jnp.float32)
    qptab = jnp.zeros((8, 128), jnp.float32)
    qpmtab = jnp.zeros((24, 128), jnp.float32)
    nodef = jnp.zeros((1, 6), jnp.float32)
    nodei = jnp.zeros((1, 5), jnp.int32)
    bprims = jnp.zeros((1,), jnp.int32)
    if unroll:
        primmatf = primmatf[:1]        # scan tables unused; keep SMEM slim
    else:
        matf_full = matf
        mati, matf, texf = mati[:1], matf[:1], texf[:1]
        if lane_mode:
            ntab, ptab, pmtab, C_n, C_p, B_n, P_n = _pack_lane_tables(
                flat, primmatf)
            # per-lane tables replace the SMEM prim/material tables; keep
            # only the medium override rows (appended after the prims)
            sphf = sphf[:1]
            primmatf = primmatf[S + Q:] if M else primmatf[:1]
        elif bvh_mode:
            # flat SAH BVH built at compile time (ops.bvh.build_bvh); the
            # kernel traverses it with a shared SMEM stack
            nodef = jnp.concatenate([flat.bvh_bbox_min, flat.bvh_bbox_max],
                                    axis=1)
            nodei = jnp.stack([flat.bvh_left, flat.bvh_right, flat.bvh_axis,
                               flat.bvh_leaf.astype(jnp.int32),
                               flat.bvh_leaf_sph], axis=1)
            bprims = flat.bvh_prims
        else:
            # vectorized prim-chunk scan: sphere + per-prim material data
            # move to VMEM gather tables (ntab slot carries the (C*128, 8)
            # prim-row table); SMEM keeps quad + medium rows only
            (ntab, ptab, pmtab, csph, C_v, C_vg, C_stat,
             n_big) = _pack_vscan_tables(flat, primmatf[:S])
            if hard_slots:
                # hard-slot theta scalars read from the full sphere /
                # material SMEM tables (closest_hit_vscan aliasing)
                matf = matf_full
            else:
                sphf = sphf[:1]
            primmatf = primmatf[S:]
            vquad_mode = Q > MAX_QUADS_VSCAN
            if vquad_mode:
                # quads move to vectorized chunk tables too; SMEM keeps
                # only the medium rows, and the quad chunk boxes follow
                # the sphere chunk boxes in the csph table
                (vqtab, qptab, qpmtab, qbox, C_q,
                 C_qg) = _pack_vquad_tables(flat, primmatf[:Q])
                csph = jnp.concatenate([csph, qbox], axis=0)
                quadf = quadf[:1]
                primmatf = primmatf[Q:] if M else primmatf[:1]

    n_pix = width * height
    R = rows_per_tile
    lane = 128
    rays_per_tile = R * lane
    n_tiles = -(-n_pix // rays_per_tile)
    if pix_lanes is not None:
        # compacted resume layout: absolute pixel ids per lane (already
        # include any row0 offset — the fi/fj derivation below inverts the
        # same pix = i + j*width encoding the identity layout uses)
        pix_flat = pix_lanes.astype(jnp.int32)
        pix = pix_flat.reshape(n_tiles * R, lane)
        fi = (pix_flat % width).astype(jnp.float32).reshape(n_tiles * R,
                                                            lane)
        fj = (pix_flat // width).astype(jnp.float32).reshape(n_tiles * R,
                                                             lane)
    else:
        base = jnp.minimum(
            jnp.arange(n_tiles * rays_per_tile, dtype=jnp.int32), n_pix - 1)
        row0 = jnp.asarray(row0, jnp.int32)
        pix_flat = base + row0 * width
        pix = pix_flat.reshape(n_tiles * R, lane)
        fi = (base % width).astype(jnp.float32).reshape(n_tiles * R, lane)
        fj = ((base // width).astype(jnp.float32)
              + row0.astype(jnp.float32)).reshape(n_tiles * R, lane)

    iscal = jnp.stack([jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
                       jnp.asarray(sample_start, jnp.int32),
                       jnp.asarray(flat.perlin_seed,
                                   jnp.uint32).astype(jnp.int32)])
    fscal = jnp.concatenate([
        cam.center, cam.pixel00, cam.pixel_du, cam.pixel_dv,
        cam.defocus_u, cam.defocus_v, cam.defocus_on[None],
        cam.background]).astype(jnp.float32)

    # nested checker DAGs (depth >= 2) in non-unrolled modes descend the
    # texture table per lane via chunked gathers; ship it chunk-major in
    # VMEM (the resolved per-prim rows only capture depth-1 children)
    deep_tex = (not unroll) and int(flat.checker_depth) >= 2
    vtex = jnp.zeros((8, 128), jnp.float32)
    C_t = 1
    if deep_tex:
        f32_ = jnp.float32
        vtex, C_t = _gather_table(jnp.stack([
            flat.tex_color[:, 0], flat.tex_color[:, 1],
            flat.tex_color[:, 2], flat.tex_scale,
            (flat.tex_type == TEX_CHECKER).astype(f32_),
            (flat.tex_type == TEX_NOISE).astype(f32_),
            flat.tex_child_even.astype(f32_),
            flat.tex_child_odd.astype(f32_)]))

    grad_tex = cotangent is not None and not adjoint
    NT_k = int(texf.shape[0])
    NT_g = int(flat.tex_color.shape[0])    # weight planes span the FULL
    K = len(hard_slots)                    # texture table (scan slims texf)
    # mirror _make_kernel's backward-tier pick: weight planes up to
    # MAX_GRAD_TEXS rows, the O(1)-in-NT suffix-radiance estimator beyond
    grad_suffix = grad_tex and want_tex and NT_g > MAX_GRAD_TEXS
    NTc = -(-NT_g // 128) if grad_suffix else 0
    n_wp = (3 * NT_g if (grad_tex and want_tex and not grad_suffix)
            else 0)
    if grad_tex:
        assert n_wp + K > 0 or grad_suffix, \
            "cotangent given but no gradient target"
    kernel = _make_kernel(
        S=S, Q=Q, L=L, NM=int(mati.shape[0]), NT=NT_k, M=M,
        R=R, width=width, n_pix=n_pix, n_strata=n_strata,
        max_depth=max_depth, n_samples=n_samples, sky_gradient=sky_gradient,
        unroll_prims=unroll,
        lane_mode=lane_mode, vscan_mode=vscan_mode, C_v=C_v, C_vg=C_vg,
        vscan_big=n_big, vscan_motion=flat.has_motion, vscan_stat=C_stat,
        vscan_big_motion=(flat.has_motion
                          and int(flat.n_sph_active_static) < VSCAN_BIG),
        C_n=C_n, C_p=C_p, B_n=B_n, P_n=P_n,
        grad_tex=grad_tex,
        bvh_mode=bvh_mode, has_noise=flat.has_noise,
        MQ=int(flat.med_quad_corner.shape[1]),
        MS=int(flat.med_sph_center.shape[1]),
        tex_struct=(flat.tex_struct[:NT_k] if flat.tex_struct
                    else ((TEX_SOLID, 0, 0),) * NT_k),
        hard_slots=hard_slots, light_src=light_src[:max(L, 1)],
        want_tex=want_tex, cap=cap, resume=carry is not None, NT_g=NT_g,
        lane_gather=_env[1], deep_tex=deep_tex, C_t=C_t,
        checker_depth=int(flat.checker_depth),
        vquad_mode=vquad_mode, C_q=C_q, C_qg=C_qg,
        grad_adjoint=adjoint, NM_g=NM_full, adj_seg=adjoint_seg,
        vscan_cull=(_env[3] if len(_env) > 3 else "cond"))

    tile_spec = lambda: pl.BlockSpec((R, lane), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    # compaction carry width: 14 standard planes + the grad pass's Wp/Dst
    # (+ suffix phB/T/P) path state (Gp/dG/acc accumulators sum per-pass)
    n_carry = 14 + ((n_wp + 9 * K + (7 if grad_suffix else 0))
                    if grad_tex else 0)
    in_specs = [tile_spec(), tile_spec(), tile_spec()]
    inputs = [pix, fi, fj]
    if carry is not None:
        inputs.append(carry.reshape(n_carry, n_tiles * R, lane))
        in_specs.append(pl.BlockSpec((n_carry, R, lane),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((3, R, lane), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((3, n_tiles * R, lane), jnp.float32)]
    Tc_a = -(-NT_g // 128)
    Sc_a = -(-max(S, 1) // 128)
    Mc_a = -(-max(NM_full, 1) // 128)
    if grad_tex or adjoint:
        if pix_lanes is not None:
            # resumed compacted pass: the driver hands the cotangent
            # already in (3, n_lanes) permuted-lane layout
            g = cotangent
        else:
            # cotangent planes in the lane layout of the output; pad lanes
            # get zero so the duplicated trailing pixel cannot double-count
            g = jnp.moveaxis(cotangent.reshape(n_pix, 3), -1, 0)
            g = jnp.zeros((3, n_tiles * rays_per_tile),
                          jnp.float32).at[:, :n_pix].set(g)
        inputs.append(g.reshape(3, n_tiles * R, lane))
        in_specs.append(pl.BlockSpec((3, R, lane), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        if adjoint:
            n_rows = 3 * Tc_a + 4 * Sc_a + 2 * Mc_a
        else:
            n_rows = (3 * NTc + K) if grad_suffix else n_wp + K
        out_specs.append(
            pl.BlockSpec((1, n_rows, lane), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, n_rows, lane), jnp.float32))
    if cap:
        out_specs.append(
            pl.BlockSpec((n_carry, R, lane), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_carry, n_tiles * R, lane),
                                 jnp.float32))
    if len(out_specs) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    # SMEM tables go in TRANSPOSED, (cols, rows): Mosaic pads each SMEM-window
    # row to a full 512 B lane group, so (rows, cols) layout costs
    # rows x 512 B regardless of cols — 16-64x the data — and caps scenes at
    # ~2k table rows against the 1 MiB SMEM budget. (cols, rows) puts the
    # long dimension minor: the pad is amortized once per column and an
    # 8000-prim table costs its actual byte size. All kernel reads are
    # scalar [col, row].
    inputs += [iscal, fscal, sphf.T, quadf.T, prim_mat, lightf.T, mati.T,
               matf.T, texf.T, primmatf.T, csph.T, medf.T, nodef.T,
               nodei.T, bprims]
    in_specs += [smem()] * 15
    # per-lane-gather tables live in VMEM (gather operands), whole-array
    inputs += [ntab, ptab, pmtab, vtex, vqtab, qptab, qpmtab]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7

    # lane mode keeps big per-lane gather scratch (one-hot matmul buffers +
    # (R,128,nfp) field blocks) live across the traversal while_loop; the
    # default 16 MiB scoped-VMEM budget is ~3 MiB short at R=8, so raise the
    # kernel's limit (v5e has 128 MiB/core; 64 MiB leaves the double-buffered
    # tile pipeline plenty)
    # raise the 16 MiB scoped-VMEM default when the per-lane gather tables
    # are big: lane mode keeps (R,128,nfp) gather scratch live across the
    # traversal loop; the adjoint adds the per-bounce state store; vscan
    # beyond ~16k prims carries >10 MiB of chunk/gather tables (vtab +
    # ptab + pmtab ~ 200 B/prim) alongside the tile pipeline
    big_tables = vscan_mode and C_v * VCHUNK >= 16384
    params = (pltpu.CompilerParams(
        vmem_limit_bytes=(100 if big_tables else 64) * 1024 * 1024)
        if (lane_mode or adjoint or big_tables) else None)
    scratch = [pltpu.SMEM((BVH_STACK,), jnp.int32)]
    if adjoint and adjoint_seg:
        # segmented mode: SEG per-iteration records (14 planes each) +
        # worst-case segment-boundary snapshots (13 planes each)
        nseg_max = -(-(n_samples * max_depth) // adjoint_seg) + 1
        scratch.append(pltpu.VMEM(
            (adjoint_seg * 14 * R + nseg_max * 13 * R, lane), jnp.float32))
    elif adjoint:
        # phase-F per-bounce state store: 10 planes x max_depth slots,
        # 8-aligned dynamic slices (R is a multiple of 8)
        scratch.append(pltpu.VMEM((max_depth * 10 * R, lane), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
    )(*inputs)

    if adjoint:
        out, dg = out
        summed = dg.sum(axis=0)                    # (n_rows, 128)
        tex = summed[:3 * Tc_a].reshape(3, Tc_a * 128)[:, :NT_g].T
        sp = summed[3 * Tc_a:3 * Tc_a + 4 * Sc_a].reshape(
            4, Sc_a * 128)[:, :S]
        mm = summed[3 * Tc_a + 4 * Sc_a:].reshape(2, Mc_a * 128)[:, :NM_full]
        grads = dict(tex_color=tex, sph_center=sp[:3].T, sph_radius=sp[3],
                     mat_fuzz=mm[0], mat_ior=mm[1])
        img = out.reshape(3, n_tiles * rays_per_tile)[:, :n_pix]
        img = jnp.moveaxis(img, 0, -1).reshape(height, width, 3)
        return img, grads

    st = None
    if grad_tex and cap:
        out, dg, st = out
    elif grad_tex:
        out, dg = out
    elif cap:
        out, st = out
    if grad_tex:
        if grad_suffix:
            # suffix accumulator rows: lane = texture-row id, rows are
            # channel-major 128-wide chunks — sum tiles, unchunk, slice;
            # trailing K hard-slot rows reduce over lanes as usual
            summed = dg.sum(axis=0)                    # (3*NTc + K, 128)
            dg_tex = summed[:3 * NTc].reshape(3, NTc * 128)[:, :NT_g].T
            dg_hard = summed[3 * NTc:].sum(axis=1)
        else:
            summed = dg.sum(axis=(0, 2))               # (n_wp + K,)
            dg_tex = (summed[:n_wp].reshape(NT_g, 3) if want_tex
                      else jnp.zeros((NT_g, 3), jnp.float32))
            dg_hard = summed[n_wp:]
    if cap:
        rad = out.reshape(3, n_tiles * rays_per_tile)
        stf = st.reshape(n_carry, n_tiles * rays_per_tile)
        return (rad, dg_tex, dg_hard, stf) if grad_tex else (rad, stf)
    if pix_lanes is not None:
        rad = out.reshape(3, n_tiles * rays_per_tile)
        return (rad, dg_tex, dg_hard) if grad_tex else rad
    img = out.reshape(3, n_tiles * rays_per_tile)[:, :n_pix]
    img = jnp.moveaxis(img, 0, -1).reshape(height, width, 3)
    return (img, dg_tex, dg_hard) if grad_tex else img


def render_pass_pallas_compacted(flat: FlatScene, cam, seed, sample_start,
                                 **kw):
    """Public entry for the capped + compacted schedule: resolves the RTX_*
    kernel-mode env knobs OUTSIDE the jit boundary and threads them through
    as the static `_env` argument — same hazard fix as render_pass_pallas
    (round-4 ADVICE item 4: flipping RTX_BVH_STACK/RTX_LANE_BVH mid-process
    must recompile, not silently reuse the stale mode-aware cap schedule).
    When called inside an outer jit the env is read at that trace time —
    same caveat, one level up."""
    kw.setdefault("_env", _kernel_env())
    return _render_pass_pallas_compacted(flat, cam, seed, sample_start, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_strata", "max_depth", "n_samples",
                     "sky_gradient", "rows_per_tile", "interpret", "cap",
                     "phases", "caps", "_env"))
def _render_pass_pallas_compacted(flat: FlatScene, cam, seed, sample_start, *,
                                  width: int, height: int, n_strata: int,
                                  max_depth: int, n_samples: int,
                                  sky_gradient: bool = False,
                                  rows_per_tile: int | None = None,
                                  interpret: bool = False, row0=0,
                                  cap: int = 0, phases: int = 2,
                                  caps: tuple | None = None,
                                  _env: tuple = None):
    """Two-phase capped + compacted wavefront schedule (forward renders).

    The single-pass megakernel spins each tile until its SLOWEST lane
    exhausts n_samples paths; measured lane occupancy is only ~26-36% at
    spp16 because per-sample path-length variance leaves most lanes idle
    behind a few stragglers (BASELINE.md, utils.profiling). This wrapper
    recovers a large part of that tail:

      phase 1: run the normal persistent wavefront, but stop every tile
        after `cap` bounce iterations (cap ~ the mean per-lane total work,
        where the idle fraction starts to dominate) and spill each lane's
        carry state (14 planes) to HBM.
      compact: argsort lanes by remaining-work key (unfinished lanes first,
        most-remaining-samples first — remaining count is the only part of
        the leftover that is KNOWN; sorting by a sampled work estimate is
        measurably worse than identity, see BASELINE.md round-3 notes).
      phase 2: resume the carried states under the sorted lane->pixel
        permutation. Finished lanes pack into trailing tiles whose
        wavefront loop exits on the first iteration, so the straggler work
        concentrates in a few dense leading tiles instead of stalling every
        tile. RNG keys are pixel-id-based, so the permutation cannot change
        any sample stream, and radiance sums lane-sequentially exactly as
        in the single pass.

    Exact schedule replay on oracle path lengths predicts 0.36 -> 0.57
    utilization on Cornell 200px spp16 d50 (cap~104); the permutation and
    the extra pass cost O(n_lanes) HBM traffic once.

    cap=0 picks the heuristic max(6.5*n_samples, max_depth) — measured
    optimum on v5e Cornell 600px spp16 d50: 75 -> 100 Mpaths/s at cap=104
    vs 95-97 at 89/128 (BASELINE.md round 3). Returns the (height, width, 3)
    radiance-sum image.
    """
    # rows_per_tile=None flows through to every inner pass, which each
    # derive the same per-mode default deterministically — so the lane/
    # vscan defaults stay consistent across the capped + resume passes
    # (round-3 ADVICE item 2)
    if _env is None:
        _env = _kernel_env()
    if caps is None:
        if cap == 0:
            # mode-aware default: unrolled Cornell-class scenes have long
            # mean paths (~5.6 bounces) — one big cap at 6.5x spp measured
            # best (round 3: 75 -> 100 Mpaths/s). vscan/BVH large scenes
            # have short means (~2-3) — two phases of 2x spp measured best
            # on v5e round 4 (bouncing 10.5 -> 17.7, grid 3.2 -> 5.5);
            # `caps` overrides everything with an explicit phase schedule
            unroll = _kernel_modes(flat, _env)[0]
            if not unroll:
                caps = (max(2 * n_samples, 2),) * 2
            else:
                cap = max(int(6.5 * n_samples), max_depth)
        if caps is None:
            # capped phases then one uncapped finisher; the second cap at
            # ~0.4x recovers another slice of the tail (exact replay:
            # 0.57 -> 0.62 utilization on Cornell spp16) before per-pass
            # overhead dominates. Round-4 replay on bouncing_spheres also
            # shows equal REPEATED caps (e.g. 2x18 at spp9) beat one big
            # cap: the remaining-samples sort key gains resolution as
            # samples advance
            caps = (cap,) if phases <= 2 else (
                (cap,) + tuple(max(int(cap * 0.4 ** i), max_depth // 2)
                               for i in range(1, phases - 1)))
    common = dict(width=width, height=height, n_strata=n_strata,
                  max_depth=max_depth, n_samples=n_samples,
                  sky_gradient=sky_gradient, rows_per_tile=rows_per_tile,
                  interpret=interpret, _env=_env)
    n_pix = width * height
    if caps == ():
        # zero capped phases = one plain uncapped pass (an explicit empty
        # caps tuple is a user request, not an absence — round-4 ADVICE 3)
        return render_pass_pallas(flat, cam, seed, sample_start, row0=row0,
                                  **common)
    rad = None
    perm = None
    st = None
    for cap_i in caps:
        if st is None:
            r, st = render_pass_pallas(flat, cam, seed, sample_start,
                                       row0=row0, cap=cap_i, **common)
            n_lanes = r.shape[1]
            base = jnp.minimum(jnp.arange(n_lanes, dtype=jnp.int32),
                               n_pix - 1)
            pix_abs = base + jnp.asarray(row0, jnp.int32) * width
            perm = jnp.arange(n_lanes, dtype=jnp.int32)
            rad = r
        else:
            r, st = render_pass_pallas(flat, cam, seed, sample_start,
                                       pix_lanes=pix_abs[perm],
                                       carry=st, cap=cap_i, **common)
            rad = rad.at[:, perm].add(r)
        # remaining-work key: unfinished lanes first, most remaining
        # samples first (the KNOWN part of the leftover; see docstring) —
        # finished lanes sort to the end, so their tiles exit immediately
        key = jnp.where(st[0] > 0.5, n_samples - st[3], -1.0)
        order = jnp.argsort(-key, stable=True)
        perm = perm[order]
        st = st[:, order]
    r = render_pass_pallas(flat, cam, seed, sample_start,
                           pix_lanes=pix_abs[perm], carry=st, **common)
    rad = rad.at[:, perm].add(r)
    img = rad[:, :n_pix]
    return jnp.moveaxis(img, 0, -1).reshape(height, width, 3)


def render_pass_pallas_grad_compacted(flat: FlatScene, cam, seed,
                                      sample_start, **kw):
    """Public entry for the capped + compacted GRAD schedule (round 5,
    VERDICT item 6): env knobs resolved outside jit, like the other
    entries."""
    kw.setdefault("_env", _kernel_env())
    return _render_pass_pallas_grad_compacted(flat, cam, seed, sample_start,
                                              **kw)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_strata", "max_depth", "n_samples",
                     "sky_gradient", "rows_per_tile", "interpret",
                     "hard_slots", "light_src", "want_tex", "caps", "_env"))
def _render_pass_pallas_grad_compacted(flat: FlatScene, cam, seed,
                                       sample_start, *, width: int,
                                       height: int, n_strata: int,
                                       max_depth: int, n_samples: int,
                                       cotangent, hard_slots: tuple = (),
                                       light_src: tuple = (),
                                       want_tex: bool = True,
                                       sky_gradient: bool = False,
                                       rows_per_tile: int | None = None,
                                       interpret: bool = False, row0=0,
                                       caps: tuple | None = None,
                                       _env: tuple = None):
    """Capped + lane-compacted schedule for the fused GRAD pass: same
    straggler-recovery mechanics as render_pass_pallas_compacted, applied
    to the forward-mode gradient kernel (weight-plane / tangent-bundle /
    suffix tiers). The Wp/Dst/suffix path state rides the spilled carry
    (rows 14..) through the compaction permutation; the Gp/dG/acc
    cotangent accumulators are emitted per pass and summed here (they are
    lane-sums, so the permutation cannot change them). Returns
    (image, dG_tex, dG_hard) exactly like the single grad pass.

    Measured motivation: the single-pass grad kernel spins each tile at
    the forward's ~0.33 straggler-bound lane occupancy; the forward
    recovered +38% from this schedule at spp100 (BASELINE.md)."""
    if _env is None:
        _env = _kernel_env()
    if caps is None:
        unroll = _kernel_modes(flat, _env)[0]
        if not unroll:
            caps = (max(2 * n_samples, 2),) * 2
        elif width * height >= 1_000_000:
            # measured on v5e Cornell 1080p spp64 d50 full-family: three
            # short phases beat one 6.5x-spp cap 65.3 vs 51.7 Mpaths/s —
            # at ~2M lanes the remaining-samples sort key pays off
            # repeatedly, while at 600^2 (360K lanes) the single big cap
            # still wins (48.5 vs 47.7)
            caps = (max(2 * n_samples, max_depth),) * 3
        else:
            caps = (max(int(6.5 * n_samples), max_depth),)
    common = dict(width=width, height=height, n_strata=n_strata,
                  max_depth=max_depth, n_samples=n_samples,
                  sky_gradient=sky_gradient, rows_per_tile=rows_per_tile,
                  interpret=interpret, hard_slots=hard_slots,
                  light_src=light_src, want_tex=want_tex, _env=_env)
    n_pix = width * height
    if caps == ():
        # zero capped phases = one plain uncapped grad pass (same contract
        # as the forward driver's empty-tuple case)
        return render_pass_pallas(flat, cam, seed, sample_start, row0=row0,
                                  cotangent=cotangent, **common)
    rad = dg_tex = dg_hard = st = None
    for cap_i in caps:
        if st is None:
            r, dgt, dgh, st = render_pass_pallas(
                flat, cam, seed, sample_start, row0=row0, cap=cap_i,
                cotangent=cotangent, **common)
            n_lanes = r.shape[1]
            base = jnp.minimum(jnp.arange(n_lanes, dtype=jnp.int32),
                               n_pix - 1)
            pix_abs = base + jnp.asarray(row0, jnp.int32) * width
            # identity-layout cotangent lanes for the resumed passes
            g0 = jnp.moveaxis(cotangent.reshape(n_pix, 3), -1, 0)
            g0 = jnp.zeros((3, n_lanes), jnp.float32).at[:, :n_pix].set(g0)
            perm = jnp.arange(n_lanes, dtype=jnp.int32)
            rad, dg_tex, dg_hard = r, dgt, dgh
        else:
            r, dgt, dgh, st = render_pass_pallas(
                flat, cam, seed, sample_start, pix_lanes=pix_abs[perm],
                carry=st, cap=cap_i, cotangent=g0[:, perm], **common)
            rad = rad.at[:, perm].add(r)
            dg_tex = dg_tex + dgt
            dg_hard = dg_hard + dgh
        key = jnp.where(st[0] > 0.5, n_samples - st[3], -1.0)
        order = jnp.argsort(-key, stable=True)
        perm = perm[order]
        st = st[:, order]
    r, dgt, dgh = render_pass_pallas(
        flat, cam, seed, sample_start, pix_lanes=pix_abs[perm],
        carry=st, cotangent=g0[:, perm], **common)
    rad = rad.at[:, perm].add(r)
    img = jnp.moveaxis(rad[:, :n_pix], 0, -1).reshape(height, width, 3)
    return img, dg_tex + dgt, dg_hard + dgh
