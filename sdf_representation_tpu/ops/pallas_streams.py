"""Pallas TPU kernels for the segmented culled-SDF work streams.

The XLA streams in ops/sdf_culled.py (`_dist_stream_slab`,
`_wind_stream_slab`) are HBM-bound, not compute-bound: each scan step
materialises ~10 (M, T) f32 intermediates (Pv0..Pv2, d, e, s, t, d2, ...)
between fusions — ~100 MB of HBM round-trips per step against ~0.2 GFLOP
of VPU work, measured 0.28 ms/step where the VPU floor is ~0.1 ms. These
kernels run the whole Eberly / van Oosterom-Strackee tile inside VMEM.

Design (all shapes chosen so no lane<->sublane relayout is ever needed):

  * (block, chunk) step ids are SCALAR-PREFETCHED; every BlockSpec
    index_map reads them to pick the point block and the packed
    per-chunk triangle rows (the canonical Pallas sparse-dispatch
    pattern). The id arrays carry one leading sentinel (the previous
    slab's last block id) so step i compares sb[i+1] vs sb[i] for
    "first visit of this output row".
  * Compute tiles are (T_SUB triangles x M_SUB points): points ride the
    LANES (native to the (1, 8, M) packed point block and the (1, M)
    output rows), triangles ride the SUBLANES. The table is packed
    (C, T, ROWS) on the host, so per-triangle constants are (T_SUB, 1)
    lane columns of a dynamic SUBLANE slice of the resident table block
    — no in-kernel transpose, and in particular no MXU pass (a default-
    precision MXU transpose silently rounds constants to bfloat16; that
    bug cost ~100 absolute in 20k-face winding sums before this layout).
  * The running per-block reduction lives in the OUTPUT block itself.
    Steps of a block are contiguous (block-major streams), so Pallas
    keeps the block in VMEM across the whole visit run and flushes it
    once, on block change. The first step of a run seeds the block from
    an input ALIASED to the output (carrying partial results across
    slab boundaries; the host initialises the buffers once).

The triangle constants are packed as one (C, T, ROWS) f32 array per
stream (row layout below) so each step is a single dense block DMA.

Role match: reference datagenerator/data_generator.py:880-906 (libigl
AABB signed_distance) — this is the TPU execution path under
ops/sdf_culled.signed_distance_culled, which keeps distances exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sdf_exact import _eberly_st

F32 = jnp.float32
I32 = jnp.int32

# distance-table row layout (15 used rows, padded to 16 sublanes).
# The tile pass needs only P.E0 / P.E1 (d = e0v0 - P.E0, e = e1v0 - P.E1)
# plus v0/E0/E1 for the closest point — not the raw v1/v2 dots.
_D_V0 = 0      # v0 xyz -> rows 0..2
_D_E0 = 3
_D_E1 = 6
_D_A = 9
_D_B = 10
_D_C = 11
_D_E0V0 = 12
_D_E1V0 = 13
_D_VALID = 14
_D_ROWS = 16

# winding-table row layout (20 used rows, padded to 24)
_W_V0 = 0
_W_V1 = 3
_W_V2 = 6
_W_K = 9
_W_N00 = 12
_W_N11 = 13
_W_N22 = 14
_W_N01 = 15
_W_N12 = 16
_W_N20 = 17
_W_D0 = 18
_W_VALID = 19
_W_ROWS = 24

_T_SUB = 128   # triangles (sublanes) per strip
_M_SUB = 1024  # points (lanes) per strip: temps are (128, 1024) f32 = 512 KB


def stream_tiling_ok(tri_chunk: int, m: int) -> bool:
    """True iff the kernels can tile (tri_chunk, m) without dropping work.

    The strip loops walk ``tri_chunk // _T_SUB`` sublane strips and
    ``m // min(_M_SUB, m)`` lane sub-blocks — a remainder in either
    would be silently skipped, so the drivers refuse it instead."""
    if tri_chunk < _T_SUB or tri_chunk % _T_SUB != 0:
        return False
    return m % min(_M_SUB, m) == 0


def _check_tiling(tri_chunk: int, m: int) -> None:
    if not stream_tiling_ok(tri_chunk, m):
        raise ValueError(
            f"pallas stream kernels need tri_chunk a multiple of {_T_SUB} "
            f"(got {tri_chunk}) and point_chunk a multiple of "
            f"min({_M_SUB}, point_chunk) (got {m}); use the XLA streams "
            "(use_pallas=False) for other tilings"
        )


def pack_dist_table(tables: dict, tri_chunk: int) -> np.ndarray:
    """(C, T, 16) f32 from the _triangle_tables dict (host, once).

    Triangles ride the SUBLANES, constants the LANES: the kernels slice
    (T_SUB, 16) strips with a dynamic sublane offset straight off the
    VMEM block (Mosaic supports dynamic sublane ref slicing but has no
    dynamic_slice on register values), so no in-kernel transpose — and
    no MXU pass that would round the constants — is ever needed."""
    C = tables["a"].shape[0]
    out = np.zeros((C, tri_chunk, _D_ROWS), np.float32)
    for base, key in ((_D_V0, "v0"), (_D_E0, "E0"), (_D_E1, "E1")):
        for k in range(3):
            out[:, :, base + k] = tables[key][:, :, k]
    for row, key in ((_D_A, "a"), (_D_B, "b"), (_D_C, "c"),
                     (_D_E0V0, "e0v0"), (_D_E1V0, "e1v0"),
                     (_D_VALID, "valid")):
        out[:, :, row] = tables[key]
    return out


def pack_wind_table(tables: dict, tri_chunk: int) -> np.ndarray:
    """(C, T, 24) f32 winding constants (layout: see pack_dist_table)."""
    C = tables["d0"].shape[0]
    out = np.zeros((C, tri_chunk, _W_ROWS), np.float32)
    for base, key in ((_W_V0, "v0"), (_W_V1, "v1"), (_W_V2, "v2"),
                      (_W_K, "K")):
        for k in range(3):
            out[:, :, base + k] = tables[key][:, :, k]
    for row, key in ((_W_N00, "n00"), (_W_N11, "n11"), (_W_N22, "n22"),
                     (_W_N01, "n01"), (_W_N12, "n12"), (_W_N20, "n20"),
                     (_W_D0, "d0"), (_W_VALID, "valid")):
        out[:, :, row] = tables[key]
    return out


def pack_points(P_blocks: np.ndarray) -> np.ndarray:
    """(B, M, 3) -> (B, 8, M) f32 (xyz in rows 0..2, sublane-padded)."""
    B, M, _ = P_blocks.shape
    out = np.zeros((B, 8, M), np.float32)
    out[:, 0] = P_blocks[:, :, 0]
    out[:, 1] = P_blocks[:, :, 1]
    out[:, 2] = P_blocks[:, :, 2]
    return out


def _atan2(y, x):
    """Full-quadrant atan2 from atan — Mosaic-safe (no library atan2).

    atan via the identity-reduced polynomial: for |q| <= 1,
    atan(q) = q * P(q^2); |q| > 1 uses atan(q) = pi/2 - atan(1/q).
    Max abs error of the minimax P ~ 1e-7 — far below the 2*pi sign
    margin this feeds (winding numbers)."""
    eps = jnp.float32(1e-30)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    q = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), eps)
    s = q * q
    # minimax polynomial for atan(q)/q on [0, 1] (Cephes-style)
    p = jnp.float32(-0.0117212)
    p = p * s + jnp.float32(0.05265332)
    p = p * s + jnp.float32(-0.11643287)
    p = p * s + jnp.float32(0.19354346)
    p = p * s + jnp.float32(-0.33262347)
    p = p * s + jnp.float32(0.99997726)
    r = q * p
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


# ---------------------------------------------------------------------------
# Distance stream
# ---------------------------------------------------------------------------

def _dist_kernel(sb_ref, sc_ref, p_ref, ind_ref, inb_ref, tab_ref,
                 outd_ref, outb_ref, *, tri_chunk: int, m: int):
    # state blocks are (1, 1, m): Mosaic requires the last TWO dims of a
    # block to be (8k, 128k)-divisible or equal to the array dims, so the
    # (B+1, M) state rides as (B+1, 1, M) with full (1, M) trailing dims
    i = pl.program_id(0)
    # i == 0 must seed even when the segment continues from the previous
    # slab: a fresh pallas_call's out-block VMEM is undefined, and the
    # aliased input row holds the previous slab's write-back
    first_visit = jnp.logical_or(sb_ref[i + 1] != sb_ref[i], i == 0)

    @pl.when(first_visit)
    def _():
        # seed the VMEM out block with the partial result so far (the
        # aliased input row: +inf at stream start, or the previous
        # slab's write-back when a segment spans slabs)
        outd_ref[0, 0, :] = ind_ref[0, 0, :]
        outb_ref[0, 0, :] = inb_ref[0, 0, :]

    face_base = sc_ref[i + 1] * tri_chunk

    m_sub = min(_M_SUB, m)
    for m0 in range(0, m, m_sub):
        ms = slice(m0, m0 + m_sub)
        px = p_ref[0, 0:1, ms]  # (1, M_SUB)
        py = p_ref[0, 1:2, ms]
        pz = p_ref[0, 2:3, ms]

        # strips ride a fori_loop: the (T_SUB, 16) strip is a dynamic
        # SUBLANE slice of the resident (T, 16) VMEM table block (lanes
        # hold the 16 constants; exact — no MXU transpose in the path)
        def strip(j, carry):
            run_d, run_b = carry  # (1, M_SUB) f32 / i32
            t0 = j * _T_SUB
            tt = tab_ref[0, pl.dslice(t0, _T_SUB), :]  # (T_SUB, ROWS)
            col = lambda r: jax.lax.slice(tt, (0, r), (_T_SUB, r + 1))
            pe0 = col(_D_E0) * px + col(_D_E0 + 1) * py + col(_D_E0 + 2) * pz
            pe1 = col(_D_E1) * px + col(_D_E1 + 1) * py + col(_D_E1 + 2) * pz
            d = col(_D_E0V0) - pe0
            e = col(_D_E1V0) - pe1
            s, t = _eberly_st(col(_D_A), col(_D_B), col(_D_C), d, e)
            dx = px - (col(_D_V0) + s * col(_D_E0) + t * col(_D_E1))
            dy = py - (col(_D_V0 + 1) + s * col(_D_E0 + 1)
                       + t * col(_D_E1 + 1))
            dz = pz - (col(_D_V0 + 2) + s * col(_D_E0 + 2)
                       + t * col(_D_E1 + 2))
            d2 = dx * dx + dy * dy + dz * dz
            d2 = jnp.where(col(_D_VALID) > 0, d2, jnp.inf)
            loc_min = jnp.min(d2, axis=0, keepdims=True)  # (1, M_SUB)
            tri_row = jax.lax.broadcasted_iota(I32, (_T_SUB, m_sub), 0)
            loc_arg = jnp.min(
                jnp.where(d2 <= loc_min, tri_row + t0, tri_chunk),
                axis=0, keepdims=True,
            )
            better = loc_min < run_d
            run_d = jnp.where(better, loc_min, run_d)
            run_b = jnp.where(better, face_base + loc_arg, run_b)
            return run_d, run_b

        carry = jax.lax.fori_loop(
            0, tri_chunk // _T_SUB, strip,
            (outd_ref[0, 0:1, ms], outb_ref[0, 0:1, ms]),
        )
        outd_ref[0, 0:1, ms] = carry[0]
        outb_ref[0, 0:1, ms] = carry[1]


@partial(jax.jit, static_argnames=("tri_chunk", "m", "interpret"),
         donate_argnums=(3, 4))
def _dist_slab_call(sb, sc, p_packed, outd, outb, tab, tri_chunk: int,
                    m: int, interpret: bool = False):
    n_steps = sb.shape[0] - 1
    B = p_packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, m),
                lambda i, sb, sc: (jnp.minimum(sb[i + 1], B - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, m), lambda i, sb, sc: (sb[i + 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, sb, sc: (sb[i + 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tri_chunk, _D_ROWS),
                lambda i, sb, sc: (sc[i + 1], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m), lambda i, sb, sc: (sb[i + 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, sb, sc: (sb[i + 1], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = partial(_dist_kernel, tri_chunk=tri_chunk, m=m)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(outd.shape, F32),
            jax.ShapeDtypeStruct(outb.shape, I32),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sb, sc, p_packed, outd, outb, tab)


# ---------------------------------------------------------------------------
# Winding stream
# ---------------------------------------------------------------------------

def _wind_kernel(sb_ref, sc_ref, p_ref, inw_ref, tab_ref, outw_ref,
                 *, tri_chunk: int, m: int):
    i = pl.program_id(0)
    first_visit = jnp.logical_or(sb_ref[i + 1] != sb_ref[i], i == 0)

    @pl.when(first_visit)
    def _():
        outw_ref[0, 0, :] = inw_ref[0, 0, :]

    m_sub = min(_M_SUB, m)
    for m0 in range(0, m, m_sub):
        ms = slice(m0, m0 + m_sub)
        px = p_ref[0, 0:1, ms]
        py = p_ref[0, 1:2, ms]
        pz = p_ref[0, 2:3, ms]
        p3 = p_ref[0, 0:3, ms]  # (3, M_SUB) — MXU operand for the dots
        p2 = px * px + py * py + pz * pz  # (1, M_SUB)

        def strip(j, acc):
            t0 = j * _T_SUB
            tt = tab_ref[0, pl.dslice(t0, _T_SUB), :]  # (T_SUB, ROWS)
            col = lambda r: jax.lax.slice(tt, (0, r), (_T_SUB, r + 1))
            # the 4 per-pair dot products ride the MXU ((T_SUB,3)@(3,M),
            # idle otherwise), freeing ~20 VPU issue slots per pair-tile in
            # a kernel that is VPU-ISSUE-bound (~100 vector ops/tile, not
            # bandwidth — ~130 KB DMA per 165 us step). HIGHEST precision:
            # a default-precision MXU pass rounds operands to bfloat16,
            # which this module's layout was specifically built to avoid
            # (see module docstring); the 3-pass f32 form keeps winding
            # sums exact and its MXU time is noise next to the VPU work.
            mm = lambda a: jax.lax.dot_general(
                a, p3, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=F32,
            )  # (T_SUB, M_SUB)
            pv0 = mm(jax.lax.slice(tt, (0, _W_V0), (_T_SUB, _W_V0 + 3)))
            pv1 = mm(jax.lax.slice(tt, (0, _W_V1), (_T_SUB, _W_V1 + 3)))
            pv2 = mm(jax.lax.slice(tt, (0, _W_V2), (_T_SUB, _W_V2 + 3)))
            pk = mm(jax.lax.slice(tt, (0, _W_K), (_T_SUB, _W_K + 3)))
            la = jnp.sqrt(jnp.maximum(col(_W_N00) - 2.0 * pv0 + p2, 1e-30))
            lb = jnp.sqrt(jnp.maximum(col(_W_N11) - 2.0 * pv1 + p2, 1e-30))
            lc = jnp.sqrt(jnp.maximum(col(_W_N22) - 2.0 * pv2 + p2, 1e-30))
            ab = col(_W_N01) - pv0 - pv1 + p2
            bc = col(_W_N12) - pv1 - pv2 + p2
            ca = col(_W_N20) - pv2 - pv0 + p2
            numer = col(_W_D0) - pk
            denom = la * lb * lc + ab * lc + bc * la + ca * lb
            omega = 2.0 * _atan2(numer, denom) * col(_W_VALID)
            return acc + jnp.sum(omega, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(
            0, tri_chunk // _T_SUB, strip, outw_ref[0, 0:1, ms]
        )
        outw_ref[0, 0:1, ms] = acc


@partial(jax.jit, static_argnames=("tri_chunk", "m", "interpret"),
         donate_argnums=(3,))
def _wind_slab_call(sb, sc, p_packed, outw, tab, tri_chunk: int, m: int,
                    interpret: bool = False):
    n_steps = sb.shape[0] - 1
    B = p_packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, m),
                lambda i, sb, sc: (jnp.minimum(sb[i + 1], B - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, m), lambda i, sb, sc: (sb[i + 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tri_chunk, _W_ROWS),
                lambda i, sb, sc: (sc[i + 1], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m), lambda i, sb, sc: (sb[i + 1], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = partial(_wind_kernel, tri_chunk=tri_chunk, m=m)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(outw.shape, F32)],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sb, sc, p_packed, outw, tab)[0]


# ---------------------------------------------------------------------------
# Host drivers (slabbed like the XLA streams; see sdf_culled._STREAM_SLAB)
# ---------------------------------------------------------------------------

def _slabbed(step_block, step_chunk, slab, run_one):
    prev = np.int32(-1)
    for s0 in range(0, len(step_block), slab):
        sbs = np.asarray(step_block[s0 : s0 + slab], np.int32)
        sb = np.empty(len(sbs) + 1, np.int32)
        sb[0] = prev
        sb[1:] = sbs
        sc = np.empty(len(sbs) + 1, np.int32)
        sc[0] = 0
        sc[1:] = step_chunk[s0 : s0 + slab]
        run_one(jnp.asarray(sb), jnp.asarray(sc))
        prev = sbs[-1]


def dist_stream_pallas(P_blocks_np, step_block, step_chunk, tables_np,
                       tri_chunk: int, slab: int = 32768,
                       interpret: bool = None):
    """Drop-in for sdf_culled._dist_stream. Returns (out_d2 (B+1, M) f32,
    out_best (B+1, M) i32) device arrays. out_d2 rows the stream never
    visited stay +inf (as in the XLA version's carry init). interpret
    None = auto (interpreter on CPU, compiled on TPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, M, _ = P_blocks_np.shape
    _check_tiling(tri_chunk, M)
    p_packed = jnp.asarray(pack_points(P_blocks_np))
    tab = jnp.asarray(pack_dist_table(tables_np, tri_chunk))
    # state is (B+1, 1, M): Mosaic needs the blocked row to keep full
    # trailing (1, M) dims (see _dist_kernel docnote)
    state = [
        jnp.full((B + 1, 1, M), jnp.inf, F32),
        jnp.zeros((B + 1, 1, M), I32),
    ]

    def run_one(sb, sc):
        state[0], state[1] = _dist_slab_call(
            sb, sc, p_packed, state[0], state[1], tab, tri_chunk, M,
            interpret,
        )

    _slabbed(step_block, step_chunk, slab, run_one)
    return state[0][:, 0, :], state[1][:, 0, :]


def wind_stream_pallas(P_blocks_np, step_block, step_chunk, tables_np,
                       tri_chunk: int, slab: int = 32768,
                       interpret: bool = None):
    """Drop-in for sdf_culled._wind_stream. Returns out_omega (B+1, M).
    interpret None = auto (interpreter on CPU, compiled on TPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, M, _ = P_blocks_np.shape
    _check_tiling(tri_chunk, M)
    p_packed = jnp.asarray(pack_points(P_blocks_np))
    tab = jnp.asarray(pack_wind_table(tables_np, tri_chunk))
    state = [jnp.zeros((B + 1, 1, M), F32)]

    def run_one(sb, sc):
        state[0] = _wind_slab_call(
            sb, sc, p_packed, state[0], tab, tri_chunk, M, interpret
        )

    _slabbed(step_block, step_chunk, slab, run_one)
    return state[0][:, 0, :]


# ---------------------------------------------------------------------------
# Sharded streams: split point blocks over a device mesh
# ---------------------------------------------------------------------------

def _per_device_steps(step_block, step_chunk, B, n_dev):
    """Split block-major steps into per-device local schedules.

    Blocks are assigned contiguously (Morton-coherent blocks have similar
    surviving-chunk counts, so contiguous ranges balance well). Returns
    (sb (D, S_max+1), sc (D, S_max+1)) int32 with LOCAL block ids, each
    row led by the -1 sentinel and padded with local-sink (B_local) steps
    to a power-of-two common length."""
    B_local = B // n_dev
    sbs, scs = [], []
    s_max = 1
    for d in range(n_dev):
        lo, hi = d * B_local, (d + 1) * B_local
        sel = (step_block >= lo) & (step_block < hi)
        sbs.append(step_block[sel] - lo)
        scs.append(step_chunk[sel])
        s_max = max(s_max, len(sbs[-1]))
    s_max = 1 << max(0, (s_max - 1).bit_length())
    sb = np.full((n_dev, s_max + 1), B_local, np.int32)
    sc = np.zeros((n_dev, s_max + 1), np.int32)
    sb[:, 0] = -1
    for d in range(n_dev):
        n = len(sbs[d])
        sb[d, 1 : n + 1] = sbs[d]
        sc[d, 1 : n + 1] = scs[d]
    return sb, sc


def dist_stream_pallas_sharded(P_blocks_np, step_block, step_chunk,
                               tables_np, tri_chunk: int, mesh,
                               interpret: bool = None):
    """dist_stream over a device mesh: each device streams its contiguous
    range of point blocks with the triangle tables replicated. Returns
    host (B, M) arrays (d2, best)."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, M, _ = P_blocks_np.shape
    _check_tiling(tri_chunk, M)
    n_dev = mesh.devices.size
    assert B % n_dev == 0, (B, n_dev)
    B_local = B // n_dev
    sb, sc = _per_device_steps(step_block, step_chunk, B, n_dev)
    tab = pack_dist_table(tables_np, tri_chunk)
    p_packed = pack_points(P_blocks_np)

    shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def device_fn(sb_d, sc_d, p_d, tab_r):
        # shard_map passes local views: sb_d (1, S+1), p_d (B_local, 8, M)
        n_steps = sb_d.shape[1] - 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, M),
                    lambda i, sbr, scr: (
                        jnp.minimum(sbr[i + 1], B_local - 1), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1, M),
                             lambda i, sbr, scr: (sbr[i + 1], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M),
                             lambda i, sbr, scr: (sbr[i + 1], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, tri_chunk, _D_ROWS),
                    lambda i, sbr, scr: (scr[i + 1], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, M),
                             lambda i, sbr, scr: (sbr[i + 1], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M),
                             lambda i, sbr, scr: (sbr[i + 1], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        kernel = partial(_dist_kernel, tri_chunk=tri_chunk, m=M)
        outd0 = jnp.full((B_local + 1, 1, M), jnp.inf, F32)
        outb0 = jnp.zeros((B_local + 1, 1, M), I32)
        outd, outb = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B_local + 1, 1, M), F32),
                jax.ShapeDtypeStruct((B_local + 1, 1, M), I32),
            ],
            input_output_aliases={3: 0, 4: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(sb_d[0], sc_d[0], p_d, outd0, outb0, tab_r)
        return outd[None, :B_local, 0], outb[None, :B_local, 0]

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    outd, outb = fn(
        jax.device_put(jnp.asarray(sb), shard),
        jax.device_put(jnp.asarray(sc), shard),
        jax.device_put(jnp.asarray(p_packed), shard),
        jax.device_put(jnp.asarray(tab), repl),
    )
    return (np.asarray(outd).reshape(B, M),
            np.asarray(outb).reshape(B, M))


def wind_stream_pallas_sharded(P_blocks_np, step_block, step_chunk,
                               tables_np, tri_chunk: int, mesh,
                               interpret: bool = None):
    """wind_stream over a device mesh (see dist_stream_pallas_sharded)."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, M, _ = P_blocks_np.shape
    _check_tiling(tri_chunk, M)
    n_dev = mesh.devices.size
    assert B % n_dev == 0, (B, n_dev)
    B_local = B // n_dev
    sb, sc = _per_device_steps(step_block, step_chunk, B, n_dev)
    tab = pack_wind_table(tables_np, tri_chunk)
    p_packed = pack_points(P_blocks_np)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def device_fn(sb_d, sc_d, p_d, tab_r):
        n_steps = sb_d.shape[1] - 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, M),
                    lambda i, sbr, scr: (
                        jnp.minimum(sbr[i + 1], B_local - 1), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1, M),
                             lambda i, sbr, scr: (sbr[i + 1], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, tri_chunk, _W_ROWS),
                    lambda i, sbr, scr: (scr[i + 1], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, M),
                             lambda i, sbr, scr: (sbr[i + 1], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        kernel = partial(_wind_kernel, tri_chunk=tri_chunk, m=M)
        outw0 = jnp.zeros((B_local + 1, 1, M), F32)
        outw = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B_local + 1, 1, M), F32)],
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(sb_d[0], sc_d[0], p_d, outw0, tab_r)[0]
        return outw[None, :B_local, 0]

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    outw = fn(
        jax.device_put(jnp.asarray(sb), shard),
        jax.device_put(jnp.asarray(sc), shard),
        jax.device_put(jnp.asarray(p_packed), shard),
        jax.device_put(jnp.asarray(tab), repl),
    )
    return np.asarray(outw).reshape(B, M)
