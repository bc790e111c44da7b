"""Fully device-side, BLOCK-SPARSE marching tetrahedra.

Replaces the round-2 hybrid (device shell compaction + host tet core) for
device volumes. The reference extracts meshes on host via
skimage.measure.marching_cubes (reference executor/executor.py:388); at
512^3 the host core dominated the whole field->mesh pipeline (3.6 s healthy
vs 0.91 s for the sparse eval).

The design is shaped by one measured number: on the v5e, XLA issues random
gather/scatter ELEMENTS at ~110 M/s regardless of index locality (72 M/s
from >0.5 GB tables), while dense element-wise passes stream at HBM
bandwidth. The first device version spent 4.1 s at 512^3 almost entirely on
(a) a 132 M-candidate welding scatter, (b) ~130 M emission-stage gather
elements, and (c) a 27 M-element halo gather. Every stage below is therefore
organised to minimise TOTAL gather/scatter elements, not FLOPs or bytes:

  1. LIVE-BLOCK DETECTION (full volume, bandwidth-only ops): the volume is
     partitioned into 8^3-point core blocks; a block is live iff its 9^3
     corner region (core + 1-point halo) contains both signs — per-core
     any/all reductions OR-ed with the 7 +neighbours (a superset of the
     exact straddle, never a miss).
  2. HALO GATHER, dense-blocked: instead of 27 M element gathers, build the
     overlapped (nb^3, 9^3) block tensor with three pad+reshape+concat
     passes (pure bandwidth) and fetch live blocks with contiguous ROW
     gathers (measured 5x over the element-gather form).
  3. PER-CORE EDGE BITMASKS: every tet edge of the 6-tet decomposition
     connects g and g+d for one of 7 ascending directions d; the pair
     (lo grid point, d) is a globally unique vertex id OWNED by the live
     block whose core contains lo. Each core's 7 live-edge bits live in one
     int32 next to the core's global vertex base:  CW = cvbase << 7 | bits.
     One gather of CW answers "vertex index of edge (lo, d)" for both the
     welding AND the face emission (base + popcount of the bits below d).
  4. COMPACTION by OUTPUT-sized set-bit enumeration (pack the live-core /
     mixed-cube masks into 32-bit words, per-word popcount prefix, route
     output slots to words with a word-count scatter + cummax, unrolled
     in-word bit-rank scan): 2*(19M/32) + out_max scatter/gather elements
     where the round-3 input-sized scatters paid 19 M each. Vertices and
     triangles are then enumerated by SEGMENT EXPANSION: scatter each
     segment's start (c_max / m_max elements, unique and sorted) and run a
     1-D cummax over the output — O(out) instead of O(candidates). The
     132 M-element vertex scatter is gone.
  5. EMISSION: ~10 gather elements per triangle (cube record, packed
     per-(tet,case,k) edge table, block id, and 2 per edge: inverse block
     map + CW), everything else element-wise decode.

Host receives packed vertices (slot = gid*7 + d, t) and faces, unpacks
positions with three vector ops, and writes the STL.

Exact parity: identical predicates (s = vol <= level everywhere), identical
f32 interpolation arithmetic and identical case / flip tables make the
triangle soup equal to ops.marching's host path up to vertex/triangle
ORDER (tests canonicalize).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import numpy as np

from .marching import _CASE_TRIS, _CORNERS, _FLIP_TABLE, _TET_EDGES, _TETS

# Sorted scatter-max compaction (legacy): compaction targets are the
# inclusive-rank prefix minus one, which is NON-DECREASING across the whole
# flattened array, so the scatter can declare indices_are_sorted=True; dead
# entries write -1 at their predecessor's slot and lose the max() to the
# live writer. An arbitrary-index .at[].set() over the same index space
# forces XLA's serialized scatter path.
_SORTED_SCATTER = os.environ.get("MARCH_SORTED_SCATTER", "1") != "0"

# Compaction strategy. Both enumerate the positions of set mask bits into a
# dense (out_max,) prefix:
#   words (default) — OUTPUT-sized: pack the mask into 32-bit words
#     (bandwidth-only), per-word popcount prefix over nflat/32 words, one
#     word-count scatter + cummax to route each output slot to its word,
#     then a 32-step elementwise bit-rank scan. Scatter/gather elements:
#     2*(nflat/32) + out_max, vs the INPUT-sized nflat of the legacy path —
#     ~3x fewer at 512^3 (out_max is the live subset; the TPU issues
#     gather/scatter elements at ~110 M/s regardless of locality, so element
#     count is the cost model — see module docstring).
#   scatter — the legacy input-sized scatter above (MARCH_COMPACT=scatter
#     for A/B runs).
_COMPACT_MODE = os.environ.get("MARCH_COMPACT", "words")

# the 7 ascending edge directions; direction index = corner-bit pattern - 1
# (corner id encodes (x,y,z) as x*4+y*2+z, so _CORNERS[1:] enumerates them)
_DIRS = _CORNERS[1:].copy()  # (7, 3)

_B = 8  # core block edge (points); halo region is (B+1)^3


def _build_static_tables():
    """ntris (16,) triangles per case, and a PACKED per-(tet, case, k) edge
    table (192,) int32: bits [6j .. 6j+2] = cube-corner id of edge j's low
    endpoint, bits [6j+3 .. 6j+5] = direction index, bit 18 = orientation
    flip (from marching._FLIP_TABLE). lo corner = a & b and direction =
    (a ^ b) - 1 hold because corner ids are bit-packed coordinates and all
    decomposition edges ascend. One gather decodes a whole triangle."""
    ntris = np.zeros(16, np.int32)
    for case_id, tris in _CASE_TRIS.items():
        ntris[case_id] = len(tris)
    ptbl = np.zeros((6, 16, 2), np.int64)
    for tet in range(6):
        for case_id, tris in _CASE_TRIS.items():
            for k, tri in enumerate(tris):
                packed = 0
                for j, e in enumerate(tri):
                    a = _TETS[tet][_TET_EDGES[e][0]]
                    b = _TETS[tet][_TET_EDGES[e][1]]
                    lo = int(a & b)
                    d = int(a ^ b) - 1
                    packed |= lo << (6 * j)
                    packed |= d << (6 * j + 3)
                if _FLIP_TABLE[tet, case_id, k]:
                    packed |= 1 << 18
                ptbl[tet, case_id, k] = packed
    return ntris, ptbl.reshape(192).astype(np.int32)


_NTRIS_NP, _PTBL_NP = _build_static_tables()

_H = _B + 1

_MARCH_DEVICE = None


def _get_march_device():
    """Lazily-built jitted extractor (keeps the module importable without
    touching the accelerator)."""
    global _MARCH_DEVICE
    if _MARCH_DEVICE is not None:
        return _MARCH_DEVICE

    import jax
    import jax.numpy as jnp

    ntris_t = jnp.asarray(_NTRIS_NP)
    ptbl_t = jnp.asarray(_PTBL_NP)

    # static per-core index tables into the 9^3 halo region; core-major
    # flat order lflat = (li*8 + lj)*8 + lk matches every div/mod decode
    li, lj, lk = np.meshgrid(
        np.arange(_B), np.arange(_B), np.arange(_B), indexing="ij"
    )
    li, lj, lk = li.ravel(), lj.ravel(), lk.ravel()
    core_flat = (li * _H + lj) * _H + lk  # (512,) core -> halo-region flat
    hi_flat = np.stack(
        [((li + dx) * _H + (lj + dy)) * _H + (lk + dz) for dx, dy, dz in _DIRS]
    )  # (7, 512)
    corner_flat = np.stack(
        [((li + dx) * _H + (lj + dy)) * _H + (lk + dz) for dx, dy, dz in _CORNERS]
    )  # (8, 512) cube-corner lookup per core cube base

    def _blockify(a, axis, nfull):
        """Axis of extent nfull+1 -> (nfull//B, B+1) overlapped blocks via
        reshape + strided edge plane (bandwidth-only, no gathers)."""
        nb = nfull // _B
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, nfull)
        core = a[tuple(sl)]
        shp = list(core.shape)
        shp[axis : axis + 1] = [nb, _B]
        core = core.reshape(shp)
        sl2 = [slice(None)] * a.ndim
        sl2[axis] = slice(_B, None, _B)
        edge = a[tuple(sl2)]
        shp2 = list(edge.shape)
        shp2[axis : axis + 1] = [nb, 1]
        edge = edge.reshape(shp2)
        return jnp.concatenate([core, edge], axis=axis + 1)

    def _popcount7(x):
        """Popcount of a 7-bit int32 field, element-wise."""
        c = x & 1
        for b in range(1, 7):
            c = c + ((x >> b) & 1)
        return c

    def _compact_scatter(mask_flat, out_max):
        """Legacy input-sized scatter enumeration of set-bit positions.
        Returns (positions (out_max,), count)."""
        nflat = mask_flat.shape[0]
        src_flat = jnp.arange(nflat, dtype=jnp.int32)
        pi = jnp.cumsum(mask_flat.astype(jnp.int32))
        count = pi[-1]
        if _SORTED_SCATTER:
            tgt = pi - 1
            src = jnp.where(mask_flat, src_flat, -1)
            out = (
                jnp.zeros((out_max,), jnp.int32)
                .at[tgt]
                .max(src, mode="drop", indices_are_sorted=True)
            )
        else:
            tgt = jnp.where(mask_flat, pi - 1, out_max)
            out = (
                jnp.zeros((out_max,), jnp.int32)
                .at[tgt]
                .set(src_flat, mode="drop")
            )
        return out, count

    def _compact_words(mask_flat, out_max):
        """Output-sized set-bit enumeration over packed 32-bit words.
        Returns (positions (out_max,), count); positions beyond count are
        deterministic garbage masked by the caller's live-row predicate,
        exactly like the scatter path's untouched zeros.

        The mask is reduced to nflat/32 words (bandwidth-only pass); only
        live words (popcount > 0) scatter their (word id, vertex base) at
        their first output slot — bases are strictly increasing over live
        words, so both scatters are sorted+unique — and two cummax sweeps
        route every output slot to its containing word. The in-word rank is
        then resolved by the same unrolled bit-rank scan stage 5 uses for
        edge directions (elementwise VPU work, no memory traffic)."""
        nflat = mask_flat.shape[0]  # b_max*512: always a multiple of 32
        bits = mask_flat.reshape(nflat // 32, 32)
        nw = bits.shape[0]
        weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        words = jnp.sum(
            bits.astype(jnp.uint32) * weights[None, :], axis=1,
            dtype=jnp.uint32,
        )  # (nw,)
        pc = jnp.sum(bits, axis=1, dtype=jnp.int32)  # (nw,)
        cume = jnp.cumsum(pc)
        count = cume[-1]
        base = cume - pc  # exclusive set-bit prefix per word
        slot = jnp.where(pc > 0, base, out_max)  # dead words drop
        # NOTE: no indices_are_sorted/unique_indices hints — the sentinel
        # rows make `slot` neither monotone nor duplicate-free, and lying
        # to XLA about scatter indices is implementation-defined on TPU.
        # The scatter is word-count-sized (nflat/32 elements), so the
        # unhinted lowering costs ~nothing next to the output-sized work.
        wid = jax.lax.cummax(
            jnp.zeros((out_max,), jnp.int32)
            .at[slot]
            .max(jnp.arange(nw, dtype=jnp.int32), mode="drop")
        )
        bse = jax.lax.cummax(
            jnp.zeros((out_max,), jnp.int32)
            .at[slot]
            .max(base, mode="drop")
        )
        r = jnp.arange(out_max, dtype=jnp.int32) - bse  # in-word rank
        w = words[wid]  # (out_max,) gather — the only output-sized traffic
        cnt = jnp.zeros((out_max,), jnp.int32)
        b_out = jnp.zeros((out_max,), jnp.int32)
        for b in range(32):
            bit = ((w >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int32)
            cnt = cnt + bit
            b_out = jnp.where((bit == 1) & (cnt == r + 1), b, b_out)
        return wid * 32 + b_out, count

    _compact = (
        _compact_words if _COMPACT_MODE == "words" else _compact_scatter
    )

    def _expand(starts, values, mask, out_max):
        """Segment expansion: out[i] = values[s] for the last segment s with
        starts[s] <= i. starts must be strictly increasing over kept (mask)
        entries and values non-decreasing. O(len(starts) + out_max) — this
        replaces candidate-space scatters for vertex/triangle enumeration."""
        idx = jnp.where(mask, starts, out_max)
        seeded = (
            jnp.zeros((out_max,), jnp.int32)
            .at[idx]
            .set(values, mode="drop", indices_are_sorted=_SORTED_SCATTER,
                 unique_indices=_SORTED_SCATTER)
        )
        return jax.lax.cummax(seeded)

    def _stages15(vol, level, b_max, c_max, v_max):
        """Stages 1-5 (live blocks, halo gather, edge bits, live-core
        compaction, vertex t) — shared by the full extractor and the
        packed-wire variant."""
        nx, ny, nz = vol.shape
        nbx, nby, nbz = -(-nx // _B), -(-ny // _B), -(-nz // _B)
        nb3 = nbx * nby * nbz
        s = vol <= level  # inside mask; same predicate everywhere

        # ---- 1. live-block detection (bandwidth-only full-volume ops) ----
        px, py, pz = nbx * _B - nx, nby * _B - ny, nbz * _B - nz
        sp = jnp.pad(s, ((0, px), (0, py), (0, pz)), mode="edge")
        sb = sp.reshape(nbx, _B, nby, _B, nbz, _B)
        core_in = jnp.any(sb, axis=(1, 3, 5))  # has an inside point
        core_out = jnp.any(~sb, axis=(1, 3, 5))  # has an outside point

        def _union_fwd(x):
            u = x
            for dx, dy, dz in _DIRS:
                shifted = jnp.pad(
                    x[dx:, dy:, dz:], ((0, dx), (0, dy), (0, dz)),
                    constant_values=False,
                )
                u = u | shifted
            return u

        live = (_union_fwd(core_in) & _union_fwd(core_out)).reshape(-1)
        count_b = jnp.sum(live, dtype=jnp.int32)
        (bids,) = jnp.nonzero(live, size=b_max, fill_value=nb3)
        bids = bids.astype(jnp.int32)
        live_row = jnp.arange(b_max, dtype=jnp.int32) < count_b
        bx = bids // (nby * nbz)
        by = (bids // nbz) % nby
        bz = bids % nbz
        gx0, gy0, gz0 = bx * _B, by * _B, bz * _B

        # inverse map block id -> live row (for neighbour-owned vertices)
        inv_block = (
            jnp.zeros((nb3 + 1,), jnp.int32)
            .at[jnp.where(live_row, bids, nb3)]
            .set(jnp.arange(b_max, dtype=jnp.int32), mode="drop")[:nb3]
        )

        # ---- 2. dense-blocked halo tensor + contiguous row gather --------
        # pad the ragged tail with edge values (same values the old
        # min(coord, n-1) element-gather clamped to), then +1 edge plane
        vp = jnp.pad(vol, ((0, px + 1), (0, py + 1), (0, pz + 1)), mode="edge")
        blk = _blockify(vp, 0, nbx * _B)  # (nbx, 9, ny+1, nz+1)
        blk = _blockify(blk, 2, nby * _B)  # (nbx, 9, nby, 9, nz+1)
        blk = _blockify(blk, 4, nbz * _B)  # (nbx, 9, nby, 9, nbz, 9)
        dense = jnp.transpose(blk, (0, 2, 4, 1, 3, 5)).reshape(
            nb3, _H * _H * _H
        )
        volg = dense[jnp.minimum(bids, nb3 - 1)]  # (b_max, 729) row gather
        sgb = volg <= level

        # ---- 3. per-core live-edge bitmasks + packed CW ------------------
        s_lo = sgb[:, core_flat]  # (b_max, 512)
        # per-axis bound masks once instead of 3 broadcast compares per
        # direction: an edge (lo, d) is in range iff lo+d is (which also
        # keeps lo itself inside ragged-tail padding on axes where the
        # direction component is 0 — c0/c1 pairs below cover both cases)
        okx1 = gx0[:, None] + (li + 1)[None, :] <= nx - 1
        oky1 = gy0[:, None] + (lj + 1)[None, :] <= ny - 1
        okz1 = gz0[:, None] + (lk + 1)[None, :] <= nz - 1
        okx0 = gx0[:, None] + li[None, :] <= nx - 1
        oky0 = gy0[:, None] + lj[None, :] <= ny - 1
        okz0 = gz0[:, None] + lk[None, :] <= nz - 1
        Lbits = jnp.zeros(s_lo.shape, jnp.int32)
        for d, (dx, dy, dz) in enumerate(_DIRS):
            ld = s_lo != sgb[:, hi_flat[d]]
            ok_d = (
                live_row[:, None]
                & (okx1 if dx else okx0)
                & (oky1 if dy else oky0)
                & (okz1 if dz else okz0)
            )
            Lbits = Lbits | jnp.where(ld & ok_d, jnp.int32(1 << d), 0)
        ncf = _popcount7(Lbits).reshape(-1)  # (b_max*512,)
        excg = jnp.cumsum(ncf)  # global inclusive vertex prefix (core-major)
        count_v = excg[-1]
        cvbase = excg - ncf  # exclusive global vertex base per core
        # packed core word; cvbase < v_max <= 2^23 (grids are capped at
        # ~645^3 by the int32 slot space), bits fit in the low 7
        CWf = (cvbase << 7) | Lbits.reshape(-1)  # (b_max*512,) int32

        # ---- 4. live-core compaction (set-bit enumeration) ---------------
        corelive = (Lbits > 0).reshape(-1)
        crec, count_c = _compact(corelive, c_max)
        clive = jnp.arange(c_max, dtype=jnp.int32) < count_c

        # ---- 5. vertices via segment expansion ---------------------------
        cw_c = CWf[crec]  # (c_max,)
        vrow = _expand(cw_c >> 7, crec, clive, v_max)  # per-vertex core flat
        cw_v = CWf[vrow]
        base_v = cw_v >> 7
        bits_v = cw_v & 127
        r_v = jnp.arange(v_max, dtype=jnp.int32) - base_v  # rank within core
        # d of the (r_v+1)-th set bit (element-wise unrolled scan)
        cnt = jnp.zeros((v_max,), jnp.int32)
        d_v = jnp.zeros((v_max,), jnp.int32)
        for d in range(7):
            bit = (bits_v >> d) & 1
            cnt = cnt + bit
            d_v = jnp.where((bit == 1) & (cnt == r_v + 1), d, d_v)
        row_v = vrow // 512
        lflat_v = vrow % 512
        bid_v = bids[row_v]
        lxv, lyv, lzv = lflat_v // 64, (lflat_v // 8) % 8, lflat_v % 8
        gxv = (bid_v // (nby * nbz)) * _B + lxv
        gyv = ((bid_v // nbz) % nby) * _B + lyv
        gzv = (bid_v % nbz) * _B + lzv
        gid_v = (gxv * ny + gyv) * nz + gzv
        vslots = gid_v * 7 + d_v
        # endpoint values from the COMPACTED halo rows (both ends of any
        # core-owned edge lie in the 9^3 region; the (b_max, 729) table
        # gathers ~1.5x faster than the full volume)
        dxv = (d_v + 1) >> 2
        dyv = ((d_v + 1) >> 1) & 1
        dzv = (d_v + 1) & 1
        lo_h = (lxv * _H + lyv) * _H + lzv
        hi_h = ((lxv + dxv) * _H + (lyv + dyv)) * _H + (lzv + dzv)
        volg_flat = volg.reshape(-1)
        va = volg_flat[row_v * (_H * _H * _H) + lo_h]
        vb = volg_flat[row_v * (_H * _H * _H) + hi_h]
        denom = vb - va
        t = jnp.where(denom != 0, (level - va) / denom, jnp.float32(0.5))
        t = jnp.clip(t, 0.0, 1.0).astype(jnp.float32)

        return dict(
            nx=nx, ny=ny, nz=nz, nbx=nbx, nby=nby, nbz=nbz,
            bids=bids, live_row=live_row, inv_block=inv_block,
            gx0=gx0, gy0=gy0, gz0=gz0, sgb=sgb, CWf=CWf,
            vslots=vslots, t=t,
            count_b=count_b, count_c=count_c, count_v=count_v,
        )

    @partial(
        jax.jit,
        static_argnames=("b_max", "c_max", "m_max", "v_max", "t_max"),
    )
    def _march(vol, level, b_max, c_max, m_max, v_max, t_max):
        st = _stages15(vol, level, b_max, c_max, v_max)
        nx, ny, nz = st["nx"], st["ny"], st["nz"]
        nby, nbz = st["nby"], st["nbz"]
        bids, live_row = st["bids"], st["live_row"]
        inv_block, CWf, sgb = st["inv_block"], st["CWf"], st["sgb"]
        gx0, gy0, gz0 = st["gx0"], st["gy0"], st["gz0"]

        # ---- 6. mixed cubes ----------------------------------------------
        cube_ok = (
            (gx0[:, None] + li[None, :] <= nx - 2)
            & (gy0[:, None] + lj[None, :] <= ny - 2)
            & (gz0[:, None] + lk[None, :] <= nz - 2)
            & live_row[:, None]
        )  # (b_max, 512) valid cube bases
        inside_corner = [sgb[:, corner_flat[c]] for c in range(8)]
        casepack = jnp.zeros((b_max, 512), jnp.int32)
        for tet in range(6):
            cs = None
            for bit, corner in enumerate(_TETS[tet]):
                term = inside_corner[int(corner)].astype(jnp.int32) << bit
                cs = term if cs is None else cs + term
            casepack = casepack | (cs << (4 * tet))
        ntr_total = None
        for tet in range(6):
            ntr = ntris_t[(casepack >> (4 * tet)) & 15]
            ntr_total = ntr if ntr_total is None else ntr_total + ntr
        ntr_flat = jnp.where(cube_ok, ntr_total, 0).reshape(-1)
        count_t = jnp.sum(ntr_flat)
        troff_flat = jnp.cumsum(ntr_flat) - ntr_flat
        mrec, count_m = _compact(ntr_flat > 0, m_max)
        mlive = jnp.arange(m_max, dtype=jnp.int32) < count_m
        troff_m = troff_flat[mrec]
        cases_m = casepack.reshape(-1)[mrec]
        bid_m = bids[mrec // 512]
        # one row-gather per triangle instead of three element gathers
        recs = jnp.stack([mrec, cases_m, bid_m], axis=1)  # (m_max, 3)

        # ---- 7. triangles via segment expansion --------------------------
        trow = _expand(troff_m, jnp.arange(m_max, dtype=jnp.int32), mlive,
                       t_max)  # per-triangle mixed-cube row
        troff_t = _expand(troff_m, troff_m, mlive, t_max)
        rtri = jnp.arange(t_max, dtype=jnp.int32) - troff_t  # rank in cube
        rec3 = recs[trow]  # (t_max, 3)
        rec_t = rec3[:, 0]
        cases_t = rec3[:, 1]
        bid_t = rec3[:, 2]
        # decode (tet, k) from the within-cube rank via running counts
        low = jnp.zeros((t_max,), jnp.int32)
        tet_t = jnp.zeros((t_max,), jnp.int32)
        k_t = jnp.zeros((t_max,), jnp.int32)
        for tet in range(6):
            nt = ntris_t[(cases_t >> (4 * tet)) & 15]
            hit = (rtri >= low) & (rtri < low + nt)
            tet_t = jnp.where(hit, tet, tet_t)
            k_t = jnp.where(hit, rtri - low, k_t)
            low = low + nt
        case_t = (cases_t >> (4 * tet_t)) & 15
        pt = ptbl_t[(tet_t * 16 + case_t) * 2 + k_t]

        # ---- 8. emission: resolve the 3 edge vertices --------------------
        lcube = rec_t % 512
        bx_t = bid_t // (nby * nbz)
        by_t = (bid_t // nbz) % nby
        bz_t = bid_t % nbz
        lx_t, ly_t, lz_t = lcube // 64, (lcube // 8) % 8, lcube % 8
        cols = []
        for j in range(3):
            lo_c = (pt >> (6 * j)) & 7  # cube-corner id 0..7
            d_e = (pt >> (6 * j + 3)) & 7
            cx, cy, cz = lo_c >> 2, (lo_c >> 1) & 1, lo_c & 1
            lxe, lye, lze = lx_t + cx, ly_t + cy, lz_t + cz  # 0..8
            obx = bx_t + (lxe >> 3)
            oby = by_t + (lye >> 3)
            obz = bz_t + (lze >> 3)
            owner = inv_block[(obx * nby + oby) * nbz + obz]
            lslot = ((lxe & 7) * 8 + (lye & 7)) * 8 + (lze & 7)
            cwe = CWf[owner * 512 + lslot]
            rank = _popcount7((cwe & 127) & ((jnp.int32(1) << d_e) - 1))
            cols.append((cwe >> 7) + rank)
        flips = (pt >> 18) & 1
        f0 = jnp.where(flips == 1, cols[2], cols[0])
        f2 = jnp.where(flips == 1, cols[0], cols[2])
        return (
            st["vslots"], st["t"], f0, cols[1], f2,
            st["count_b"], st["count_c"], count_m, st["count_v"], count_t,
        )

    @partial(jax.jit, static_argnames=("b_max", "c_max", "v_max"))
    def _march_packed(vol, level, b_max, c_max, v_max):
        """Packed-wire variant: run stages 1-5 only and return
        (sign bits of the live halo blocks, u16-quantized edge t, live
        block ids, counts). Faces and vertex ids are PURE TOPOLOGY — exact
        functions of the sign bits — so the host rebuilds them from ~1
        bit/sample instead of fetching 12 B/face + 8 B/vertex (see
        decode_packed_wire). Skips the mixed-cube + emission stages
        (~10 gather elements/triangle) on device entirely."""
        st = _stages15(vol, level, b_max, c_max, v_max)
        sgb = st["sgb"]  # (b_max, 729) bool
        pad = (-sgb.shape[1]) % 32
        bits = jnp.pad(sgb, ((0, 0), (0, pad))).reshape(b_max, -1, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        words = jnp.sum(
            bits.astype(jnp.uint32) * weights[None, None, :], axis=-1,
            dtype=jnp.uint32,
        )  # (b_max, ceil(729/32))
        t_q = jnp.round(st["t"] * 65535.0).astype(jnp.uint16)
        return (
            words, t_q, st["bids"],
            st["count_b"], st["count_c"], st["count_v"],
        )

    _MARCH_DEVICE = (_march, _march_packed)
    return _MARCH_DEVICE


# settled (b_max, c_max, m_max, v_max, t_max) budgets per volume shape —
# same recompile-bounding trick as ops/sparse_grid._KMAX_CACHE
_BUDGET_CACHE: dict = {}


def _quantize(x: int, q: int = 4096) -> int:
    """Round up to a coarse quantum: keeps budget growth at ~1.25x (the
    compaction scatters and the v/t-length scans scale LINEARLY with the
    budget, so pow2 doubling wasted up to 2x of the whole extraction) while
    still bounding the number of distinct compiled shapes."""
    return -(-int(x) // q) * q


def _run_with_budget_growth(key, nb3, m2, attempt):
    """Shared budget-cache/grow loop for both wire paths.

    attempt(b_max, c_max, m_max, v_max, t_max) -> (counts, result) where
    counts maps a subset of "bcmvt" to the live counts this attempt
    produced. Grows overflowed budgets by 1.25x (quantized) and retries;
    guards the packed core word's 2^24-vertex ceiling BEFORE accepting a
    pass (a cached budget large enough to hold >16.7M vertices would
    otherwise succeed with cvbase << 7 already wrapped in int32); caches
    the settled budgets per volume shape."""
    budgets = list(_BUDGET_CACHE.get(
        key,
        (
            min(nb3, _quantize(m2 // 8 + 512, 1024)),
            _quantize(5 * m2),
            _quantize(5 * m2),
            _quantize(14 * m2),
            _quantize(27 * m2),
        ),
    ))
    while True:
        counts, result = attempt(*budgets)
        cv = counts.get("v")
        if cv is not None and cv > 1 << 24:
            raise ValueError(
                f"{cv} vertices overflow the packed core-word budget "
                "(2^24); extract in sub-volumes (ops/giga_extract)"
            )
        grew = False
        for i, name in enumerate("bcmvt"):
            c = counts.get(name)
            if c is not None and c > budgets[i]:
                grew = True
                if name == "b":
                    budgets[i] = min(nb3, _quantize(c * 1.25, 1024))
                else:
                    budgets[i] = _quantize(c * 1.25)
        if not grew:
            _BUDGET_CACHE[key] = tuple(budgets)
            return result


def marching_tets_device(vol, level: float = 0.0):
    """Run the device extractor with budget growth.

    Returns host arrays (vslots (V,) int32, t (V,) f32, faces (T, 3) int32).
    vslots encodes (grid point gid)*7 + direction; decode with
    ``decode_vertices``.
    """
    import jax.numpy as jnp

    nx, ny, nz = vol.shape
    if nx * ny * nz * 7 >= 2**31:
        raise ValueError(
            f"grid {vol.shape} exceeds the int32 slot space (max ~645^3)"
        )
    nbx, nby, nbz = -(-nx // _B), -(-ny // _B), -(-nz // _B)
    nb3 = nbx * nby * nbz
    key = vol.shape
    # surface heuristics (measured at 512^3 on the random-init flagship:
    # 33.5k live blocks, live cores ~4.6 n^2, mixed cubes ~4.6 n^2,
    # V ~ 13 n^2, T ~ 26 n^2); slight over-provision avoids a growth
    # recompile on typical fields, 1.25x quantized growth handles
    # pathological ones
    m2 = max(nx, ny, nz) ** 2
    fn = _get_march_device()[0]

    def attempt(b_max, c_max, m_max, v_max, t_max):
        out = fn(vol, jnp.float32(level), b_max, c_max, m_max, v_max, t_max)
        cb, cc, cm, cv, ct = (int(x) for x in out[5:])
        return {"b": cb, "c": cc, "m": cm, "v": cv, "t": ct}, (
            out[:5], cv, ct,
        )

    (vslots, t, f0, f1, f2), cv, ct = _run_with_budget_growth(
        key, nb3, m2, attempt
    )
    vslots_h = np.asarray(vslots[:cv], dtype=np.int64)
    t_h = np.asarray(t[:cv], dtype=np.float64)
    faces_h = np.stack(
        [np.asarray(c[:ct], dtype=np.int64) for c in (f0, f1, f2)], axis=1
    )
    return vslots_h, t_h, faces_h


_IDX_TABLES = None


def _index_tables():
    """(li, lj, lk, core_flat, hi_flat, corner_flat) — the same static
    core->halo index tables the device kernels close over (host copy for
    decode_packed_wire)."""
    global _IDX_TABLES
    if _IDX_TABLES is None:
        li, lj, lk = np.meshgrid(
            np.arange(_B), np.arange(_B), np.arange(_B), indexing="ij"
        )
        li, lj, lk = li.ravel(), lj.ravel(), lk.ravel()
        core_flat = (li * _H + lj) * _H + lk
        hi_flat = np.stack(
            [((li + dx) * _H + (lj + dy)) * _H + (lk + dz)
             for dx, dy, dz in _DIRS]
        )
        corner_flat = np.stack(
            [((li + dx) * _H + (lj + dy)) * _H + (lk + dz)
             for dx, dy, dz in _CORNERS]
        )
        _IDX_TABLES = (li, lj, lk, core_flat, hi_flat, corner_flat)
    return _IDX_TABLES


_WIRE_LIB = None  # None = untried; False = unavailable; else bound CDLL


def _get_wire_lib():
    """The native packed-wire decoder (native/src/wire_decode.cpp) inside
    build/libsdfnet_c.so, or None. The numpy decode below is the reference
    implementation and the fallback; SDF_WIRE_DECODE=numpy forces it (the
    parity tests A/B the two). SDF_WIRE_LIB overrides the library path."""
    global _WIRE_LIB
    if _WIRE_LIB is not None:
        return _WIRE_LIB or None
    if os.environ.get("SDF_WIRE_DECODE", "native") != "native":
        _WIRE_LIB = False
        return None
    import ctypes

    path = os.environ.get("SDF_WIRE_LIB")
    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo, "build", "libsdfnet_c.so")
    try:
        lib = ctypes.CDLL(path)
        lib.sdfnet_wire_decode  # older builds lack the symbol
    except (OSError, AttributeError):
        _WIRE_LIB = False
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sdfnet_wire_decode.restype = ctypes.c_void_p
    lib.sdfnet_wire_decode.argtypes = [
        u32p, ctypes.c_int64, ctypes.c_int32, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p, i64p, i64p,
    ]
    lib.sdfnet_wire_fetch.restype = ctypes.c_int
    lib.sdfnet_wire_fetch.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.sdfnet_wire_free.argtypes = [ctypes.c_void_p]
    lib.sdfnet_wire_last_error.restype = ctypes.c_char_p
    _WIRE_LIB = lib
    return lib


def _decode_packed_wire_native(words, t_q, bids, shape):
    """decode_packed_wire through the C++ decoder; None if unavailable.
    Same tables, same arithmetic, same enumeration order — outputs are
    np.array_equal with the numpy path (tests/test_marching.py)."""
    lib = _get_wire_lib()
    if lib is None:
        return None
    import ctypes

    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    w = np.ascontiguousarray(np.asarray(words, np.uint32))
    bids64 = np.ascontiguousarray(np.asarray(bids, np.int64))
    tabs = [np.ascontiguousarray(a.astype(np.int32)) for a in
            (_DIRS, _CORNERS, _TETS, _NTRIS_NP, _PTBL_NP)]
    vc, tc = ctypes.c_int64(0), ctypes.c_int64(0)
    h = lib.sdfnet_wire_decode(
        w.ctypes.data_as(u32p), len(bids64), w.shape[1],
        bids64.ctypes.data_as(i64p),
        int(shape[0]), int(shape[1]), int(shape[2]),
        *(a.ctypes.data_as(i32p) for a in tabs),
        ctypes.byref(vc), ctypes.byref(tc),
    )
    if not h:
        raise RuntimeError(
            f"native wire decode: {lib.sdfnet_wire_last_error().decode()}"
        )
    try:
        vslots = np.empty(vc.value, np.int64)
        faces = np.empty((tc.value, 3), np.int64)
        lib.sdfnet_wire_fetch(
            h, vslots.ctypes.data_as(i64p), faces.ctypes.data_as(i64p)
        )
    finally:
        lib.sdfnet_wire_free(h)
    return vslots, np.asarray(t_q, np.float64) / 65535.0, faces


_POP7 = np.array([bin(i).count("1") for i in range(128)], np.uint8)
# ascending set-bit positions per 7-bit value (padded with 0): vectorized
# set-bit enumeration without a python-level nonzero over an (N, 7) blowup
_DPOS7 = np.zeros((128, 7), np.int8)
for _v in range(128):
    _bits = [_d for _d in range(7) if (_v >> _d) & 1]
    _DPOS7[_v, : len(_bits)] = _bits
del _v, _bits
_NTRIS_U8 = _NTRIS_NP.astype(np.uint8)


def decode_packed_wire(words, t_q, bids, shape):
    """Rebuild (vslots, t, faces) from the packed wire (host, vectorized).

    The wire carries ONLY the per-live-block sign bits (~1 bit/sample),
    u16-quantized edge parameters, and the live block ids; every vertex id
    and face index is a pure function of the sign bits, recomputed here
    with the IDENTICAL arithmetic as the device stages 3-8 — topology is
    exactly equal to the unpacked path, vertex positions within the u16
    quantum (1/65535 of a cell edge). Cuts the D2H wire ~10x at 512^3
    (109 MB -> ~10 MB) and lets the device skip the mixed-cube + emission
    stages. Role match: the STL deliverable fetch of reference
    executor/executor.py:388-400.

    Hot-path layout (round 4, ~5x over the first version): the whole
    per-core sweep runs in uint8/int32 (the original all-int64 passes moved
    ~1.2 GB at 512^3), sign bits expand via np.unpackbits, vertices
    enumerate through the _DPOS7 set-bit-position table instead of an
    (N, 7) np.nonzero blowup, and tet cases stay in six per-tet uint8
    arrays (gathered per mixed cube) instead of one packed 24-bit word."""
    nx, ny, nz = (int(v) for v in shape)
    nbx, nby, nbz = -(-nx // _B), -(-ny // _B), -(-nz // _B)
    nb3 = nbx * nby * nbz
    li, lj, lk, core_flat, hi_flat, corner_flat = _index_tables()
    li32 = li.astype(np.int32)
    lj32 = lj.astype(np.int32)
    lk32 = lk.astype(np.int32)
    bids = np.asarray(bids, np.int64)
    L = len(bids)
    if L == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.float64),
                np.zeros((0, 3), np.int64))
    native = _decode_packed_wire_native(words, t_q, bids, shape)
    if native is not None:
        return native
    w = np.ascontiguousarray(np.asarray(words, np.uint32))
    # little-endian uint32 words: flattened halo bit k == unpacked bit k
    sgb = np.unpackbits(
        w.view(np.uint8), axis=1, bitorder="little"
    )[:, : _H * _H * _H]  # (L, 729) uint8 in {0, 1}

    bx = (bids // (nby * nbz)).astype(np.int32)
    by = ((bids // nbz) % nby).astype(np.int32)
    bz = (bids % nbz).astype(np.int32)

    # ---- stage 3: per-core live-edge bitmasks (same masks as device) ----
    # coordinate planes reused by the bound masks AND cube_ok below
    gxc = (bx * _B)[:, None] + li32[None, :]
    gyc = (by * _B)[:, None] + lj32[None, :]
    gzc = (bz * _B)[:, None] + lk32[None, :]
    okx0, okx1 = gxc <= nx - 1, gxc <= nx - 2
    oky0, oky1 = gyc <= ny - 1, gyc <= ny - 2
    okz0, okz1 = gzc <= nz - 1, gzc <= nz - 2
    s_lo = sgb[:, core_flat]
    Lbits = np.zeros((L, 512), np.uint8)
    for d, (dx, dy, dz) in enumerate(_DIRS):
        ld = s_lo != sgb[:, hi_flat[d]]
        ok_d = ((okx1 if dx else okx0) & (oky1 if dy else oky0)
                & (okz1 if dz else okz0))
        Lbits += (ld & ok_d).astype(np.uint8) * np.uint8(1 << d)
    lf = Lbits.reshape(-1)  # (L*512,) uint8

    # ---- vertices: row-major (core, direction) enumeration == the
    # device's cvbase order, so t_q[k] belongs to vertex k ----
    nz_core = np.flatnonzero(lf)  # ascending -> core-major order preserved
    lf_nz = lf[nz_core]
    ncf_nz = _POP7[lf_nz]
    # ascending bit positions per live core, masked to the live count
    sel = np.arange(7, dtype=np.uint8)[None, :] < ncf_nz[:, None]
    d_v = _DPOS7[lf_nz][sel].astype(np.int64)  # (V,)
    core_idx = np.repeat(nz_core, ncf_nz)
    row_v = core_idx // 512
    lflat = core_idx % 512
    bid_v = bids[row_v]
    lxv, lyv, lzv = lflat // 64, (lflat // 8) % 8, lflat % 8
    gxv = (bid_v // (nby * nbz)) * _B + lxv
    gyv = ((bid_v // nbz) % nby) * _B + lyv
    gzv = (bid_v % nbz) * _B + lzv
    vslots = ((gxv * ny + gyv) * nz + gzv) * 7 + d_v
    # global exclusive vertex prefix per core (values < 2^24 by the budget
    # guard, so int32 is exact)
    ncf = _POP7[lf]
    cvbase = np.cumsum(ncf, dtype=np.int32) - ncf

    # ---- stages 6-7: mixed cubes + triangle enumeration ----
    # prefilter: a cube emits triangles only if its 8 corners are mixed —
    # tet cases are then computed ONLY at candidate cubes (~surface count,
    # ~5% of L*512), not over the full core space
    inside = [sgb[:, corner_flat[c]] for c in range(8)]  # uint8 {0,1}
    csum = np.zeros((L, 512), np.uint8)
    for c in range(8):
        csum += inside[c]
    cube_ok = okx1 & oky1 & okz1
    mixed = ((csum > 0) & (csum < 8) & cube_ok).reshape(-1)
    cand = np.flatnonzero(mixed)  # ascending flat cube ids
    inside_c = [inside[c].reshape(-1)[cand] for c in range(8)]
    case_tet = []
    ntr_cand = np.zeros(len(cand), np.uint8)
    for tet in range(6):
        cs = np.zeros(len(cand), np.uint8)
        for bit, corner in enumerate(_TETS[tet]):
            cs += inside_c[int(corner)] * np.uint8(1 << bit)
        case_tet.append(cs)
        ntr_cand += _NTRIS_U8[cs]
    sel_t = np.flatnonzero(ntr_cand)
    midx = cand[sel_t]
    reps = ntr_cand[sel_t].astype(np.int64)
    count_t = int(reps.sum())
    if count_t == 0:
        return (vslots.astype(np.int64),
                np.asarray(t_q, np.float64) / 65535.0,
                np.zeros((0, 3), np.int64))
    tri_cand = np.repeat(sel_t, reps).astype(np.int32)  # index into cand
    tri_cube = cand[tri_cand]
    offs = np.repeat((np.cumsum(reps) - reps).astype(np.int32),
                     reps)
    rtri = np.arange(count_t, dtype=np.int32) - offs
    low = np.zeros(count_t, np.int32)
    tet_t = np.zeros(count_t, np.uint8)
    k_t = np.zeros(count_t, np.uint8)
    case_t = np.zeros(count_t, np.uint8)
    for tet in range(6):
        ct = case_tet[tet][tri_cand]
        nt = _NTRIS_U8[ct].astype(np.int32)
        hit = (rtri >= low) & (rtri < low + nt)
        tet_t = np.where(hit, np.uint8(tet), tet_t)
        k_t = np.where(hit, (rtri - low).astype(np.uint8), k_t)
        case_t = np.where(hit, ct, case_t)
        low = low + nt
    pt = _PTBL_NP[
        (tet_t.astype(np.int32) * 16 + case_t) * 2 + k_t
    ]  # int32

    # ---- stage 8: emission (int32 throughout; all values < 2^31) ----
    inv = np.full(nb3, -1, np.int32)
    inv[bids] = np.arange(L, dtype=np.int32)
    bid_t = bids[tri_cube // 512].astype(np.int32)
    lcube = (tri_cube % 512).astype(np.int32)
    bx_t = bid_t // (nby * nbz)
    by_t = (bid_t // nbz) % nby
    bz_t = bid_t % nbz
    lx_t, ly_t, lz_t = lcube // 64, (lcube // 8) % 8, lcube % 8
    cols = []
    for j in range(3):
        lo_c = (pt >> (6 * j)) & 7
        d_e = (pt >> (6 * j + 3)) & 7
        cx, cy, cz = lo_c >> 2, (lo_c >> 1) & 1, lo_c & 1
        lxe, lye, lze = lx_t + cx, ly_t + cy, lz_t + cz
        owner = inv[((bx_t + (lxe >> 3)) * nby + (by_t + (lye >> 3))) * nbz
                    + (bz_t + (lze >> 3))]
        assert (owner >= 0).all(), "packed wire: edge owner block not live"
        ci = owner * 512 + ((lxe & 7) * 8 + (lye & 7)) * 8 + (lze & 7)
        bitsw = lf[ci].astype(np.int32)
        rank = _POP7[bitsw & ((np.int32(1) << d_e) - 1)]
        cols.append(cvbase[ci] + rank)
    flips = (pt >> 18) & 1
    f0 = np.where(flips == 1, cols[2], cols[0])
    f2 = np.where(flips == 1, cols[0], cols[2])
    faces = np.stack([f0, cols[1], f2], axis=1).astype(np.int64)
    t = np.asarray(t_q, np.float64) / 65535.0
    return vslots.astype(np.int64), t, faces


def marching_tets_device_packed(vol, level: float = 0.0):
    """marching_tets_device over the PACKED wire: device runs stages 1-5
    only, the host fetches sign bits + u16 t + block ids (~10x less wire)
    and rebuilds vertex ids and faces with decode_packed_wire. Returns
    (vslots (V,) int64, t (V,) float64, faces (T, 3) int64, wire_bytes)."""
    import jax.numpy as jnp

    nx, ny, nz = vol.shape
    if nx * ny * nz * 7 >= 2**31:
        raise ValueError(
            f"grid {vol.shape} exceeds the int32 slot space (max ~645^3)"
        )
    nbx, nby, nbz = -(-nx // _B), -(-ny // _B), -(-nz // _B)
    nb3 = nbx * nby * nbz
    key = vol.shape
    m2 = max(nx, ny, nz) ** 2
    fn = _get_march_device()[1]

    def attempt(b_max, c_max, m_max, v_max, t_max):
        words, t_q, bids, cb, cc, cv = fn(
            vol, jnp.float32(level), b_max, c_max, v_max
        )
        cb, cc, cv = int(cb), int(cc), int(cv)
        # m/t budgets are untouched by the packed wire (stages 6-7 run on
        # host) but stay in the shared cache tuple for the exact path
        return {"b": cb, "c": cc, "v": cv}, (words, t_q, bids, cb, cv)

    words, t_q, bids, cb, cv = _run_with_budget_growth(
        key, nb3, m2, attempt
    )
    words_h = np.asarray(words[:cb])
    t_h = np.asarray(t_q[:cv])
    bids_h = np.asarray(bids[:cb])
    wire_bytes = words_h.nbytes + t_h.nbytes + bids_h.nbytes
    vslots, t, faces = decode_packed_wire(words_h, t_h, bids_h, vol.shape)
    assert len(vslots) == cv, (len(vslots), cv)
    return vslots, t, faces, wire_bytes


def decode_vertices(
    vslots: np.ndarray,
    t: np.ndarray,
    shape: Tuple[int, int, int],
    spacing,
    origin,
) -> np.ndarray:
    """Unpack (slot, t) -> world-space vertex positions (host, vectorized)."""
    _, ny, nz = shape
    gid = vslots // 7
    d = vslots % 7
    lo = np.stack([gid // (ny * nz), (gid // nz) % ny, gid % nz], axis=1)
    pos = lo.astype(np.float64) + t[:, None] * _DIRS[d].astype(np.float64)
    return pos * np.asarray(spacing, np.float64) + np.asarray(origin, np.float64)


def marching_cubes_device(vol, level, spacing, origin, wire: str = "exact"):
    """Device-volume frontend with the host-path return contract:
    (vertices (V, 3) float64 world coords, faces (F, 3) int64).

    wire="exact" fetches f32 t and device-emitted faces (bit-identical to
    the host path, up to soup order). wire="packed" ships sign bits + u16
    t and rebuilds topology on host (identical faces/vertex ids, vertex
    positions within 1/65535 of a cell edge, ~10x less D2H traffic and no
    device emission stages) — the production fetch path."""
    nx, ny, nz = vol.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    if wire == "packed":
        vslots, t, faces, _ = marching_tets_device_packed(vol, level)
    else:
        vslots, t, faces = marching_tets_device(vol, level)
    verts = decode_vertices(vslots, t, vol.shape, spacing, origin)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[ok]
