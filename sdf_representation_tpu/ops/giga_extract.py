"""Slab-streamed field->mesh extraction past single-dispatch limits.

The on-device extractor (ops/marching_device.py) encodes a vertex slot as
``gid*7 + dir`` in int32 and packs core words as ``cvbase << 7`` — caps of
~645^3 grid points and 2^24 vertices per dispatch. This module lifts both by
tiling the grid into x-slabs: each slab is evaluated and marched on device
within the int32 caps, and the slab meshes are merged on host in int64
GLOBAL slot space. Because a vertex slot names a *grid edge* (low-corner
lattice id + one of 7 directions), vertices on a shared slab plane receive
identical global slots from both neighbouring slabs and dedup exactly —
merging is a `np.unique`, not a nearest-neighbour weld; topology is
bit-identical to a (hypothetical) single-dispatch extraction. Cube layers
are partitioned disjointly so no face is emitted twice.

Field values on shared planes are evaluated twice (once per adjacent slab)
but BITWISE EQUALLY: the slab evaluator runs the same Pallas block kernel
on the same global block ids as the full-grid sparse evaluator
(ops/sparse_grid.py), so the duplicated vertices carry identical t.

This is the role the reference delegates to its out-of-core octree consumer
(reference ops/DeepTrace/src/deeptrace.cpp:59-81) and the scale axis of its
reconstruction contract (reference executor/executor.py:346-400, fixed
cubesize): field->mesh at 1024^3+ on one chip, bounded device memory
(at most two slab volumes resident — current + prefetched, ~(slab+1)*n^2
floats each).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.implicit_net import ImplicitNet
from .marching_device import (
    decode_vertices,
    marching_tets_device,
    marching_tets_device_packed,
)
from .sparse_grid import (
    assemble_block_rows,
    coarse_and_certificate,
    refine_blocks,
)

_SLOT_DIRS = 7  # edge directions per lattice point in the tet decomposition


@functools.partial(
    jax.jit,
    static_argnames=("model", "n", "block", "safety", "eps", "level"),
)
def _coarse_field(model, params, n, block, safety, eps, level):
    """Global coarse sweep + activity mask + exactness certificate around
    the ``level`` set — exactly ops/sparse_grid.coarse_and_certificate
    (ONE copy of the selection rule), run ONCE for the whole grid and
    shared by every slab."""
    return coarse_and_certificate(model, params, n, block, safety, eps,
                                  level)


@functools.partial(
    jax.jit,
    static_argnames=("model", "n", "block", "k_max", "nxb", "tile_blocks",
                     "compute_dtype", "interpret", "mxu_precision"),
)
def _refine_slab(
    model, params, coarse, mask, xb0, n, block, k_max, nxb, tile_blocks,
    compute_dtype, interpret, mxu_precision,
):
    """Refine the active blocks of block-rows [xb0, xb0+nxb) and assemble
    the (nxb*block, n, n) slab volume. xb0 is a TRACED scalar: one compile
    serves every slab. The refinement is ops/sparse_grid.refine_blocks —
    same kernel, same global block ids, hence bitwise-equal values for a
    block whichever slab evaluates it (the seam-exactness precondition)."""
    nb = n // block
    nb3 = nb * nb * nb
    nb2 = nb * nb
    pts = block * block * block

    flat = jnp.arange(nb3, dtype=jnp.int32)
    bx = flat // nb2
    inslab = (bx >= xb0) & (bx < xb0 + nxb)
    m = mask & inslab
    count = jnp.sum(m.astype(jnp.int32))
    (ids,) = jnp.nonzero(m, size=k_max, fill_value=0)
    ids = ids.astype(jnp.int32)

    vals = refine_blocks(
        model, params, ids, count, n, block, k_max, tile_blocks,
        compute_dtype, interpret, mxu_precision,
    )

    # slab-local assembly: coarse fill (padded past the right grid edge so
    # the dynamic_slice stays in bounds; pad rows are never sliced into the
    # returned planes) + scatter of refined blocks at slab-local offsets
    coarse_pad = jnp.concatenate(
        [coarse, jnp.full((nxb * nb2,), 3.0, jnp.float32)]
    )
    slab_coarse = jax.lax.dynamic_slice(
        coarse_pad, (xb0 * nb2,), (nxb * nb2,)
    )
    valid = jnp.arange(k_max, dtype=jnp.int32) < count
    ids_local = jnp.where(valid, ids - xb0 * nb2, nxb * nb2)
    vol_blocked = jnp.broadcast_to(slab_coarse[:, None], (nxb * nb2, pts))
    vol_blocked = vol_blocked.at[ids_local].set(vals, mode="drop")
    vol = assemble_block_rows(vol_blocked, nxb, nb, block, n)
    return vol, count


def _slab_plan(n: int, slab: int):
    """Disjoint cube-layer partition: slab k covers cube layers
    [k*slab, min((k+1)*slab, n-1)) and needs planes [x0, x1] inclusive."""
    plan = []
    for x0 in range(0, n - 1, slab):
        x1 = min(x0 + slab, n - 1)
        plan.append((x0, x1 - x0 + 1))
    return plan


def default_slab(n: int, block: int = 8, n_devices: int = 1) -> int:
    """Largest block-aligned slab whose plane count fits the int32 slot
    space (with one plane of overlap). With n_devices > 1, shrink
    (block-aligned) until every device owns >= 1 slab — the slot-limited
    slab can yield fewer slabs than devices (1024^3 -> 4 slabs), idling
    chips; the merged mesh is identical for any slab size (seam-exact)."""
    max_planes = (2**31 - 1) // (_SLOT_DIRS * n * n)
    slab = max(block, ((max_planes - 1) // block) * block)
    slab = min(slab, ((n - 1 + block - 1) // block) * block)
    while slab > block and len(_slab_plan(n, slab)) < n_devices:
        slab = max(block, slab - block * max(1, (slab // block) // 4))
    return slab


def extract_mesh_giga(
    model: Optional[ImplicitNet],
    params,
    n: int,
    *,
    level: float = 0.0,
    slab: Optional[int] = None,
    block: int = 8,
    safety: float = 1.5,
    eps: float = 0.01,
    tile_blocks: int = 2,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    mxu_precision: str = "default",
    wire: str = "packed",
    on_violation: str = "error",
    vol_fn: Optional[Callable[[int, int], jnp.ndarray]] = None,
    spacing: Optional[float] = None,
    origin: float = -1.0,
    devices=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``level`` set of the field on the n^3 grid in [-1,1]^3,
    slab by slab. Returns (vertices (V, 3) float64 world coords,
    faces (T, 3) int64) — the same contract as
    ops/marching_device.marching_cubes_device, without its ~645^3 grid or
    2^24-vertex caps.

    vol_fn(x0, sx) -> (sx, n, n) field values on planes [x0, x0+sx) may be
    supplied to extract from any field (tests use dense slices); by default
    it is built per model family: ImplicitNet -> the hierarchical sparse
    evaluator (one global coarse sweep + certificate, then per-slab Pallas
    refinement of active blocks; a single compiled dispatch reused by every
    slab — the slab offset is a traced scalar); HashMLP -> the separable
    banded-matmul x-slab evaluator (ops/hash_grid_eval, exact dense values,
    no certificate involved; always f32 — ``compute_dtype`` governs only
    the ImplicitNet refinement kernel).

    on_violation: response to a sparse-selection certificate violation
    (see ops/sparse_grid.sparse_grid_eval): "error" (default — there is no
    cheap dense fallback at giga scale), "warn", or "dense" (refine EVERY
    block of every slab: dense-eval cost, bounded memory).

    devices: a sequence of jax.Device — slabs round-robin over them
    (weights/coarse replicated per device, each device refines AND marches
    its own slabs concurrently; the host drains results in slab order, so
    the merged mesh is identical regardless of device count). Extraction
    is embarrassingly parallel in slabs: this is the multi-chip scaling
    axis of the reconstruction deliverable. Default-path only (ignored
    when vol_fn is supplied).
    """
    if n % block:
        raise ValueError(f"n={n} must be divisible by block={block}")
    if slab is None:
        slab = default_slab(
            n, block, 1 if devices is None else len(devices)
        )
    if slab % block:
        raise ValueError(f"slab={slab} must be divisible by block={block}")
    if (slab + 1) * n * n * _SLOT_DIRS >= 2**31:
        raise ValueError(
            f"slab={slab} planes exceed the per-dispatch int32 slot space"
        )
    if on_violation not in ("dense", "error", "warn"):
        raise ValueError(f"on_violation={on_violation!r}")
    if devices is not None and len(devices) == 0:
        devices = None

    nb = n // block
    nb2 = nb * nb
    nxb = slab // block + 1  # +1: the shared plane lives in the next row
    plan = _slab_plan(n, slab)

    internal_eval = vol_fn is None
    from ..models.hash_mlp import HashMLP

    if internal_eval and isinstance(model, HashMLP):
        # HashMLP: dense separable x-slab evaluation (ops/hash_grid_eval) —
        # exact dense values, so no activity selection or certificate is
        # involved; devices round-robin the slabs like the sparse path
        from .hash_grid_eval import hash_grid_eval_x_slab

        if devices is not None:
            repl = [jax.device_put(params, d) for d in devices]
        else:
            repl = [params]

        def vol_fn(x0, sx, di=0):
            # always f32: hash tables ARE f32 by design (bf16 measurably
            # hurts — models/hash_mlp.py) and ``compute_dtype`` governs
            # only the ImplicitNet refinement kernel (see docstring)
            return hash_grid_eval_x_slab(
                model, repl[di % len(repl)], x0, sx, n,
                compute_dtype=jnp.float32,
            )

        internal_eval_hash = True
    else:
        internal_eval_hash = False
    if internal_eval and not internal_eval_hash:
        if not isinstance(model, ImplicitNet):
            raise ValueError(
                "default slab evaluator requires an ImplicitNet or "
                "HashMLP; pass vol_fn for other fields"
            )
        coarse, mask, viol = _coarse_field(
            model, params, n, block, float(safety), float(eps),
            float(level),
        )
        if int(viol) > 0:
            msg = (
                f"extract_mesh_giga certificate: {int(viol)} adjacent "
                f"inactive block pair(s) disagree in center sign at n={n} "
                f"(safety={safety}) — the sparse sweep would miss surface"
            )
            if on_violation == "error":
                raise ValueError(msg)
            print(f"[giga_extract] {msg}; "
                  + ("refining ALL blocks" if on_violation == "dense"
                     else "proceeding (on_violation='warn')"), flush=True)
            if on_violation == "dense":
                mask = jnp.ones_like(mask)
        # exact per-slab active counts (host): one static k_max, no growth
        mask_h = np.asarray(mask)
        bx_h = np.arange(nb * nb2, dtype=np.int64) // nb2
        k_need = 0
        for x0, _ in plan:
            xb0 = x0 // block
            sel = mask_h & (bx_h >= xb0) & (bx_h < xb0 + nxb)
            k_need = max(k_need, int(sel.sum()))
        k_max = max(tile_blocks, -(-k_need // tile_blocks) * tile_blocks)

        if devices is not None:
            repl = [
                jax.device_put((params, coarse, mask), d) for d in devices
            ]
        else:
            repl = [(params, coarse, mask)]

        def vol_fn(x0, sx, di=0):
            p_d, coarse_d, mask_d = repl[di % len(repl)]
            vol, _ = _refine_slab(
                model, p_d, coarse_d, mask_d, jnp.int32(x0 // block), n,
                block, k_max, nxb, tile_blocks, compute_dtype, interpret,
                mxu_precision,
            )
            return vol[:sx]

    march = (marching_tets_device_packed if wire == "packed"
             else marching_tets_device)
    n_dev = len(devices) if (internal_eval and devices is not None) else 1

    def _vol(i):
        if internal_eval:
            vol_slab = vol_fn(*plan[i], di=i)
        else:
            vol_slab = vol_fn(*plan[i])
        if not isinstance(vol_slab, jnp.ndarray):
            vol_slab = jnp.asarray(np.asarray(vol_slab, dtype=np.float32))
        return vol_slab

    # prefetch pipeline: dispatch up to `depth` slab evaluations ahead of
    # the march fetch/decode of the current one — the device(s) fill with
    # later slabs while the host does this slab's D2H + topology rebuild
    # (the fetch, not compute, dominates on slow links). With multiple
    # devices, depth = device count: each device computes its own slabs
    # concurrently; results are drained in slab order. Drained entries are
    # released so at most `depth` slab volumes are resident.
    depth = max(1, n_dev)
    pending = {i: _vol(i) for i in range(min(depth, len(plan)))}
    slots_all, t_all, faces_all = [], [], []
    v_off = 0
    for i, (x0, sx) in enumerate(plan):
        vol_slab = pending.pop(i)
        if i + depth < len(plan):
            pending[i + depth] = _vol(i + depth)
        try:
            out = march(vol_slab, level)
        except ValueError as exc:
            if "packed core-word budget" not in str(exc) or slab <= block:
                raise
            # a single slab overflowed the per-dispatch 2^24-vertex cap
            # (pathologically dense surface): halve the slabs and redo —
            # budgets/compiles for the smaller shape are fresh but the
            # result is identical (seam merging is slab-size-agnostic)
            half = max(block, (slab // 2) // block * block)
            print(f"[giga_extract] slab of {sx} planes overflowed the "
                  f"2^24-vertex dispatch cap; retrying with slab={half}",
                  flush=True)
            return extract_mesh_giga(
                model, params, n, level=level, slab=half, block=block,
                safety=safety, eps=eps, tile_blocks=tile_blocks,
                compute_dtype=compute_dtype, interpret=interpret,
                mxu_precision=mxu_precision, wire=wire,
                on_violation=on_violation,
                vol_fn=None if internal_eval else vol_fn,
                spacing=spacing, origin=origin, devices=devices,
            )
        vslots, t, faces = out[0], out[1], out[2]
        del vol_slab
        slots_all.append(
            np.asarray(vslots, np.int64) + np.int64(x0) * n * n * _SLOT_DIRS
        )
        t_all.append(np.asarray(t, np.float64))
        faces_all.append(np.asarray(faces, np.int64) + v_off)
        v_off += len(vslots)

    if v_off == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    slots = np.concatenate(slots_all)
    t = np.concatenate(t_all)
    faces = np.concatenate(faces_all) if faces_all else np.zeros(
        (0, 3), np.int64
    )
    # merge: shared-plane vertices carry identical global slots (and
    # identical t — same field bits on both sides); np.unique dedups them
    uniq, first, inv = np.unique(slots, return_index=True,
                                 return_inverse=True)
    faces = inv[faces]
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    s = 2.0 / (n - 1) if spacing is None else float(spacing)
    verts = decode_vertices(uniq, t[first], (n, n, n), (s, s, s),
                            (origin,) * 3)
    return verts, faces[ok]
