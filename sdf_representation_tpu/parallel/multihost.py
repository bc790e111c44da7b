"""Multi-host (pod) initialisation helpers.

The reference has no multi-process capability (SURVEY.md §2.11: its
"DistributedExecutor" is a point-cloud trainer). Here multi-host is the
standard JAX recipe: call ``initialize_multihost()`` once per process before
any computation; every shard_map/jit in this framework then spans all hosts
automatically — gradient psums ride ICI within a slice and DCN across
slices, with no framework changes.

Typical pod launch (one process per host):

    JAX_COORDINATOR=host0:1234 NPROC=16 PROC_ID=$i python main.py cfg.ini

with an ``initialize_multihost()`` call added to the entry point, or use
``sdf_representation_tpu.parallel.multihost.auto_initialize()`` which is a
no-op off-pod.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with explicit or env-provided settings
    (JAX_COORDINATOR / NPROC / PROC_ID; TPU pods usually need no args at all
    — the TPU runtime supplies everything)."""
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if addr:
        kwargs["coordinator_address"] = addr
    n = num_processes or os.environ.get("NPROC")
    if n:
        kwargs["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("PROC_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def auto_initialize() -> bool:
    """Initialize multi-host iff the env asks for it; returns True if done."""
    if os.environ.get("JAX_COORDINATOR") or os.environ.get(
        "TPU_WORKER_HOSTNAMES", ""
    ).count(",") > 0:
        try:
            initialize_multihost()
            return True
        except Exception as exc:  # already initialised / single host
            print(f"multihost init skipped: {exc}")
    return False


def host_shard(total: int) -> slice:
    """This host's contiguous shard of `total` items (e.g. geometry files or
    grid slabs) — the host-side analog of the device data axis."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-total // n)
    return slice(i * per, min(total, (i + 1) * per))
