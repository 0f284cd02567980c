"""Multi-host (DCN) meshes for distributed rendering.

The reference is a single-process, single-GPU program with no distributed
communication at all (SURVEY.md §2C; its only sync is Vulkan barriers +
fences). This module is the framework extension for TPU *pods*: several
hosts, each with an ICI-connected slice, joined over the data-center
network (DCN).

Rendering is pure data parallelism over rays — the scene pytree is
replicated and no collective runs during tracing — so the DCN axis carries
zero traffic until the final image assembly. That makes the hybrid layout
trivial and optimal:

  * "rays"  spans DCN x ICI  (slow axis outermost — each host renders a
    contiguous horizontal band of the frame; the only cross-host traffic
    is the gather of finished bands, exactly like the reference's
    per-frame staging-buffer copy, hello_vulkan.cpp:1014).
  * "prims" stays strictly inside ICI (the per-bounce lexicographic pmin
    merge in intersect.combine_hits_over_axis is latency-sensitive; it
    must ride ICI, never DCN).

Usage on each host of a pod slice:

    from toroidal_ray_tracing_tpu.parallel import multihost
    multihost.init_distributed()          # jax.distributed.initialize()
    mesh = multihost.make_hybrid_mesh(n_prim_shards=2)
    out = render_sharded(scene, cam, W, H, settings, mesh=mesh)

Single-host processes (including the CPU test backend) get the same code
path with a 1-host DCN axis, so the layout logic is testable without a pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, relies on the TPU pod environment's auto-discovery
    (the standard `jax.distributed.initialize()` contract). No-op when the
    runtime is already initialized or when there is nothing to coordinate
    (single process and no explicit arguments).

    Ordering matters: `jax.distributed.initialize()` must run BEFORE any
    backend-initializing API. The "already initialized" probe therefore
    reads `jax._src.distributed.global_state` (pure client-side state) —
    calling e.g. `jax.process_count()` here would itself initialize the
    local backend, making the subsequent initialize() raise, and every
    host would silently fall back to a 1-process mesh.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # distributed runtime already up (launcher or earlier call)
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        # nothing to coordinate explicitly; only initialize when the
        # launcher environment describes an actual multi-process job (a
        # single-host TPU VM also sets TPU_WORKER_HOSTNAMES=localhost)
        import os

        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi = (("COORDINATOR_ADDRESS" in os.environ)
                 or ("MEGASCALE_COORDINATOR_ADDRESS" in os.environ)
                 or len([h for h in hosts.split(",") if h]) > 1)
        if not multi:
            return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        # only swallow the benign double-init; a real failure — including
        # "must be called before any JAX computations" (a backend was
        # initialized first) — must surface, not leave every host of a pod
        # silently rendering as its own single-process mesh
        if "already" not in str(e).lower():
            raise


def make_hybrid_mesh(n_prim_shards: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """("rays", "prims") mesh over all global devices, DCN-aware.

    The "rays" axis is ordered host-major (DCN outermost): with the ray
    batch sharded along it, each host owns one contiguous band of the
    frame and never touches another host's rays during tracing. The
    "prims" axis is laid out strictly within each host's ICI slice;
    `n_prim_shards` must divide the per-host device count.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    # stable host-major order: (process_index, device id) — mesh rows then
    # split cleanly on host boundaries
    devices.sort(key=lambda d: (d.process_index, d.id))
    per_host: dict = {}
    for d in devices:
        per_host.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in per_host.values()}
    assert len(counts) == 1, f"uneven hosts: { {k: len(v) for k, v in per_host.items()} }"
    local = counts.pop()
    assert local % n_prim_shards == 0, (
        f"prims axis {n_prim_shards} must divide the per-host device "
        f"count {local} (it must stay inside ICI)")
    arr = np.asarray(devices).reshape(n // n_prim_shards, n_prim_shards)
    return Mesh(arr, axis_names=("rays", "prims"))


def host_band(height: int, width: int) -> tuple:
    """(row0, rows) of the frame band this host's "rays" shard covers under
    a host-major rays sharding of the flat pixel batch — the slice a host
    should write when streaming dump files (io.dumps) per band.

    render_sharded splits the FLAT pixel batch into equal per-device
    chunks, so the band is well-defined only when every host's chunk ends
    on a row boundary; anything else would report a band that does not
    match the pixels the host's shards actually own (and band-streamed
    dumps would write the wrong slices), so it is rejected here."""
    p = jax.process_index()
    np_ = jax.process_count()
    if height % np_ != 0:
        raise ValueError(
            f"host_band: height {height} must be divisible by the process "
            f"count {np_} (the flat equal-chunk rays sharding must cut on "
            f"row boundaries for per-host band dumps to be meaningful)")
    rows = height // np_
    return p * rows, rows
