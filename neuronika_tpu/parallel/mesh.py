"""Device mesh + sharding helpers (TPU scale-out tier).

The reference has no distributed layer at all (SURVEY.md §2.7): its
parallelism is rayon threads over the batch axis inside conv kernels
(node/convolution/mod.rs:110-122). The TPU-idiomatic equivalent of "parallel
over the batch axis" is **data parallelism over the ICI mesh**: shard the
batch dimension of every input across a `dp` mesh axis and let GSPMD insert
the gradient all-reduce. Tensor parallelism (`tp`) is the extra axis the
flagship transformer uses (Megatron column/row splits).
"""

from __future__ import annotations

import math
import os
from typing import Mapping, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "make_hybrid_mesh", "distributed_init",
    "make_global_batch", "data_parallel_sharding", "replicated",
    "shard_batch", "DataParallel", "shard_map_compat",
]


def shard_map_compat(f, *, mesh, in_specs, out_specs, check_rep=False):
    """`shard_map` across jax versions: 0.8 moved it to `jax.shard_map`
    and renamed `check_rep` -> `check_vma`."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
    from jax.experimental.shard_map import shard_map  # pragma: no cover
    return shard_map(f, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_rep=check_rep)


def make_mesh(
    axes: Sequence[Tuple[str, int]] = None, devices=None
) -> Mesh:
    """Build a Mesh. Default: all devices on a single `dp` axis.

    `axes` is an ordered list of (name, size); sizes must multiply to the
    device count (use -1 for one inferred axis)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if axes is None:
        axes = [("dp", n)]
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        sizes[sizes.index(-1)] = n // known
    if math.prod(sizes) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} does not fit {n} devices")
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def make_hybrid_mesh(
    axes: Sequence[Tuple[str, int]],
    dcn: Optional[Mapping[str, int]] = None,
    devices=None,
) -> Mesh:
    """Mesh for multi-slice / multi-host topologies (TPU pods over DCN).

    `axes` is the ordered (name, total_size) list as in `make_mesh`;
    `dcn` maps axis name -> how much of that axis crosses the
    data-center network (slice boundary). Devices within a slice are
    laid out so the remaining (ICI) factor of every axis rides the
    chip-to-chip interconnect — collectives on pure-ICI axes (tp, pp)
    never touch DCN, and the `dp` gradient all-reduce does a
    hierarchical reduce (ICI first, one DCN hop per slice). Defaults:
    `dcn = {first axis: n_slices}`, the standard dp-over-DCN layout.

    Single-slice topologies (including the CPU test mesh) have no DCN
    dimension and collapse to `make_mesh(axes)`."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices == 1:
        return make_mesh(axes, devices)
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    if dcn is None:
        dcn = {names[0]: n_slices}
    unknown = set(dcn) - set(names)
    if unknown:
        raise ValueError(f"dcn axes {unknown} not in mesh axes {names}")
    dcn_sizes = [dcn.get(a, 1) for a in names]
    if math.prod(dcn_sizes) != n_slices:
        raise ValueError(
            f"dcn factors {dict(dcn)} must multiply to {n_slices} slices")
    ici_sizes = []
    for name, total, d in zip(names, sizes, dcn_sizes):
        if total % d:
            raise ValueError(f"axis {name}: size {total} not divisible by "
                             f"dcn factor {d}")
        ici_sizes.append(total // d)
    from jax.experimental import mesh_utils
    arr = mesh_utils.create_hybrid_device_mesh(
        ici_sizes, dcn_sizes, devices=devices)
    return Mesh(arr, tuple(names))


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None, **kw) -> bool:
    """Initialize multi-host JAX (one controller process per host).

    Call BEFORE any other jax API on every host of a pod. With explicit
    args it forwards to `jax.distributed.initialize`; with none it
    initializes only when a pod/cluster environment is detectable
    (TPU pod metadata, a coordinator env var), so single-host scripts
    and tests can call it unconditionally. Returns True if this call
    initialized the distributed runtime."""
    explicit = coordinator_address is not None or num_processes is not None
    multi_worker = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if not explicit and not multi_worker and not any(os.environ.get(v) for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS")):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kw)
        return True
    except RuntimeError as e:
        # auto-detected path: tolerate "already initialized" and "backend
        # already started" (another library won the race / a single-host
        # tunnel faked the pod env); explicit args mean the user really
        # wanted a cluster, so surface the failure
        if not explicit and ("already" in str(e).lower()
                             or "before" in str(e).lower()):
            return False
        raise


def make_global_batch(local_batch, mesh: Mesh, axis: str = "dp"):
    """Assemble a global device array from each process's LOCAL batch
    rows (multi-host data loading: every host reads only its own shard;
    the global array's leading dim is `process_count x local rows`,
    sharded over `axis`). Single-process this equals `shard_batch`."""
    import jax.numpy as jnp

    spec = [None] * jnp.ndim(local_batch)
    spec[0] = axis
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch))


def data_parallel_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(array, mesh: Mesh, axis: str = "dp"):
    """Place a host batch on the mesh with its leading dim sharded."""
    import jax.numpy as jnp

    spec = [None] * jnp.ndim(array)
    spec[0] = axis
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


class DataParallel:
    """Data-parallel training-step wrapper for *pure* step functions.

    `DataParallel(step_fn, mesh)` jits `step_fn(params, batch, ...) ->
    (params, aux)` with params replicated and every batch arg sharded on the
    leading axis; XLA inserts the gradient psum over ICI. This is the
    deliberate TPU replacement for the reference's rayon-over-batch
    parallelism."""

    def __init__(self, step_fn, mesh: Mesh, axis: str = "dp",
                 donate_params: bool = True) -> None:
        self.mesh = mesh
        self.axis = axis
        self._step = jax.jit(step_fn, donate_argnums=(0,) if donate_params else ())

    def __call__(self, params, *batch_args, **kw):
        placed = tuple(shard_batch(b, self.mesh, self.axis) for b in batch_args)
        return self._step(params, *placed, **kw)
