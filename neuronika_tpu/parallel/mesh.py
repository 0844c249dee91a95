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
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "data_parallel_sharding", "replicated", "shard_batch",
    "DataParallel", "shard_map_compat",
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
