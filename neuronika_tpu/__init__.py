"""neuronika-tpu: a TPU-native define-by-run deep learning framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
Rust framework neuronika (tensors + dynamic neural networks, define-by-run
autodiff). The public surface mirrors the reference facade
(/root/reference/src/lib.rs:195-197,414,823): variable types and factory
functions at the root, plus `nn`, `optim`, and `data` modules — with
TPU-first extensions under `parallel` (mesh/sharding) and `models`.

Quickstart (mirrors examples/quickstart.rs):

    import neuronika_tpu as nk

    x = nk.rand((16, 3))
    w = nk.rand((5, 3)).requires_grad()
    b = nk.zeros(5).requires_grad()
    y = x.mm_t(w) + b
    loss = y.relu().mse(nk.zeros((16, 5)), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._engine.node import Node
from .config import config, enable_pallas, on_tpu, seed
from .variable import Reduction, StatusCell, Var, VarDiff, _apply, _to_operand

__version__ = "0.5.0"

__all__ = [
    "Var", "VarDiff", "Reduction", "StatusCell", "seed",
    "enable_pallas", "on_tpu",
    "from_ndarray", "zeros", "ones", "full", "rand", "eye",
    "linspace", "logspace", "geomspace", "range", "cat", "stack",
    "Zero", "Constant", "Reflective", "Replicative",
    "nn", "optim", "data", "parallel", "models", "utils", "device",
    "Device", "devices", "default_device", "to_device", "device_of",
    "Param", "Learnable",
]


# --------------------------------------------------------------------------
# padding modes (reference: node/pad/{zero,constant,reflective,replicative},
# public API via node/mod.rs:81)


class _PadMode:
    name = "zero"
    value = 0.0


class Zero(_PadMode):
    """Zero padding."""
    name = "zero"


class Constant(_PadMode):
    """Constant-value padding."""
    name = "constant"

    def __init__(self, value: float) -> None:
        self.value = float(value)


class Reflective(_PadMode):
    """Mirror padding (excluding the border element)."""
    name = "reflective"


class Replicative(_PadMode):
    """Edge-replication padding."""
    name = "replicative"


# --------------------------------------------------------------------------
# factory functions (reference lib.rs:51-286)


def _shape_tuple(shape) -> tuple:
    if isinstance(shape, (int, np.integer)):
        return (int(shape),)
    return tuple(int(s) for s in shape)


def _leaf(arr: jax.Array) -> Var:
    node = Node("leaf", arr.shape, arr.dtype)
    node.value = arr
    node.computed = True
    return Var(node)


# The reference is f32-only (src/lib.rs:43). `dtype=` on the factories is a
# TPU extension: bf16 leaves keep the whole graph (and the MXU) in bf16.


def from_ndarray(array, dtype=jnp.float32) -> Var:
    """Create a leaf variable from an array (reference lib.rs:51-66)."""
    return _leaf(jnp.asarray(array, dtype=dtype))


def zeros(shape, dtype=jnp.float32) -> Var:
    return _leaf(jnp.zeros(_shape_tuple(shape), dtype))


def ones(shape, dtype=jnp.float32) -> Var:
    return _leaf(jnp.ones(_shape_tuple(shape), dtype))


def full(shape, elem: float, dtype=jnp.float32) -> Var:
    return _leaf(jnp.full(_shape_tuple(shape), elem, dtype))


def rand(shape, dtype=jnp.float32) -> Var:
    """Uniform [0, 1) random leaf (reference lib.rs:137-155)."""
    return _leaf(
        jax.random.uniform(config.next_key(), _shape_tuple(shape), dtype)
    )


def eye(n: int) -> Var:
    return _leaf(jnp.eye(int(n), dtype=jnp.float32))


def linspace(start: float, end: float, n: int) -> Var:
    return _leaf(jnp.linspace(start, end, int(n), dtype=jnp.float32))


def logspace(base: float, start: float, end: float, n: int) -> Var:
    return _leaf(
        jnp.power(jnp.float32(base), jnp.linspace(start, end, int(n), dtype=jnp.float32))
    )


def geomspace(start: float, end: float, n: int) -> Var:
    """Geometric progression; like the reference (lib.rs:214-236) this
    requires both bounds to share a sign and be nonzero (returns None)."""
    if start == 0.0 or end == 0.0 or (start < 0.0) != (end < 0.0):
        return None
    return _leaf(jnp.geomspace(start, end, int(n), dtype=jnp.float32))


def range(start: float, end: float, step: float) -> Var:  # noqa: A001
    return _leaf(jnp.arange(start, end, step, dtype=jnp.float32))


# --------------------------------------------------------------------------
# free binary cat/stack (reference lib.rs:258-286)


def cat(lhs, rhs, axis: int):
    return _apply("cat", (_to_operand(lhs), _to_operand(rhs)), (int(axis),))


def stack(lhs, rhs, axis: int):
    return _apply("stack", (_to_operand(lhs), _to_operand(rhs)), (int(axis),))


# submodules re-exported for `nk.nn.Linear`-style access
from . import nn, optim, data, parallel, models, utils, device  # noqa: E402
from .device import Device, default_device, device_of, devices, to_device  # noqa: E402

# Pre-rewrite facade aliases (the reference's quickstart imports
# `neuronika::{Param, Learnable, ...}` at the root, quickstart.rs:4-6):
# a learnable parameter IS a differentiable variable here.
Param = VarDiff
Learnable = VarDiff
