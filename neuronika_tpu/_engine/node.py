"""Graph nodes and the History tape.

Re-designs the reference's autodiff bookkeeping for XLA:

* reference `History<T>` (neuronika-variable/src/history.rs:9-125) is a
  `BTreeMap<(node ptr, insertion order), T>` giving dedup-by-identity plus
  topological order, with `merge()` for binary ops. Here node ids are globally
  monotonic and every parent is created before its children, so a plain
  ``dict[id, Node]`` merged with ``dict.update`` and materialised with
  ``sorted(ids)`` yields the same dedup + topo-order guarantees.

* reference `Forward`/`Backward` op structs (autograd.rs:7-25 and the 39
  node/ modules) become a single :class:`Node` carrying a *pure* forward
  function and a *pure* VJP — the whole tape is later staged into one jitted
  XLA program by the executor instead of being replayed node-by-node with
  dynamic dispatch.

* reference `Gradient` cells (gradient.rs:14-79) — `RefCell<Option<Array>>`
  with `no_grad()` deallocation — become the ``grad``/``grad_alive`` fields.
  ``grad is None`` while alive means "all zeros, not yet materialised".
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_IDS = itertools.count()

DEAD_GRADIENT_MSG = (
    "gradient has been deallocated. Perhaps you forgot to call .with_grad() "
    "after .no_grad()?"
)
FORWARD_NOT_CALLED_MSG = (
    "inconsistent state found. Perhaps you forgot to call .forward()?"
)


class Node:
    """One vertex of the define-by-run graph.

    A node is a *leaf* (holds data directly; ``op == "leaf"``) or an op
    application. Cloned `Var`s share the same Node, which reproduces the
    reference's shared ``Rc<RefCell<...>>`` buffer semantics
    (neuronika-variable/src/var.rs:34-61).
    """

    __slots__ = (
        "id", "op", "fn", "vjp", "parents", "extra", "shape", "dtype",
        "value", "computed", "differentiable", "grad", "grad_alive",
        "rng", "status", "value_key", "__weakref__",
    )

    def __init__(
        self,
        op: str,
        shape: Tuple[int, ...],
        dtype: Any,
        *,
        fn: Optional[Callable] = None,
        vjp: Optional[Callable] = None,
        parents: Sequence["Node"] = (),
        extra: Tuple = (),
        differentiable: bool = False,
        rng: bool = False,
        status: Optional[Any] = None,
    ) -> None:
        self.id = next(_IDS)
        self.op = op
        self.fn = fn
        self.vjp = vjp
        self.parents = tuple(parents)
        self.extra = extra
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype)
        self.value = None          # jax.Array once computed / for leaves
        self.computed = False      # mirrors the Cell<bool> flag (var.rs:110-128)
        self.differentiable = differentiable
        self.grad = None           # jax.Array accumulator; None == zeros
        self.grad_alive = True     # False after no_grad() (gradient.rs:40-57)
        self.rng = rng             # op consumes a PRNG key each forward (dropout)
        self.status = status       # shared train/eval cell for dropout
        self.value_key = None      # PRNG key consumed by the last forward

    # ------------------------------------------------------------------
    def is_leaf(self) -> bool:
        return self.fn is None

    def get_value(self):
        """Current buffer contents; zeros if never computed (the reference
        allocates zeroed output buffers at graph-build time, var.rs:53-61)."""
        if self.value is None:
            return jnp.zeros(self.shape, self.dtype)
        return self.value

    def get_grad(self):
        if not self.grad_alive:
            raise RuntimeError(DEAD_GRADIENT_MSG)
        if self.grad is None:
            return jnp.zeros(self.shape, self.dtype)
        return self.grad

    def accumulate_grad(self, g) -> None:
        if not self.grad_alive:
            raise RuntimeError(DEAD_GRADIENT_MSG)
        self.grad = g if self.grad is None else self.grad + g

    def zero_grad(self) -> None:
        self.grad = None

    def no_grad(self) -> None:
        self.grad = None
        self.grad_alive = False

    def with_grad(self) -> None:
        self.grad = None
        self.grad_alive = True

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"Node(id={self.id}, op={self.op}, shape={self.shape})"


# NOTE: the reference's standalone `History` container (history.rs:9-125) has
# no separate counterpart here: its guarantees (dedup-by-identity, topological
# order, merge-on-binary-ops) fall out of the monotone node ids plus the
# executor's ancestor walk (`executor._plan`), which materialises the tape
# directly from the `parents` edges.
