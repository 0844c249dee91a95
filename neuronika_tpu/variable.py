"""`Var` / `VarDiff`: the define-by-run variable handles.

API parity with the reference's two variable types
(neuronika-variable/src/{var.rs,vardiff.rs}):

* `Var` is non-differentiable; `VarDiff` is differentiable. Differentiability
  is sticky — any op with a `VarDiff` operand yields a `VarDiff`
  (src/lib.rs:124-130).
* ops *record* graph nodes; nothing computes until `.forward()`;
  `.backward(seed)` replays VJPs in reverse, `+=`-accumulating into every
  differentiable node's gradient cell.
* cloned handles share the underlying node (the reference's shared
  `Rc<RefCell<…>>` buffers, var.rs:34-61) — in Python, handles are references
  already, and `.data()` / `.grad()` read the shared cells.

Unlike the reference's node-at-a-time interpreter, `.forward()`/`.backward()`
stage the whole tape into single jitted XLA programs (see `_engine.executor`).
"""

from __future__ import annotations

import itertools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ._engine import executor
from ._engine.node import Node
from .ops.functional import OPS


class Reduction:
    """Loss reduction — reference `Reduction` enum (lib.rs:28-36)."""

    Sum = "sum"
    Mean = "mean"


class StatusCell:
    """Shared train/eval switch — the reference's `Rc<Cell<bool>>` consumed
    by dropout (var.rs:375-393). ``True`` means training (dropout active)."""

    __slots__ = ("value",)

    def __init__(self, value: bool = True) -> None:
        self.value = bool(value)

    def set(self, value: bool) -> None:
        self.value = bool(value)

    def get(self) -> bool:
        return self.value


# --------------------------------------------------------------------------
# graph construction


def _to_operand(x: Any, dtype=None) -> "Var":
    """Coerce scalars / arrays to constant leaf Vars (Python-side
    convenience; the reference requires explicit Var construction).
    `dtype` lets scalar constants adopt the peer operand's dtype so bf16
    graphs stay bf16 (the reference is f32-only, lib.rs:43; dtype support
    is a TPU extension)."""
    if isinstance(x, Var):
        return x
    arr = jnp.asarray(x, dtype=dtype or jnp.float32)
    return Var(Node("leaf", arr.shape, arr.dtype))._with_value(arr)


from ._engine.executor import LRUCache as _LRUCache  # noqa: E402

_SHAPE_MEMO: dict = _LRUCache(8192)


def _infer_shape(op, extra, parents):
    key = (op.name, extra, tuple((p.shape, p.dtype.str) for p in parents))
    hit = _SHAPE_MEMO.get(key)
    if hit is None:
        avals = [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in parents]
        if op.rng:
            out = jax.eval_shape(
                lambda k, *xs: op.fwd(extra, *xs, key=k, train=True),
                jax.random.key(0), *avals,
            )
        else:
            out = jax.eval_shape(lambda *xs: op.fwd(extra, *xs), *avals)
        hit = (out.shape, out.dtype)
        _SHAPE_MEMO[key] = hit
    return hit


def _apply(name: str, operands: Sequence["Var"], extra: Tuple = (), status=None):
    op = OPS[name]
    parents = [o.node for o in operands]
    diff = any(isinstance(o, VarDiff) for o in operands)
    out_shape, out_dtype = _infer_shape(op, extra, parents)
    node = Node(
        name,
        out_shape,
        out_dtype,
        fn=op.fwd,
        vjp=op.vjp,
        parents=parents,
        extra=extra,
        differentiable=diff,
        rng=op.rng,
        status=status,
    )
    return VarDiff(node) if diff else Var(node)


class Var:
    """Non-differentiable variable (reference `Var<D>`, var.rs:34-128)."""

    __slots__ = ("node",)

    def __init__(self, node: Node) -> None:
        self.node = node

    def _with_value(self, value) -> "Var":
        self.node.value = value
        self.node.computed = True
        return self

    # ------------------------------------------------------------ plumbing
    @property
    def shape(self) -> Tuple[int, ...]:
        return self.node.shape

    @property
    def ndim(self) -> int:
        return len(self.node.shape)

    @property
    def dtype(self):
        return self.node.dtype

    def data(self) -> jax.Array:
        """Current buffer contents (zeros until the first `forward()`,
        matching the reference's zero-allocated output buffers)."""
        return self.node.get_value()

    def data_mut(self):
        """Mutable access: returns a numpy copy; call `assign` (or use the
        context form) to write back. The reference hands out `RefMut`
        (var.rs:75); JAX arrays are immutable so mutation is a write-back."""
        return _MutGuard(self.node)

    def assign(self, array) -> None:
        """Overwrite the underlying buffer in place (reference `data_mut()`
        writes, used by `nn::init` — neuronika-nn/src/init.rs:74-244)."""
        arr = jnp.asarray(array, dtype=self.node.dtype)
        if arr.shape != self.node.shape:
            raise ValueError(
                f"assign shape mismatch: {arr.shape} vs {self.node.shape}"
            )
        self.node.value = arr
        self.node.computed = True

    def item(self) -> float:
        return float(jnp.reshape(self.data(), (-1,))[0])

    def forward(self) -> None:
        executor.forward(self.node)

    def requires_grad(self) -> "VarDiff":
        """Promote to a differentiable variable (var.rs:103-108)."""
        self.node.differentiable = True
        return VarDiff(self.node)

    # ----------------------------------------------------------- operators
    def __add__(self, rhs):
        return _apply("add", (self, _to_operand(rhs, self.dtype)))

    def __radd__(self, lhs):
        return _apply("add", (_to_operand(lhs, self.dtype), self))

    def __sub__(self, rhs):
        return _apply("sub", (self, _to_operand(rhs, self.dtype)))

    def __rsub__(self, lhs):
        return _apply("sub", (_to_operand(lhs, self.dtype), self))

    def __mul__(self, rhs):
        return _apply("mul", (self, _to_operand(rhs, self.dtype)))

    def __rmul__(self, lhs):
        return _apply("mul", (_to_operand(lhs, self.dtype), self))

    def __truediv__(self, rhs):
        return _apply("div", (self, _to_operand(rhs, self.dtype)))

    def __rtruediv__(self, lhs):
        return _apply("div", (_to_operand(lhs, self.dtype), self))

    def __neg__(self):
        return _apply("neg", (self,))

    # --------------------------------------------------------- linear alg
    def mm(self, rhs):
        return _apply("mm", (self, _to_operand(rhs)))

    def mm_t(self, rhs):
        return _apply("mm_t", (self, _to_operand(rhs)))

    def mv(self, rhs):
        return _apply("mv", (self, _to_operand(rhs)))

    def vm(self, rhs):
        return _apply("vm", (self, _to_operand(rhs)))

    def vv(self, rhs):
        return _apply("vv", (self, _to_operand(rhs)))

    def matmul(self, rhs):
        """Batched matmul: self (..., K) @ rhs (K, N) — the MXU-friendly
        extension beyond the reference's 2-d `mm` (one large GEMM per
        projection at any batch rank)."""
        return _apply("matmul", (self, _to_operand(rhs, self.dtype)))

    # --------------------------------------------------------- elementwise
    def pow(self, exp: int):
        return _apply("pow", (self,), (int(exp),))

    def sqrt(self):
        return _apply("sqrt", (self,))

    def relu(self):
        return _apply("relu", (self,))

    def leaky_relu(self):
        return _apply("leaky_relu", (self,))

    def softplus(self):
        return _apply("softplus", (self,))

    def sigmoid(self):
        return _apply("sigmoid", (self,))

    def tanh(self):
        return _apply("tanh", (self,))

    def ln(self):
        return _apply("ln", (self,))

    def exp(self):
        return _apply("exp", (self,))

    def softmax(self, axis: int):
        return _apply("softmax", (self,), (int(axis),))

    def log_softmax(self, axis: int):
        return _apply("log_softmax", (self,), (int(axis),))

    # ----------------------------------------------------------- reduction
    def sum(self, axis: int = None):  # noqa: RUF013
        """Full reduction to a scalar (reference behavior); `axis=` is a
        keepdims per-axis extension."""
        if axis is None:
            return _apply("sum", (self,))
        return _apply("sum_axis", (self,), (int(axis),))

    def mean(self, axis: int = None):  # noqa: RUF013
        if axis is None:
            return _apply("mean", (self,))
        return _apply("mean_axis", (self,), (int(axis),))

    # --------------------------------------------------------------- shape
    def t(self):
        return _apply("t", (self,))

    def unsqueeze(self, axis: int):
        return _apply("unsqueeze", (self,), (int(axis),))

    def reshape(self, shape):
        """Reshape (extension beyond the reference; conv -> linear glue)."""
        shape = tuple(int(s) for s in (
            shape if isinstance(shape, (tuple, list)) else (shape,)
        ))
        if -1 in shape:
            known = 1
            for s in shape:
                if s != -1:
                    known *= s
            total = 1
            for s in self.shape:
                total *= s
            shape = tuple(total // known if s == -1 else s for s in shape)
        return _apply("reshape", (self,), (shape,))

    def flatten(self):
        """(N, ...) -> (N, prod(...))."""
        return self.reshape((self.shape[0], -1))

    def embed(self, ids):
        """Token-table lookup: self is the (V, D) table, `ids` float class
        indices (extension beyond the reference; receiver-style like
        `convolution`)."""
        return _apply("embedding", (self, _to_operand(ids)))

    def chunks(self, chunk_size) -> List["Var"]:
        """Split into equal chunks of shape `chunk_size` (ndarray
        `exact_chunks` semantics — partial edge chunks are dropped;
        var.rs:401-423)."""
        cs = tuple(int(c) for c in (
            chunk_size if isinstance(chunk_size, (tuple, list)) else (chunk_size,)
        ))
        if len(cs) != self.ndim:
            raise ValueError("chunk_size rank must match variable rank")
        grid = [d // c for d, c in zip(self.shape, cs)]
        out = []
        for idx in itertools.product(*(range(g) for g in grid)):
            starts = tuple(i * c for i, c in zip(idx, cs))
            out.append(_apply("chunk", (self,), (starts, cs)))
        return out

    def cat(self, variables: Sequence["Var"], axis: int):
        """n-ary concatenation (reference `Var::cat`, var.rs:564-642)."""
        return _apply("multi_cat", (self, *variables), (int(axis),))

    def stack(self, variables: Sequence["Var"], axis: int):
        return _apply("multi_stack", (self, *variables), (int(axis),))

    # ------------------------------------------------------------- pooling
    def max_pool(self, window, stride=None):
        """Max pooling over the trailing spatial dims (extension beyond the
        reference, required by the MNIST-CNN capability target)."""
        w = tuple(int(x) for x in (
            window if isinstance(window, (tuple, list)) else (window,)
        ))
        s = w if stride is None else tuple(int(x) for x in (
            stride if isinstance(stride, (tuple, list)) else (stride,)
        ))
        return _apply("max_pool", (self,), (w, s))

    def avg_pool(self, window, stride=None):
        w = tuple(int(x) for x in (
            window if isinstance(window, (tuple, list)) else (window,)
        ))
        s = w if stride is None else tuple(int(x) for x in (
            stride if isinstance(stride, (tuple, list)) else (stride,)
        ))
        return _apply("avg_pool", (self,), (w, s))

    def astype(self, dtype):
        """Dtype cast (extension: bf16 compute bodies with f32 loss heads).
        The VJP casts the cotangent back to this variable's dtype."""
        return _apply("astype", (self,), (jnp.dtype(dtype).name,))

    # ----------------------------------------------------------- attention
    def flash_attention(self, n_head: int, n_kv_head: int = 0,
                        causal: bool = True, dropout: float = 0.0,
                        status: StatusCell = None, block: int = 512):  # noqa: RUF013
        """Fused multi-head attention on the packed group-major qkv
        projection `self` (B, S, (H + 2·KV)·hd) -> (B, S, H·hd) head-major.
        Runs the Pallas flash kernel (packed layout, fast softmax, fused
        single-pass backward — ops/pallas/attention.py) on TPU and the
        identical-math XLA form elsewhere. Dropout is status-gated like
        `Var.dropout` (reference semantics, var.rs:375-393)."""
        if not 0.0 <= dropout <= 1.0:
            raise ValueError(
                f"dropout probability has to be between 0 and 1, but got "
                f"{dropout}"
            )
        if dropout > 0.0 and status is None:
            raise ValueError(
                "attention dropout requires a StatusCell (train/eval switch)"
            )
        if self.ndim != 3:
            raise ValueError(
                "flash_attention expects a packed (B, S, W) qkv tensor"
            )
        return _apply(
            "flash_attention", (self,),
            (int(n_head), int(n_kv_head), bool(causal), float(dropout),
             int(block)),
            status=status,
        )

    # ------------------------------------------------------------- dropout
    def dropout(self, p: float, status: StatusCell):
        if not 0.0 <= p <= 1.0:
            raise ValueError(
                f"dropout probability has to be between 0 and 1, but got {p}"
            )
        return _apply("dropout", (self,), (float(p),), status=status)

    # ----------------------------------------------------------------- pad
    def pad(self, padding, mode):
        pad_t = tuple(int(x) for x in (
            padding if isinstance(padding, (tuple, list)) else (padding,)
        ))
        return _apply("pad", (self,), (pad_t, mode.name, mode.value))

    # ---------------------------------------------------------- convolution
    def convolution(self, input, stride, dilation, groups: int = 1):
        """n-d convolution; NOTE the receiver is the **kernel** and the
        argument the input, matching the reference (var.rs:704-724)."""
        stride_t = tuple(int(s) for s in (
            stride if isinstance(stride, (tuple, list)) else (stride,)
        ))
        dil_t = tuple(int(d) for d in (
            dilation if isinstance(dilation, (tuple, list)) else (dilation,)
        ))
        inp = _to_operand(input)
        nd = inp.ndim - 2
        if len(stride_t) == 1 and nd > 1:
            stride_t = stride_t * nd
        if len(dil_t) == 1 and nd > 1:
            dil_t = dil_t * nd
        _check_conv_args(self.shape, inp.shape, stride_t, dil_t, int(groups))
        return _apply("convolution", (self, inp), (stride_t, dil_t, int(groups)))

    # -------------------------------------------------------------- losses
    def mae(self, target, reduction: str = Reduction.Mean):
        return _apply("mae", (self, _to_operand(target)), (reduction,))

    def mse(self, target, reduction: str = Reduction.Mean):
        return _apply("mse", (self, _to_operand(target)), (reduction,))

    def bce(self, target, reduction: str = Reduction.Mean):
        return _apply("bce", (self, _to_operand(target)), (reduction,))

    def bce_with_logits(self, target, reduction: str = Reduction.Mean):
        return _apply("bce_with_logits", (self, _to_operand(target)), (reduction,))

    def kldiv(self, target, reduction: str = Reduction.Mean):
        return _apply("kldiv", (self, _to_operand(target)), (reduction,))

    def nll(self, target, reduction: str = Reduction.Mean):
        return _apply("nll", (self, _to_operand(target)), (reduction,))

    # ---------------------------------------------------------------- repr
    def __repr__(self) -> str:
        return f"Var(shape={self.shape}, op={self.node.op})\n{self.data()}"


class _MutGuard:
    """Context manager backing `data_mut()`: yields a writable numpy array
    and writes it back into the node on exit."""

    def __init__(self, node: Node) -> None:
        self._node = node
        self._arr = None

    def __enter__(self):
        self._arr = np.array(self._node.get_value())
        return self._arr

    def __exit__(self, *exc):
        self._node.value = jnp.asarray(self._arr, dtype=self._node.dtype)
        self._node.computed = True
        return False


class VarDiff(Var):
    """Differentiable variable (reference `VarDiff<D>`, vardiff.rs:35-165).

    Shares all of `Var`'s graph-building ops (sticky differentiability is
    handled in `_apply`) and adds the gradient API.
    """

    __slots__ = ()

    # ------------------------------------------------------------ gradient
    def grad(self) -> jax.Array:
        """Accumulated gradient (zeros before the first backward)."""
        return self.node.get_grad()

    def grad_mut(self):
        node = self.node

        class _GradGuard:
            def __enter__(self_inner):
                self_inner._arr = np.array(node.get_grad())
                return self_inner._arr

            def __exit__(self_inner, *exc):
                node.grad = jnp.asarray(self_inner._arr, dtype=node.dtype)
                return False

        return _GradGuard()

    def zero_grad(self) -> None:
        """Reset THIS variable's gradient to zero — not the whole tape
        (vardiff.rs:99-101); the optimizer zero-grads each parameter."""
        self.node.zero_grad()

    def no_grad(self) -> None:
        """De-allocate the gradients of `self` and its *interior* ancestors
        (memory toggle, vardiff.rs:143-152). Like the reference, leaf
        gradients are untouched (leaves never insert a NoGrad handle into
        the history), and calling this on a leaf is a no-op."""
        tape, _ = executor._plan(self.node)
        for n in tape:
            if n.differentiable:
                n.no_grad()

    def with_grad(self) -> None:
        """Re-allocate (zeroed) interior gradients after `no_grad`
        (vardiff.rs:154-163)."""
        tape, _ = executor._plan(self.node)
        for n in tape:
            if n.differentiable:
                n.with_grad()

    def backward(self, seed: float) -> None:
        """Seed the root gradient and replay VJPs in reverse topological
        order, accumulating into every differentiable node (vardiff.rs:125-141).
        Gradients accumulate across calls until `zero_grad()`."""
        executor.backward(self.node, float(seed))

    def __repr__(self) -> str:
        return f"VarDiff(shape={self.shape}, op={self.node.op})\n{self.data()}"


# --------------------------------------------------------------------------
# conv argument validation — mirrors the reference's check_conv_args /
# check_groups_args panics (utils.rs:427-497).


def _check_conv_args(kernel_shape, input_shape, stride, dilation, groups):
    nd = len(input_shape) - 2
    if nd < 1:
        raise ValueError("convolution input must have at least 3 dimensions")
    if len(kernel_shape) != len(input_shape):
        raise ValueError(
            "the kernel and the input must have the same number of dimensions"
        )
    if len(stride) != nd:
        raise ValueError("the stride length must match the spatial rank")
    if len(dilation) != nd:
        raise ValueError("the dilation length must match the spatial rank")
    if any(s < 1 for s in stride) or any(d < 1 for d in dilation):
        raise ValueError("stride and dilation must be positive")
    in_ch, k_in = input_shape[1], kernel_shape[1]
    out_ch = kernel_shape[0]
    if groups < 1:
        raise ValueError("groups must be positive")
    if in_ch % groups != 0 or out_ch % groups != 0:
        raise ValueError(
            "both the input and kernel channels must be divisible by groups"
        )
    if k_in != in_ch // groups:
        raise ValueError(
            f"kernel input channels ({k_in}) must equal input channels / groups "
            f"({in_ch} / {groups})"
        )
    for i, (inp_d, k_d, d) in enumerate(
        zip(input_shape[2:], kernel_shape[2:], dilation)
    ):
        if inp_d < d * (k_d - 1) + 1:
            raise ValueError(
                f"spatial dimension {i} is too small for the dilated kernel"
            )
