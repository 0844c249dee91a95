"""Neural-network layers (reference: neuronika-nn/src/lib.rs).

Layers are thin objects holding `VarDiff` parameters; `forward` builds the
define-by-run graph with the same formulas as the reference. The pre-rewrite
API the reference documents but lost in its snapshot (`ModelStatus`,
`Learnable`, a `Dropout` layer, `GroupedConv*d`, the `nn::loss` module —
neuronika-nn/src/lib.rs:142-387, examples/quickstart.rs:4-14) is provided
here as working code.

Conv layers implement the forward the reference left as `todo!()`
(lib.rs:716,813,914): pad → kernel.convolution(input, stride, dilation,
groups) → + bias.
"""

from __future__ import annotations

import math
from typing import List, Tuple

from ..variable import StatusCell, Var, VarDiff
from .. import zeros as _zeros
from . import init
from . import loss
from .recurrent import GRU, LSTM

__all__ = [
    "Linear", "LSTMCell", "GRUCell", "LSTM", "GRU",
    "Conv1d", "Conv2d", "Conv3d",
    "GroupedConv1d", "GroupedConv2d", "GroupedConv3d",
    "Dropout", "ModelStatus", "Learnable", "init", "loss",
]

# `Learnable` in the old API is the parameter view type; here a learnable
# parameter simply *is* a `VarDiff` (quickstart.rs:4-6).
Learnable = VarDiff
Param = VarDiff


class ModelStatus:
    """Train/eval switch + parameter registry (the pre-rewrite API used by
    examples/quickstart.rs:19-31; capability required by SURVEY.md §2.3).

    `register(layer)` records the layer's parameters and hands the shared
    status cell to layers with stochastic behaviour (Dropout)."""

    def __init__(self) -> None:
        self._cell = StatusCell(True)
        self._params: List[VarDiff] = []

    @classmethod
    def default(cls) -> "ModelStatus":
        return cls()

    @property
    def cell(self) -> StatusCell:
        return self._cell

    def register(self, layer):
        self._params.extend(layer.parameters())
        if hasattr(layer, "set_status"):
            layer.set_status(self._cell)
        return layer

    def parameters(self) -> List[VarDiff]:
        return list(self._params)

    def train(self) -> None:
        self._cell.set(True)

    def eval(self) -> None:
        self._cell.set(False)


class Linear:
    """y = x·Wᵀ + b (reference lib.rs:406-448). weight (out, in), bias
    (out,), both U(-k, k) with k = √(1/in)."""

    def __init__(self, in_features: int, out_features: int) -> None:
        self.weight = _zeros((out_features, in_features)).requires_grad()
        self.bias = _zeros(out_features).requires_grad()
        k = math.sqrt(1.0 / in_features)
        init.uniform(self.weight, -k, k)
        init.uniform(self.bias, -k, k)

    def parameters(self) -> List[VarDiff]:
        return [self.weight, self.bias]

    def forward(self, input: Var) -> VarDiff:
        return input.mm_t(self.weight) + self.bias


class LSTMCell:
    """Single LSTM step (reference lib.rs:453-541).

    Faithful to the reference's quirks: the state tuple is
    ``(cell_state, hidden)`` (cell first), and the gate activations in chunk
    order are (sigmoid, **tanh**, sigmoid, sigmoid) — the second chunk (the
    forget gate slot) is tanh'd (lib.rs:531-536). All params U(-k, k),
    k = √(1/hidden)."""

    def __init__(self, input_size: int, hidden_size: int) -> None:
        x4 = 4 * hidden_size
        self.weight_ih = _zeros((x4, input_size)).requires_grad()
        self.weight_hh = _zeros((x4, hidden_size)).requires_grad()
        self.bias_ih = _zeros(x4).requires_grad()
        self.bias_hh = _zeros(x4).requires_grad()
        k = math.sqrt(1.0 / hidden_size)
        for p in self.parameters():
            init.uniform(p, -k, k)

    def parameters(self) -> List[VarDiff]:
        return [self.weight_ih, self.weight_hh, self.bias_ih, self.bias_hh]

    def forward(self, state: Tuple[Var, Var], input: Var) -> Tuple[VarDiff, VarDiff]:
        cell_state, hidden = state
        gates = (
            hidden.mm_t(self.weight_hh)
            + self.bias_hh
            + input.mm_t(self.weight_ih)
            + self.bias_ih
        )
        batch, x4 = gates.shape
        g = gates.chunks((batch, x4 // 4))
        input_gate = g[0].sigmoid()
        forget_gate = g[1].tanh()
        cell_gate = g[2].sigmoid()
        output_gate = g[3].sigmoid()
        new_cell = forget_gate * cell_state + input_gate * cell_gate
        new_hidden = output_gate * new_cell.tanh()
        return new_cell, new_hidden


class GRUCell:
    """Single GRU step (reference lib.rs:547-625)."""

    def __init__(self, input_size: int, hidden_size: int) -> None:
        x3 = 3 * hidden_size
        self.weight_ih = _zeros((x3, input_size)).requires_grad()
        self.weight_hh = _zeros((x3, hidden_size)).requires_grad()
        self.bias_ih = _zeros(x3).requires_grad()
        self.bias_hh = _zeros(x3).requires_grad()
        k = math.sqrt(1.0 / hidden_size)
        for p in self.parameters():
            init.uniform(p, -k, k)

    def parameters(self) -> List[VarDiff]:
        return [self.weight_ih, self.weight_hh, self.bias_ih, self.bias_hh]

    def forward(self, hidden: Var, input: Var) -> VarDiff:
        igates = input.mm_t(self.weight_ih) + self.bias_ih
        hgates = hidden.mm_t(self.weight_hh) + self.bias_hh
        batch, x3 = hgates.shape
        ig = igates.chunks((batch, x3 // 3))
        hg = hgates.chunks((batch, x3 // 3))
        reset_gate = (hg[0] + ig[0]).sigmoid()
        input_gate = (hg[1] + ig[1]).sigmoid()
        new_gate = (ig[2] + hg[2] * reset_gate).tanh()
        return (hidden - new_gate) * input_gate + new_gate


class _ConvNd:
    """Shared conv-layer machinery (reference Conv{1,2,3}d, lib.rs:630-916,
    plus the documented-but-dropped GroupedConv variants). weight
    (out, in/groups, *kernel), bias (out,), U(-k, k) with
    k = √(groups / (in · ∏kernel))."""

    _nd: int = 0

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        padding,
        padding_mode,
        stride,
        dilation,
        groups: int = 1,
    ) -> None:
        nd = self._nd
        ks = self._tuple(kernel_size)
        self.padding = self._tuple(padding)
        self.padding_mode = padding_mode
        self.stride = self._tuple(stride)
        self.dilation = self._tuple(dilation)
        self.groups = int(groups)
        if in_channels % self.groups or out_channels % self.groups:
            raise ValueError("in/out channels must be divisible by groups")
        self.weight = _zeros(
            (out_channels, in_channels // self.groups, *ks)
        ).requires_grad()
        self.bias = _zeros(out_channels).requires_grad()
        recep = 1
        for k in ks:
            recep *= k
        k = math.sqrt(self.groups / (in_channels * recep))
        init.uniform(self.weight, -k, k)
        init.uniform(self.bias, -k, k)

    def _tuple(self, v) -> Tuple[int, ...]:
        if isinstance(v, (tuple, list)):
            if len(v) != self._nd:
                raise ValueError(f"expected {self._nd} values, got {len(v)}")
            return tuple(int(x) for x in v)
        return (int(v),) * self._nd

    def parameters(self) -> List[VarDiff]:
        return [self.weight, self.bias]

    def forward(self, input: Var) -> VarDiff:
        x = input
        if any(self.padding):
            x = x.pad(self.padding, self.padding_mode)
        out = self.weight.convolution(x, self.stride, self.dilation, self.groups)
        b = self.bias
        for _ in range(self._nd):
            b = b.unsqueeze(1)  # (out,) -> (out, 1, ...): broadcasts over N
        return out + b


class Conv1d(_ConvNd):
    _nd = 1

    def __init__(self, in_channels, out_channels, kernel_size, padding,
                 padding_mode, stride, dilation, groups: int = 1):
        super().__init__(in_channels, out_channels, kernel_size, padding,
                         padding_mode, stride, dilation, groups)


class Conv2d(_ConvNd):
    _nd = 2

    def __init__(self, in_channels, out_channels, kernel_size, padding,
                 padding_mode, stride, dilation, groups: int = 1):
        super().__init__(in_channels, out_channels, kernel_size, padding,
                         padding_mode, stride, dilation, groups)


class Conv3d(_ConvNd):
    _nd = 3

    def __init__(self, in_channels, out_channels, kernel_size, padding,
                 padding_mode, stride, dilation, groups: int = 1):
        super().__init__(in_channels, out_channels, kernel_size, padding,
                         padding_mode, stride, dilation, groups)


def _grouped(cls):
    class Grouped(cls):
        def __init__(self, in_channels, out_channels, kernel_size, padding,
                     padding_mode, stride, dilation, groups):
            super().__init__(in_channels, out_channels, kernel_size, padding,
                             padding_mode, stride, dilation, groups)

    Grouped.__name__ = "Grouped" + cls.__name__
    Grouped.__qualname__ = Grouped.__name__
    Grouped.__doc__ = (
        f"Grouped variant of {cls.__name__} (documented in the reference "
        "facade, neuronika-nn/src/lib.rs:142-387)."
    )
    return Grouped


GroupedConv1d = _grouped(Conv1d)
GroupedConv2d = _grouped(Conv2d)
GroupedConv3d = _grouped(Conv3d)


class Dropout:
    """Dropout layer wired to a ModelStatus train/eval cell (the pre-rewrite
    API; the op itself is var.rs:375-393)."""

    def __init__(self, p: float) -> None:
        if not 0.0 <= p <= 1.0:
            raise ValueError(
                f"dropout probability has to be between 0 and 1, but got {p}"
            )
        self.p = float(p)
        self._status = StatusCell(True)

    def set_status(self, cell: StatusCell) -> None:
        self._status = cell

    def parameters(self) -> List[VarDiff]:
        return []

    def forward(self, input: Var) -> Var:
        return input.dropout(self.p, self._status)
