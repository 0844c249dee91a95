"""Multi-step recurrent modules (TPU-first extension).

The reference only ships single-step cells (LSTMCell/GRUCell) that users
loop in Python, growing the tape per step (SURVEY.md §5). These modules run
the whole sequence as ONE graph node whose forward is a `lax.scan` — a
single compiled program regardless of length, with the scan's backward
derived by linear transposition of the step function. Gate formulas are the
cells' (including the reference's tanh'd second LSTM gate)."""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
from jax import lax

from .. import zeros as _zeros
from ..ops.functional import _register
from ..variable import Var, VarDiff, _apply
from . import init


def _lstm_scan_fwd(e, x, w_ih, w_hh, b_ih, b_hh):
    # x: (T, B, I); weights as in LSTMCell. Returns (T, B, H) hidden seq.
    hidden = w_hh.shape[1]

    def step(carry, xt):
        c, h = carry
        gates = h @ w_hh.T + b_hh + xt @ w_ih.T + b_ih
        i, f, g, o = jnp.split(gates, 4, axis=1)
        i, f, g, o = (
            jax.nn.sigmoid(i), jnp.tanh(f), jax.nn.sigmoid(g), jax.nn.sigmoid(o)
        )
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (c, h), h

    B = x.shape[1]
    c0 = jnp.zeros((B, hidden), x.dtype)
    h0 = jnp.zeros((B, hidden), x.dtype)
    _, hs = lax.scan(step, (c0, h0), x)
    return hs


def _gru_scan_fwd(e, x, w_ih, w_hh, b_ih, b_hh):
    hidden = w_hh.shape[1]

    def step(h, xt):
        ig = xt @ w_ih.T + b_ih
        hg = h @ w_hh.T + b_hh
        i0, i1, i2 = jnp.split(ig, 3, axis=1)
        h0_, h1, h2 = jnp.split(hg, 3, axis=1)
        reset = jax.nn.sigmoid(h0_ + i0)
        inp = jax.nn.sigmoid(h1 + i1)
        new = jnp.tanh(i2 + h2 * reset)
        h = (h - new) * inp + new
        return h, h

    B = x.shape[1]
    h0 = jnp.zeros((B, hidden), x.dtype)
    _, hs = lax.scan(step, h0, x)
    return hs


def _scan_vjp(fwd):
    def vjp(e, p, o, g):
        _, pull = jax.vjp(lambda *args: fwd(e, *args), *p)
        return pull(g)

    return vjp


_register("lstm_scan", _lstm_scan_fwd, _scan_vjp(_lstm_scan_fwd))
_register("gru_scan", _gru_scan_fwd, _scan_vjp(_gru_scan_fwd))


class _RecurrentBase:
    _op = ""
    _gates = 0

    def __init__(self, input_size: int, hidden_size: int) -> None:
        xh = self._gates * hidden_size
        self.weight_ih = _zeros((xh, input_size)).requires_grad()
        self.weight_hh = _zeros((xh, hidden_size)).requires_grad()
        self.bias_ih = _zeros(xh).requires_grad()
        self.bias_hh = _zeros(xh).requires_grad()
        k = math.sqrt(1.0 / hidden_size)
        for p in self.parameters():
            init.uniform(p, -k, k)

    def parameters(self) -> List[VarDiff]:
        return [self.weight_ih, self.weight_hh, self.bias_ih, self.bias_hh]

    def forward(self, x: Var) -> VarDiff:
        """x (T, B, input) -> hidden states (T, B, hidden) as one node."""
        return _apply(
            self._op,
            (x, self.weight_ih, self.weight_hh, self.bias_ih, self.bias_hh),
        )


class LSTM(_RecurrentBase):
    """Whole-sequence LSTM as a single scan node."""

    _op = "lstm_scan"
    _gates = 4


class GRU(_RecurrentBase):
    """Whole-sequence GRU as a single scan node."""

    _op = "gru_scan"
    _gates = 3
