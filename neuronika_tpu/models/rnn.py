"""Character-level RNN (BASELINE.md configs[2]: char-LSTM/GRU over
variable-length sequences, no per-step recompile blowup).

The reference's recurrent story is LSTMCell/GRUCell stepped in a user loop
with a dynamic graph (SURVEY.md §5 long-context row). Here the same usage
pattern hits the executor's trace cache: one compile per distinct sequence
length (bucketable by the caller), then pure cache hits."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .. import from_ndarray, zeros
from .. import nn
from ..variable import Reduction, Var, VarDiff


def one_hot(ids: np.ndarray, vocab: int) -> np.ndarray:
    out = np.zeros((*ids.shape, vocab), dtype=np.float32)
    np.put_along_axis(out, ids[..., None].astype(np.int64), 1.0, axis=-1)
    return out


class CharRNN:
    """One-hot input → {LSTM|GRU}Cell loop → Linear readout per step."""

    def __init__(self, vocab: int, hidden: int, cell: str = "lstm") -> None:
        self.vocab = vocab
        self.hidden = hidden
        self.kind = cell
        self.status = nn.ModelStatus.default()
        if cell == "lstm":
            self.cell = self.status.register(nn.LSTMCell(vocab, hidden))
        elif cell == "gru":
            self.cell = self.status.register(nn.GRUCell(vocab, hidden))
        else:
            raise ValueError("cell must be 'lstm' or 'gru'")
        self.readout = self.status.register(nn.Linear(hidden, vocab))

    def parameters(self) -> List[VarDiff]:
        return self.status.parameters()

    def forward_sequence(self, ids: np.ndarray) -> List[VarDiff]:
        """ids (B, T) int -> per-step logits [(B, vocab)] * T, dynamic graph
        rebuilt per call (the reference's define-by-run contract)."""
        B, T = ids.shape
        h = zeros((B, self.hidden))
        c = zeros((B, self.hidden))
        state: Tuple[Var, Var] = (c, h)
        logits = []
        xs = one_hot(ids, self.vocab)
        for t in range(T):
            x = from_ndarray(xs[:, t])
            if self.kind == "lstm":
                state = self.cell.forward(state, x)
                h_t = state[1]
            else:
                h_t = self.cell.forward(state[1], x)
                state = (state[0], h_t)
            logits.append(self.readout.forward(h_t))
        return logits

    def loss(self, ids: np.ndarray, targets: np.ndarray) -> VarDiff:
        """Mean softmax-CE over all steps via the reference's NLL
        (class-axis-first) + log_softmax primitives."""
        logits = self.forward_sequence(ids)
        total = None
        for t, step_logits in enumerate(logits):
            # NLL expects (C, N) with class axis first (nll/mod.rs:46-68)
            logp = step_logits.log_softmax(1).t()
            tgt = from_ndarray(targets[:, t].astype(np.float32))
            step_loss = logp.nll(tgt, Reduction.Sum)
            total = step_loss if total is None else total + step_loss
        return total * (1.0 / (ids.shape[0] * ids.shape[1]))
