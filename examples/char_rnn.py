"""Character-level LSTM language model (BASELINE.md configs[2]).

Variable-length sequences through the define-by-run API: the graph is
rebuilt per batch (per length), and the executor's trace cache compiles one
XLA program per distinct length — no per-step recompile blowup. After
training, samples text greedily."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import neuronika_tpu as nk
from neuronika_tpu import models, optim
from neuronika_tpu.models.rnn import one_hot

TEXT = (
    "the quick brown fox jumps over the lazy dog. "
    "pack my box with five dozen liquor jugs. "
) * 8


def main():
    nk.seed(0)
    chars = sorted(set(TEXT))
    stoi = {c: i for i, c in enumerate(chars)}
    ids = np.array([stoi[c] for c in TEXT], dtype=np.int64)

    rnn = models.CharRNN(vocab=len(chars), hidden=96, cell="lstm")
    opt = optim.Adam(1e-2)
    opt.register_all(rnn.parameters())

    rng = np.random.default_rng(0)
    lengths = [8, 12, 16]  # variable-length batches — 3 compiles total
    for step in range(240):
        T = lengths[step % len(lengths)]
        starts = rng.integers(0, len(ids) - T - 1, size=8)
        batch = np.stack([ids[s:s + T] for s in starts])
        target = np.stack([ids[s + 1:s + T + 1] for s in starts])
        loss = rnn.loss(batch, target)
        loss.forward()
        loss.backward(1.0)
        opt.step()
        opt.zero_grad()
        if step % 80 == 0:
            print(f"step {step}: loss {loss.item():.3f}")

    # greedy sampling
    out = [stoi["t"]]
    h = nk.zeros((1, 96))
    c = nk.zeros((1, 96))
    for _ in range(40):
        x = nk.from_ndarray(one_hot(np.array([[out[-1]]]), len(chars))[:, 0])
        c, h = rnn.cell.forward((c, h), x)
        logits = rnn.readout.forward(h)
        logits.forward()
        out.append(int(np.asarray(logits.data()).argmax()))
    print("sample:", "".join(chars[i] for i in out))


if __name__ == "__main__":
    main()
