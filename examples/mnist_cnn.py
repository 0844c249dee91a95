"""MNIST-style CNN training (BASELINE.md configs[1]) on synthetic digits.

Demonstrates: Conv2d + MaxPool + Dropout + Adam + L2 through the
define-by-run API, with the executor staging each batch's tape into one
XLA program (compiled once, reused every batch)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import neuronika_tpu as nk
from neuronika_tpu import models, optim


def synthetic_digits(n, rng):
    """Blurry oriented-bar 'digits' — enough structure to overfit."""
    ys = rng.integers(0, 10, n)
    xs = np.zeros((n, 1, 28, 28), np.float32)
    for i, y in enumerate(ys):
        r0, c0 = 4 + (y % 5) * 4, 4 + (y // 5) * 8
        xs[i, 0, r0:r0 + 3, c0:c0 + 12] = 1.0
        xs[i, 0] += rng.normal(0, 0.1, (28, 28))
    return xs, ys.astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    X, Y = synthetic_digits(256, rng)

    cnn = models.MnistCNN(channels=8, hidden=32, dropout=0.25)
    opt = optim.Adam(1e-3, penalty=optim.L2(1e-4))
    opt.register_all(cnn.parameters())

    batch = 64
    for epoch in range(3):
        perm = rng.permutation(len(X))
        total, correct = 0.0, 0
        for i in range(0, len(X), batch):
            idx = perm[i:i + batch]
            logits = cnn.forward(nk.from_ndarray(X[idx]))
            # softmax-CE from primitives: log_softmax + NLL (class axis first)
            loss = logits.log_softmax(1).t().nll(
                nk.from_ndarray(Y[idx]), nk.Reduction.Mean
            )
            loss.forward()
            loss.backward(1.0)
            opt.step()
            opt.zero_grad()
            total += loss.item()
            pred = np.asarray(logits.data()).argmax(1)
            correct += int((pred == Y[idx]).sum())
        print(f"epoch {epoch}: loss {total:.3f} acc {correct / len(X):.2%}")


if __name__ == "__main__":
    main()
