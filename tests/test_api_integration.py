"""API-integration tier: every public op in both Var and VarDiff flavors
(mirrors neuronika-variable/src/test.rs, 73 tests — build graph, forward(),
assert data; `_diff` variants also run backward)."""

import numpy as np
import pytest

import neuronika_tpu as nk
from tests.conftest import assert_close


A = np.arange(1.0, 7.0, dtype=np.float32).reshape(2, 3)
B = np.arange(6.0, 0.0, -1.0, dtype=np.float32).reshape(2, 3)


def both_flavors(op, expected, *arrays, tol=1e-5):
    """Run `op` on Var operands, then on VarDiff operands (backward too)."""
    vs = [nk.from_ndarray(a) for a in arrays]
    out = op(*vs)
    out.forward()
    assert_close(out.data(), expected, tol=tol)
    assert isinstance(out, nk.Var) and not isinstance(out, nk.VarDiff)

    ds = [nk.from_ndarray(a).requires_grad() for a in arrays]
    outd = op(*ds)
    outd.forward()
    assert_close(outd.data(), expected, tol=tol)
    assert isinstance(outd, nk.VarDiff)
    outd.sum().forward() if outd.shape else None
    root = outd.sum() if outd.shape else outd
    root.forward()
    root.backward(1.0)
    for d in ds:
        assert np.isfinite(np.asarray(d.grad())).all()


def test_add():
    both_flavors(lambda a, b: a + b, A + B, A, B)


def test_sub():
    both_flavors(lambda a, b: a - b, A - B, A, B)


def test_mul():
    both_flavors(lambda a, b: a * b, A * B, A, B)


def test_div():
    both_flavors(lambda a, b: a / b, A / B, A, B)


def test_neg():
    both_flavors(lambda a: -a, -A, A)


def test_scalar_operands():
    both_flavors(lambda a: a + 1.0, A + 1, A)
    both_flavors(lambda a: 2.0 * a, 2 * A, A)
    both_flavors(lambda a: a / 2.0, A / 2, A)
    both_flavors(lambda a: 1.0 - a, 1 - A, A)


def test_pow():
    both_flavors(lambda a: a.pow(3), A**3, A, tol=1e-4)


def test_sqrt():
    both_flavors(lambda a: a.sqrt(), np.sqrt(A), A)


def test_exp_ln():
    both_flavors(lambda a: a.exp(), np.exp(A), A, tol=1e-4)
    both_flavors(lambda a: a.ln(), np.log(A), A)


def test_activations():
    X = A - 3.5
    both_flavors(lambda a: a.relu(), np.maximum(X, 0), X)
    both_flavors(lambda a: a.leaky_relu(), np.where(X > 0, X, 0.01 * X), X)
    both_flavors(lambda a: a.sigmoid(), 1 / (1 + np.exp(-X)), X)
    both_flavors(lambda a: a.tanh(), np.tanh(X), X)
    both_flavors(lambda a: a.softplus(), np.log1p(np.exp(X)), X, tol=1e-4)


def test_softmax_flavors():
    e = np.exp(A - A.max(1, keepdims=True))
    sm = e / e.sum(1, keepdims=True)
    both_flavors(lambda a: a.softmax(1), sm, A)
    both_flavors(lambda a: a.log_softmax(1), np.log(sm), A)


def test_reductions():
    both_flavors(lambda a: a.sum(), A.sum(), A)
    both_flavors(lambda a: a.mean(), A.mean(), A)


def test_transpose_unsqueeze():
    both_flavors(lambda a: a.t(), A.T, A)
    both_flavors(lambda a: a.unsqueeze(0), A[None], A)
    both_flavors(lambda a: a.unsqueeze(2), A[:, :, None], A)


def test_matmuls():
    M = np.random.randn(3, 4).astype(np.float32)
    V = np.random.randn(3).astype(np.float32)
    both_flavors(lambda a, b: a.mm(b), A @ M, A, M, tol=1e-4)
    both_flavors(lambda a, b: a.mm_t(b), A @ B.T, A, B, tol=1e-4)
    both_flavors(lambda a, b: a.mv(b), A @ V, A, V, tol=1e-4)
    both_flavors(lambda v, m: v.vm(m), V @ M, V, M, tol=1e-4)
    both_flavors(lambda u, w: u.vv(w), V @ V, V, V, tol=1e-4)


def test_cat_stack_methods():
    both_flavors(lambda a, b: a.cat([b], 0), np.concatenate([A, B], 0), A, B)
    both_flavors(lambda a, b: a.stack([b], 0), np.stack([A, B], 0), A, B)
    both_flavors(lambda a, b: nk.cat(a, b, 1), np.concatenate([A, B], 1), A, B)
    both_flavors(lambda a, b: nk.stack(a, b, 1), np.stack([A, B], 1), A, B)


def test_losses_both_flavors():
    # target stays a plain Var (the reference's signature, var.rs:440-521)
    t = nk.from_ndarray(B)
    for name, expected in [
        ("mae", np.abs(A - B).mean()),
        ("mse", ((A - B) ** 2).mean()),
    ]:
        v = getattr(nk.from_ndarray(A), name)(t, nk.Reduction.Mean)
        v.forward()
        assert_close(v.data(), expected)
        d = getattr(nk.from_ndarray(A).requires_grad(), name)(t, nk.Reduction.Mean)
        d.forward()
        d.backward(1.0)


def test_differentiate_loop():
    """Repeated forward/backward on the same graph accumulates gradients
    (reference test.rs:128 `differentiate_loop`)."""
    x = nk.full((2, 2), 3.0).requires_grad()
    y = (x * x).sum()
    for i in range(1, 5):
        y.forward()
        y.backward(1.0)
        assert_close(x.grad(), np.full((2, 2), 6.0 * i))


def test_graph_rebuilt_every_batch_converges():
    """The quickstart pattern: a NEW graph per batch over shared params."""
    w = nk.rand((1, 3)).requires_grad()
    opt = nk.optim.SGD(0.1)
    opt.register(w)
    X = np.random.randn(8, 3).astype(np.float32)
    Y = X @ np.array([[1.0], [2.0], [3.0]], np.float32)
    losses = []
    for _ in range(50):
        loss = nk.from_ndarray(X).mm_t(w).mse(nk.from_ndarray(Y), nk.Reduction.Mean)
        loss.forward()
        loss.backward(1.0)
        opt.step()
        opt.zero_grad()
        losses.append(loss.item())
    assert losses[-1] < 0.05 * losses[0]
