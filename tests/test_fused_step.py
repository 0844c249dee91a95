"""Fused train step (optimizer.train_step): one-program fwd+bwd+update must
match the step-by-step path exactly."""

import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu import nn, optim
from tests.conftest import assert_close


def _make_data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(16, 4)).astype(np.float32)
    Y = (X @ rng.normal(size=(4, 2)).astype(np.float32)).astype(np.float32)
    return X, Y


@pytest.mark.parametrize(
    "make_opt",
    [
        lambda: optim.SGD(0.05),
        lambda: optim.SGD(0.05, optim.L2(0.01), momentum=0.9),
        lambda: optim.Adam(0.01),
        lambda: optim.RMSProp(0.01, alpha=0.9),
    ],
)
def test_fused_matches_stepwise(make_opt):
    X, Y = _make_data()
    nk.seed(7)
    lin_a = nn.Linear(4, 2)
    lin_b = nn.Linear(4, 2)
    lin_b.weight.assign(np.asarray(lin_a.weight.data()))
    lin_b.bias.assign(np.asarray(lin_a.bias.data()))

    opt_a = make_opt()
    opt_a.register_all(lin_a.parameters())
    opt_b = make_opt()
    opt_b.register_all(lin_b.parameters())

    for _ in range(5):
        # step-by-step path
        loss_a = lin_a.forward(nk.from_ndarray(X)).mse(
            nk.from_ndarray(Y), nk.Reduction.Mean
        )
        loss_a.forward()
        loss_a.backward(1.0)
        opt_a.step()
        opt_a.zero_grad()
        # fused path
        loss_b = lin_b.forward(nk.from_ndarray(X)).mse(
            nk.from_ndarray(Y), nk.Reduction.Mean
        )
        fused_val = opt_b.train_step(loss_b)
        assert_close(fused_val, loss_a.item(), tol=1e-5)
        assert_close(lin_b.weight.data(), lin_a.weight.data(), tol=1e-5)
        assert_close(lin_b.bias.data(), lin_a.bias.data(), tol=1e-5)


def test_fused_caches_one_program():
    import neuronika_tpu._engine.executor as ex

    X, Y = _make_data()
    lin = nn.Linear(4, 2)
    opt = optim.Adam(0.01)
    opt.register_all(lin.parameters())
    for _ in range(4):
        loss = lin.forward(nk.from_ndarray(X)).mse(
            nk.from_ndarray(Y), nk.Reduction.Mean
        )
        opt.train_step(loss)
    assert len(opt._fused_cache) == 1


def test_fused_requires_leaf_params():
    lin = nn.Linear(4, 2)
    opt = optim.Adam(0.01)
    opt.register_all(lin.parameters())
    other = nk.ones((2, 2)).requires_grad()
    opt.register(other)  # not part of the loss graph
    loss = lin.forward(nk.ones((3, 4))).mse(nk.zeros((3, 2)), nk.Reduction.Mean)
    with pytest.raises(ValueError, match="leaves of the loss graph"):
        opt.train_step(loss)


def test_fused_with_dropout_and_conv():
    nk.seed(3)
    status = nk.StatusCell(True)
    kernel = nk.rand((4, 2, 3, 3)).requires_grad()
    opt = optim.Adam(1e-2)
    opt.register(kernel)
    x = nk.rand((2, 2, 8, 8))
    losses = []
    for _ in range(6):
        out = kernel.convolution(x, (1, 1), (1, 1)).relu().dropout(0.2, status)
        loss = out.pow(2).mean()
        losses.append(opt.train_step(loss))
    assert losses[-1] < losses[0]


def test_fused_with_donation_matches():
    """donate=True produces identical results (in-place buffers)."""
    X, Y = _make_data()
    nk.seed(11)
    lin_a = nn.Linear(4, 2)
    lin_b = nn.Linear(4, 2)
    lin_b.weight.assign(np.asarray(lin_a.weight.data()))
    lin_b.bias.assign(np.asarray(lin_a.bias.data()))
    opt_a, opt_b = optim.Adam(0.01), optim.Adam(0.01)
    opt_a.register_all(lin_a.parameters())
    opt_b.register_all(lin_b.parameters())
    for _ in range(4):
        la = opt_a.train_step(
            lin_a.forward(nk.from_ndarray(X)).mse(nk.from_ndarray(Y), nk.Reduction.Mean)
        )
        lb = opt_b.train_step(
            lin_b.forward(nk.from_ndarray(X)).mse(nk.from_ndarray(Y), nk.Reduction.Mean),
            donate=True,
        )
        assert_close(la, lb, tol=1e-6)
        assert_close(lin_a.weight.data(), lin_b.weight.data(), tol=1e-6)
