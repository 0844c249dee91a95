"""BASELINE.md configs[3]: Conv1d/Conv3d stride/dilation/groups ×
optimizers — finite-difference gradcheck sweep + one optimizer step each."""

import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu import optim
from neuronika_tpu.utils.gradcheck import gradcheck


def rnd(*shape):
    return np.asarray(np.random.randn(*shape), dtype=np.float32)


CONV_CASES = [
    # (input shape, kernel shape, stride, dilation, groups)
    ((1, 2, 8), (3, 2, 3), (1,), (1,), 1),
    ((1, 2, 9), (2, 2, 3), (2,), (1,), 1),
    ((1, 2, 9), (2, 2, 2), (1,), (2,), 1),
    ((1, 4, 7), (4, 2, 3), (1,), (1,), 2),
    ((1, 2, 5, 5), (2, 2, 2, 2), (1, 1), (1, 1), 1),
    ((1, 1, 4, 4, 4), (1, 1, 2, 2, 2), (1, 1, 1), (1, 1, 1), 1),
]


@pytest.mark.parametrize("xs,ks,stride,dil,groups", CONV_CASES)
def test_conv_gradcheck(xs, ks, stride, dil, groups):
    x = rnd(*xs)
    k = rnd(*ks) * 0.5

    def build(kern, inp):
        return kern.convolution(inp, stride, dil, groups).sum()

    gradcheck(build, [k, x])


def test_dense_chain_gradcheck():
    x = rnd(3, 4)
    w = rnd(2, 4) * 0.5

    def build(xv, wv):
        return xv.mm_t(wv).tanh().mse(nk.zeros((3, 2)), nk.Reduction.Mean)

    gradcheck(build, [x, w])


OPTIMIZERS = [
    lambda: optim.StochasticGD(0.01),
    lambda: optim.StochasticGD(0.01, momentum=0.9, nesterov=True),
    lambda: optim.Adam(0.01),
    lambda: optim.AMSGrad(0.01),
    lambda: optim.Adagrad(0.01),
    lambda: optim.RMSProp(0.01, alpha=0.9),
]


@pytest.mark.parametrize("make_opt", OPTIMIZERS)
def test_conv_train_step_each_optimizer(make_opt):
    """A Conv1d (stride+dilation+groups) kernel updated by every optimizer
    family: loss decreases over a few steps."""
    kernel = nk.from_ndarray(rnd(4, 2, 3) * 0.3).requires_grad()
    x = nk.from_ndarray(rnd(2, 4, 12))
    opt = make_opt()
    opt.register(kernel)
    losses = []
    for _ in range(8):
        loss = kernel.convolution(x, (2,), (2,), 2).pow(2).mean()
        loss.forward()
        loss.backward(1.0)
        opt.step()
        opt.zero_grad()
        losses.append(loss.item())
    assert losses[-1] < losses[0]
