"""Convolution kernel tests (reference tier: node/convolution/test.rs,
1328 LoC of goldens — plain/strided/dilated/grouped × {fwd, bwd-input,
bwd-kernel} for 1/2/3-d). Oracles: torch.nn.functional conv (CPU) for
forward and jax.grad for both backward paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from neuronika_tpu.ops.functional import OPS
import neuronika_tpu as nk
from tests.conftest import assert_close


def rnd(*shape):
    return np.asarray(np.random.randn(*shape), dtype=np.float32)


TORCH_CONV = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}

CASES = [
    # (nd, N, Cin, Cout, spatial, kernel, stride, dilation, groups)
    (1, 2, 3, 4, (11,), (3,), (1,), (1,), 1),
    (1, 2, 3, 4, (11,), (3,), (2,), (1,), 1),
    (1, 2, 3, 4, (13,), (3,), (1,), (2,), 1),
    (1, 2, 4, 6, (11,), (3,), (2,), (2,), 2),
    (2, 2, 3, 4, (8, 9), (3, 3), (1, 1), (1, 1), 1),
    (2, 2, 3, 4, (9, 8), (3, 2), (2, 2), (1, 1), 1),
    (2, 2, 3, 4, (11, 11), (3, 3), (1, 1), (2, 2), 1),
    (2, 1, 4, 4, (8, 8), (3, 3), (2, 1), (1, 2), 4),  # depthwise-ish
    (2, 2, 6, 4, (10, 10), (3, 3), (2, 2), (2, 1), 2),
    (3, 1, 2, 3, (6, 7, 6), (2, 3, 2), (1, 1, 1), (1, 1, 1), 1),
    (3, 1, 2, 4, (7, 7, 7), (3, 3, 3), (2, 2, 2), (1, 1, 1), 2),
    (3, 1, 2, 2, (8, 6, 6), (2, 2, 2), (1, 2, 1), (2, 1, 2), 1),
]


@pytest.mark.parametrize("nd,N,Cin,Cout,sp,k,stride,dil,groups", CASES)
def test_conv_forward_matches_torch(nd, N, Cin, Cout, sp, k, stride, dil, groups):
    x = rnd(N, Cin, *sp)
    w = rnd(Cout, Cin // groups, *k)
    ours = OPS["convolution"].fwd((stride, dil, groups), jnp.asarray(w), jnp.asarray(x))
    ref = TORCH_CONV[nd](
        torch.from_numpy(x), torch.from_numpy(w),
        stride=stride, dilation=dil, groups=groups,
    ).numpy()
    assert_close(ours, ref, tol=1e-4)


@pytest.mark.parametrize("nd,N,Cin,Cout,sp,k,stride,dil,groups", CASES)
def test_conv_backward_matches_jax_grad(nd, N, Cin, Cout, sp, k, stride, dil, groups):
    extra = (stride, dil, groups)
    op = OPS["convolution"]
    x = jnp.asarray(rnd(N, Cin, *sp))
    w = jnp.asarray(rnd(Cout, Cin // groups, *k))
    out = op.fwd(extra, w, x)
    g = jnp.asarray(rnd(*out.shape))

    dk, dx = op.vjp(extra, [w, x], out, g)

    def scalarized(wk, xi):
        return (op.fwd(extra, wk, xi) * g).sum()

    exp_dk, exp_dx = jax.grad(scalarized, argnums=(0, 1))(w, x)
    assert_close(dk, exp_dk, tol=1e-4)
    assert_close(dx, exp_dx, tol=1e-4)


def test_conv_backward_matches_torch():
    # independent second oracle for one grouped strided dilated case
    x = rnd(2, 4, 12, 12)
    w = rnd(6, 2, 3, 3)
    stride, dil, groups = (2, 2), (2, 1), 2
    tx = torch.from_numpy(x).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)
    out = F.conv2d(tx, tw, stride=stride, dilation=dil, groups=groups)
    gnp = rnd(*out.shape)
    out.backward(torch.from_numpy(gnp))

    op = OPS["convolution"]
    extra = (stride, dil, groups)
    jout = op.fwd(extra, jnp.asarray(w), jnp.asarray(x))
    dk, dx = op.vjp(extra, [jnp.asarray(w), jnp.asarray(x)], jout, jnp.asarray(gnp))
    assert_close(dk, tw.grad.numpy(), tol=1e-4)
    assert_close(dx, tx.grad.numpy(), tol=1e-4)


def test_pad_then_conv_composition():
    """Reference composes padding via the pad op (var.rs:726); same-padding
    conv layer output must match torch's padding= argument."""
    x = rnd(2, 3, 9, 9)
    w = rnd(4, 3, 3, 3)
    xp = OPS["pad"].fwd(((1, 1), "zero", 0.0), jnp.asarray(x))
    ours = OPS["convolution"].fwd(((1, 1), (1, 1), 1), jnp.asarray(w), xp)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    assert_close(ours, ref, tol=1e-4)


def test_convolution_api_kernel_is_receiver():
    """API parity: kernel.convolution(input, stride, dilation[, groups])
    (var.rs:704-724)."""
    kernel = nk.rand((4, 3, 3, 3)).requires_grad()
    image = nk.rand((2, 3, 8, 8))
    out = kernel.convolution(image, (1, 1), (1, 1))
    out.forward()
    assert out.shape == (2, 4, 6, 6)
    loss = out.sum()
    loss.forward()
    loss.backward(1.0)
    assert np.abs(np.asarray(kernel.grad())).sum() > 0


def test_conv_arg_validation():
    kernel = nk.rand((4, 3, 3, 3))
    image = nk.rand((2, 3, 8, 8))
    with pytest.raises(ValueError):
        kernel.convolution(image, (1, 1, 1), (1, 1))  # wrong stride rank
    with pytest.raises(ValueError):
        kernel.convolution(image, (0, 1), (1, 1))  # non-positive stride
    with pytest.raises(ValueError):
        kernel.convolution(image, (1, 1), (1, 1), 2)  # channel mismatch
    small = nk.rand((2, 3, 2, 2))
    with pytest.raises(ValueError):
        kernel.convolution(small, (1, 1), (2, 2))  # dilated kernel too big
