"""Dimensionality sweep: the reference is dimension-typed over Ix0..Ix6
(+IxDyn); ops here must behave across the same rank range."""

import numpy as np
import pytest

import neuronika_tpu as nk
from tests.conftest import assert_close

RANK_SHAPES = {
    0: (),
    1: (5,),
    2: (3, 4),
    3: (2, 3, 4),
    4: (2, 2, 3, 2),
    5: (2, 1, 3, 2, 2),
    6: (2, 1, 2, 1, 3, 2),
}


def rnd(shape):
    return np.asarray(np.random.randn(*shape), dtype=np.float32)


@pytest.mark.parametrize("rank", list(RANK_SHAPES))
def test_elementwise_all_ranks(rank):
    shape = RANK_SHAPES[rank]
    a, b = rnd(shape), rnd(shape)
    x = nk.from_ndarray(a).requires_grad()
    y = nk.from_ndarray(b)
    out = (x * y + x).tanh().sum()
    out.forward()
    assert_close(out.data(), (np.tanh(a * b + a)).sum(), tol=1e-4)
    out.backward(1.0)
    expected = (1 - np.tanh(a * b + a) ** 2) * (b + 1)
    assert_close(x.grad(), expected, tol=1e-4)


@pytest.mark.parametrize("rank", [1, 2, 3, 4, 5, 6])
def test_transpose_all_ranks(rank):
    shape = RANK_SHAPES[rank]
    a = rnd(shape)
    v = nk.from_ndarray(a)
    t = v.t()
    t.forward()
    assert_close(t.data(), np.transpose(a))


@pytest.mark.parametrize("rank", [1, 2, 3, 4, 5])
def test_unsqueeze_cat_stack_all_ranks(rank):
    shape = RANK_SHAPES[rank]
    a = rnd(shape)
    v = nk.from_ndarray(a)
    u = v.unsqueeze(0)
    u.forward()
    assert u.shape == (1, *shape)
    c = nk.cat(v, nk.from_ndarray(a), 0)
    c.forward()
    assert c.shape == (shape[0] * 2, *shape[1:])
    s = nk.stack(v, nk.from_ndarray(a), 0)
    s.forward()
    assert s.shape == (2, *shape)


@pytest.mark.parametrize("rank", [2, 3, 4, 5, 6])
def test_chunks_all_ranks(rank):
    shape = RANK_SHAPES[rank]
    a = rnd(shape)
    v = nk.from_ndarray(a)
    cs = v.chunks(shape)  # single full-size chunk
    assert len(cs) == 1
    cs[0].forward()
    assert_close(cs[0].data(), a)


def test_scalar_rank0_losses():
    a = nk.from_ndarray(rnd(())).requires_grad()
    loss = a.mse(nk.from_ndarray(np.float32(0.0)), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
    assert np.isfinite(np.asarray(a.grad())).all()


@pytest.mark.parametrize("rank", [3, 4, 5])
def test_dropout_all_spatial_ranks(rank):
    shape = RANK_SHAPES[rank]
    v = nk.ones(shape)
    d = v.dropout(0.3, nk.StatusCell(True))
    d.forward()
    assert d.shape == shape


@pytest.mark.parametrize("rank", [3, 4, 5])
def test_pad_all_spatial_ranks(rank):
    """Padding applies to the trailing spatial dims for conv{1,2,3}d inputs."""
    shape = RANK_SHAPES[rank]
    nd = rank - 2
    v = nk.from_ndarray(rnd(shape))
    p = v.pad((1,) * nd, nk.Zero())
    p.forward()
    expected_shape = (*shape[:2], *(s + 2 for s in shape[2:]))
    assert p.shape == expected_shape


def test_broadcast_across_ranks():
    # rank-6 against rank-1 broadcast with un-reduction in backward
    a = rnd(RANK_SHAPES[6])
    b = rnd((2,))
    x = nk.from_ndarray(b).requires_grad()
    out = (nk.from_ndarray(a) * x).sum()
    out.forward()
    out.backward(1.0)
    expected = a.reshape(-1, 2).sum(0)
    assert_close(x.grad(), expected, tol=1e-3)
