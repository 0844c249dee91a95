"""nn layer tests (reference tier: neuronika-nn, SURVEY.md §2.3)."""

import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu import nn
from tests.conftest import assert_close


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_linear_shapes_and_init_bounds():
    lin = nn.Linear(8, 4)
    assert lin.weight.shape == (4, 8)
    assert lin.bias.shape == (4,)
    k = np.sqrt(1.0 / 8)
    w = np.asarray(lin.weight.data())
    assert (np.abs(w) <= k).all()
    x = nk.rand((5, 8))
    y = lin.forward(x)
    y.forward()
    assert y.shape == (5, 4)
    expected = np.asarray(x.data()) @ w.T + np.asarray(lin.bias.data())
    assert_close(y.data(), expected, tol=1e-5)


def test_linear_backward_trains():
    lin = nn.Linear(3, 2)
    x = nk.ones((4, 3))
    loss = lin.forward(x).mse(nk.zeros((4, 2)), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
    assert np.abs(np.asarray(lin.weight.grad())).sum() > 0


def test_lstm_cell_matches_reference_formula():
    """The reference's quirky gate order: (sigmoid, tanh, sigmoid, sigmoid)
    over the 4 chunks, state tuple (cell, hidden) cell-first
    (neuronika-nn/src/lib.rs:512-541)."""
    cell = nn.LSTMCell(3, 4)
    B = 2
    c0 = nk.rand((B, 4))
    h0 = nk.rand((B, 4))
    x = nk.rand((B, 3))
    new_c, new_h = cell.forward((c0, h0), x)
    new_h.forward()
    new_c.forward()

    W_ih = np.asarray(cell.weight_ih.data())
    W_hh = np.asarray(cell.weight_hh.data())
    b_ih = np.asarray(cell.bias_ih.data())
    b_hh = np.asarray(cell.bias_hh.data())
    hv, cv, xv = np.asarray(h0.data()), np.asarray(c0.data()), np.asarray(x.data())
    gates = hv @ W_hh.T + b_hh + xv @ W_ih.T + b_ih
    i, f, g, o = np.split(gates, 4, axis=1)
    i, f, g, o = sigmoid(i), np.tanh(f), sigmoid(g), sigmoid(o)
    c_exp = f * cv + i * g
    h_exp = o * np.tanh(c_exp)
    assert_close(new_c.data(), c_exp, tol=1e-5)
    assert_close(new_h.data(), h_exp, tol=1e-5)


def test_gru_cell_matches_reference_formula():
    cell = nn.GRUCell(3, 4)
    h0 = nk.rand((2, 4))
    x = nk.rand((2, 3))
    out = cell.forward(h0, x)
    out.forward()

    W_ih = np.asarray(cell.weight_ih.data())
    W_hh = np.asarray(cell.weight_hh.data())
    b_ih = np.asarray(cell.bias_ih.data())
    b_hh = np.asarray(cell.bias_hh.data())
    hv, xv = np.asarray(h0.data()), np.asarray(x.data())
    ig = np.split(xv @ W_ih.T + b_ih, 3, axis=1)
    hg = np.split(hv @ W_hh.T + b_hh, 3, axis=1)
    reset = sigmoid(hg[0] + ig[0])
    inp = sigmoid(hg[1] + ig[1])
    new = np.tanh(ig[2] + hg[2] * reset)
    expected = (hv - new) * inp + new
    assert_close(out.data(), expected, tol=1e-5)


def test_rnn_cells_backprop_through_time():
    cell = nn.LSTMCell(3, 4)
    c = nk.zeros((2, 4)).requires_grad()
    h = nk.zeros((2, 4)).requires_grad()
    state = (c, h)
    for _ in range(3):  # dynamic per-step graph (reference usage pattern)
        state = cell.forward(state, nk.rand((2, 3)))
    loss = state[1].mse(nk.zeros((2, 4)), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
    assert np.abs(np.asarray(cell.weight_ih.grad())).sum() > 0


@pytest.mark.parametrize(
    "cls,nd", [(nn.Conv1d, 1), (nn.Conv2d, 2), (nn.Conv3d, 3)]
)
def test_conv_layers_forward_backward(cls, nd):
    layer = cls(
        in_channels=3, out_channels=4, kernel_size=3, padding=1,
        padding_mode=nk.Zero(), stride=1, dilation=1,
    )
    sp = (8,) * nd
    x = nk.rand((2, 3, *sp))
    y = layer.forward(x)
    y.forward()
    assert y.shape == (2, 4, *sp)  # same-padding with k=3,p=1
    loss = y.mse(nk.zeros(y.shape), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
    assert np.abs(np.asarray(layer.weight.grad())).sum() > 0
    assert np.abs(np.asarray(layer.bias.grad())).sum() > 0


def test_conv2d_matches_manual_valid_conv():
    layer = nn.Conv2d(1, 1, 2, 0, nk.Zero(), 1, 1)
    layer.weight.assign(np.ones((1, 1, 2, 2), np.float32))
    layer.bias.assign(np.zeros(1, np.float32))
    x = np.arange(16.0, dtype=np.float32).reshape(1, 1, 4, 4)
    y = layer.forward(nk.from_ndarray(x))
    y.forward()
    expected = np.zeros((1, 1, 3, 3), np.float32)
    for i in range(3):
        for j in range(3):
            expected[0, 0, i, j] = x[0, 0, i:i + 2, j:j + 2].sum()
    assert_close(y.data(), expected)


def test_grouped_conv():
    layer = nn.GroupedConv2d(4, 4, 3, 1, nk.Zero(), 1, 1, groups=2)
    assert layer.weight.shape == (4, 2, 3, 3)
    x = nk.rand((1, 4, 6, 6))
    y = layer.forward(x)
    y.forward()
    assert y.shape == (1, 4, 6, 6)


def test_model_status_train_eval_dropout():
    status = nn.ModelStatus.default()
    drop = status.register(nn.Dropout(0.5))
    lin = status.register(nn.Linear(4, 4))
    assert len(status.parameters()) == 2
    x = nk.ones((32, 4))
    y = drop.forward(x)
    y.forward()
    assert (np.asarray(y.data()) == 0).any()
    status.eval()
    y2 = drop.forward(x)
    y2.forward()
    assert_close(y2.data(), np.ones((32, 4)))


# ----------------------------------------------------------------- init


def test_fan_in_fan_out_uses_receptive_product():
    # documented divergence: product over receptive field, not the
    # reference's buggy sum (init.rs:57)
    w = nk.zeros((8, 4, 3, 3)).requires_grad()
    fi, fo = nn.init.calculate_fan_in_fan_out(w)
    assert (fi, fo) == (4 * 9, 8 * 9)


def test_calculate_gain():
    assert nn.init.calculate_gain("relu") == pytest.approx(np.sqrt(2))
    assert nn.init.calculate_gain("linear") == 1.0
    assert nn.init.calculate_gain("tanh") == pytest.approx(5 / 3)
    with pytest.raises(ValueError):
        nn.init.calculate_gain("swish")


def test_init_writers():
    w = nk.zeros((3, 3)).requires_grad()
    nn.init.constant(w, 2.5)
    assert_close(w.data(), np.full((3, 3), 2.5))
    nn.init.eye(w)
    assert_close(w.data(), np.eye(3))
    nn.init.uniform(w, -0.1, 0.1)
    assert (np.abs(np.asarray(w.data())) <= 0.1).all()
    nn.init.normal(w, 0.0, 1.0)
    nn.init.xavier_uniform(w, 1.0)
    bound = np.sqrt(6.0 / 6.0)
    assert (np.abs(np.asarray(w.data())) <= bound).all()
    nn.init.xavier_normal(w, 1.0)
    nn.init.zeros(w)
    assert_close(w.data(), np.zeros((3, 3)))
    nn.init.ones(w)
    assert_close(w.data(), np.ones((3, 3)))


def test_dirac():
    w = nk.zeros((4, 4, 3)).requires_grad()
    nn.init.dirac(w)
    arr = np.asarray(w.data())
    assert arr.sum() == 4.0
    for i in range(4):
        assert arr[i, i, 1] == 1.0


def test_scan_lstm_matches_cell_loop():
    """nn.LSTM (one scan node) must equal LSTMCell stepped in Python."""
    lstm = nn.LSTM(3, 4)
    cell = nn.LSTMCell(3, 4)
    for p, q in zip(cell.parameters(), lstm.parameters()):
        p.assign(np.asarray(q.data()))
    T, B = 5, 2
    xs = np.random.randn(T, B, 3).astype(np.float32)
    seq = lstm.forward(nk.from_ndarray(xs))
    seq.forward()
    state = (nk.zeros((B, 4)), nk.zeros((B, 4)))
    outs = []
    for t in range(T):
        state = cell.forward(state, nk.from_ndarray(xs[t]))
        outs.append(state[1])
    last = outs[-1]
    last.forward()
    assert_close(np.asarray(seq.data())[-1], np.asarray(last.data()), tol=1e-5)
    # backward flows to all params through the scan node
    loss = seq.mse(nk.zeros((T, B, 4)), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
    for p in lstm.parameters():
        assert np.abs(np.asarray(p.grad())).sum() > 0


def test_scan_gru_matches_cell_loop():
    gru = nn.GRU(3, 4)
    cell = nn.GRUCell(3, 4)
    for p, q in zip(cell.parameters(), gru.parameters()):
        p.assign(np.asarray(q.data()))
    T, B = 4, 2
    xs = np.random.randn(T, B, 3).astype(np.float32)
    seq = gru.forward(nk.from_ndarray(xs))
    seq.forward()
    h = nk.zeros((B, 4))
    for t in range(T):
        h = cell.forward(h, nk.from_ndarray(xs[t]))
    h.forward()
    assert_close(np.asarray(seq.data())[-1], np.asarray(h.data()), tol=1e-5)


def test_embedding_op():
    table = nk.from_ndarray(np.arange(12.0).reshape(4, 3)).requires_grad()
    ids = nk.from_ndarray(np.array([0.0, 2.0, 2.0]))
    out = table.embed(ids)
    out.forward()
    assert_close(out.data(), np.arange(12.0).reshape(4, 3)[[0, 2, 2]])
    loss = out.sum()
    loss.forward()
    loss.backward(1.0)
    g = np.zeros((4, 3))
    g[0] = 1.0
    g[2] = 2.0
    assert_close(table.grad(), g)
