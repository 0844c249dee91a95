"""End-to-end training integration (reference: examples/quickstart.rs)."""

import numpy as np

import neuronika_tpu as nk
from neuronika_tpu import data, nn, optim

CSV = (
    "Paw_size,Tail_length,Weight,Animal\n"
    "0.2,5.0,15.0,Dog\n"
    "0.08,12.0,4.0,Cat\n"
    "0.07,13.0,5.0,Cat\n"
    "0.05,3.0,0.8,Mouse"
)


def test_quickstart_mlp_trains():
    def mapper(pair):
        rec, label = pair
        return rec, [{"Dog": 1.0, "Cat": 2.0}.get(label, 3.0)]

    ds = data.DataLoader.default().with_labels([3]).from_reader_fn(CSV, 3, 1, mapper)

    status = nn.ModelStatus.default()
    lin1 = status.register(nn.Linear(3, 5))
    lin2 = status.register(nn.Linear(5, 5))
    lin3 = status.register(nn.Linear(5, 1))

    opt = optim.SGD(0.01, optim.L2(0.0))
    opt.register_all(status.parameters())

    def forward(x):
        return lin3.forward(lin2.forward(lin1.forward(x).relu()).relu())

    losses = []
    for epoch in range(5):
        total = 0.0
        for x, y in ds.shuffle_with_seed(epoch).batch(2).drop_last():
            inp, tgt = nk.from_ndarray(x), nk.from_ndarray(y)
            loss = nn.loss.mse_loss(forward(inp), tgt, nk.Reduction.Mean)
            loss.forward()
            total += loss.item()
            loss.backward(1.0)
            opt.step()
            opt.zero_grad()
        losses.append(total)
    assert losses[-1] < losses[0]


def test_adam_converges_linear_regression():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 4)).astype(np.float32)
    true_w = np.array([[1.0, -2.0, 0.5, 3.0]], np.float32)
    Y = X @ true_w.T

    lin = nn.Linear(4, 1)
    opt = optim.Adam(0.05)
    opt.register_all(lin.parameters())
    final = None
    for _ in range(200):
        loss = lin.forward(nk.from_ndarray(X)).mse(
            nk.from_ndarray(Y), nk.Reduction.Mean
        )
        loss.forward()
        loss.backward(1.0)
        opt.step()
        opt.zero_grad()
        final = loss.item()
    assert final < 1e-2
    np.testing.assert_allclose(
        np.asarray(lin.weight.data()), true_w, atol=0.05, rtol=0.05
    )
