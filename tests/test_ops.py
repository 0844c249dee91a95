"""Op-level numeric tests: forward vs numpy goldens, backward vs jax.grad.

Replicates the reference's node-level unit tier (node/*/test.rs, ~9.9k LoC)
with a finite-difference-free oracle: every hand-written VJP rule is checked
against `jax.grad` of the same pure forward function (the oracle strategy
SURVEY.md §4 prescribes — the reference itself has no gradcheck).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu.ops.functional import OPS
from tests.conftest import assert_close


def rnd(*shape):
    return np.asarray(np.random.randn(*shape), dtype=np.float32)


# --------------------------------------------------------------------------
# VJP-vs-jax.grad oracle sweep


def _check_vjp(name, extra, arrays, diff_idx=None, tol=1e-5):
    """Compare our VJP rule against jax.grad of the op's own forward fn."""
    op = OPS[name]
    xs = [jnp.asarray(a) for a in arrays]
    out = op.fwd(extra, *xs)
    g = jnp.asarray(rnd(*out.shape))
    ours = op.vjp(extra, xs, out, g)
    diff_idx = range(len(xs)) if diff_idx is None else diff_idx

    def scalarized(*inputs):
        return (op.fwd(extra, *inputs) * g).sum()

    oracle = jax.grad(scalarized, argnums=tuple(diff_idx))(*xs)
    for i, exp in zip(diff_idx, oracle):
        assert ours[i] is not None, f"{name}: vjp[{i}] is None"
        np.testing.assert_allclose(
            np.asarray(ours[i]), np.asarray(exp), rtol=tol, atol=tol,
            err_msg=f"{name} grad[{i}]",
        )


BINARY_BROADCAST_CASES = [
    ((4, 3), (4, 3)),
    ((4, 3), (3,)),      # broadcast rhs
    ((3,), (4, 3)),      # broadcast lhs
    ((4, 1), (1, 3)),    # both broadcast
    ((2, 1, 3), (4, 3)),
]


@pytest.mark.parametrize("name", ["add", "sub", "mul", "div"])
@pytest.mark.parametrize("shapes", BINARY_BROADCAST_CASES)
def test_broadcast_arithmetic_vjp(name, shapes):
    a, b = rnd(*shapes[0]), rnd(*shapes[1])
    if name == "div":
        b = b + np.sign(b) * 0.5  # keep away from zero
    _check_vjp(name, (), [a, b])


UNARY_CASES = [
    ("neg", (), lambda: rnd(3, 4)),
    ("pow", (3,), lambda: rnd(3, 4)),
    ("sqrt", (), lambda: np.abs(rnd(3, 4)) + 0.1),
    ("exp", (), lambda: rnd(3, 4)),
    ("ln", (), lambda: np.abs(rnd(3, 4)) + 0.1),
    ("relu", (), lambda: rnd(3, 4)),
    ("leaky_relu", (), lambda: rnd(3, 4)),
    ("sigmoid", (), lambda: rnd(3, 4)),
    ("tanh", (), lambda: rnd(3, 4)),
    ("softplus", (), lambda: rnd(3, 4)),
    ("softmax", (0,), lambda: rnd(3, 4)),
    ("softmax", (1,), lambda: rnd(3, 4)),
    ("log_softmax", (1,), lambda: rnd(3, 4)),
    ("sum", (), lambda: rnd(3, 4)),
    ("mean", (), lambda: rnd(3, 4)),
    ("t", (), lambda: rnd(3, 4)),
    ("unsqueeze", (1,), lambda: rnd(3, 4)),
    ("chunk", ((1, 2), (2, 2)), lambda: rnd(4, 4)),
    ("pad", ((1, 2), "zero", 0.0), lambda: rnd(2, 3, 5, 5)),
    ("pad", ((2,), "constant", 7.0), lambda: rnd(2, 3, 6)),
]


@pytest.mark.parametrize("name,extra,gen", UNARY_CASES)
def test_unary_vjp(name, extra, gen):
    _check_vjp(name, extra, [gen()])


MATMUL_CASES = [
    ("mm", (), [(4, 5), (5, 3)]),
    ("mm_t", (), [(4, 5), (3, 5)]),
    ("mv", (), [(4, 5), (5,)]),
    ("vm", (), [(5,), (5, 3)]),
    ("vv", (), [(5,), (5,)]),
]


@pytest.mark.parametrize("name,extra,shapes", MATMUL_CASES)
def test_matmul_vjp(name, extra, shapes):
    _check_vjp(name, extra, [rnd(*s) for s in shapes], tol=1e-4)


@pytest.mark.parametrize(
    "name,extra,shapes",
    [
        ("cat", (0,), [(2, 3), (4, 3)]),
        ("cat", (1,), [(2, 3), (2, 5)]),
        ("stack", (0,), [(2, 3), (2, 3)]),
        ("stack", (2,), [(2, 3), (2, 3)]),
        ("multi_cat", (1,), [(2, 1), (2, 2), (2, 3)]),
        ("multi_stack", (1,), [(2, 3), (2, 3), (2, 3)]),
    ],
)
def test_cat_stack_vjp(name, extra, shapes):
    _check_vjp(name, extra, [rnd(*s) for s in shapes])


LOSS_CASES = [
    ("mae", [(4, 3), (4, 3)]),
    ("mse", [(4, 3), (4, 3)]),
    ("bce_with_logits", [(4, 3), None]),
    ("kldiv", [(4, 3), None]),
]


@pytest.mark.parametrize("red", ["mean", "sum"])
@pytest.mark.parametrize("name,shapes", LOSS_CASES)
def test_loss_vjp(name, shapes, red):
    inp = rnd(*shapes[0])
    if name == "bce_with_logits":
        tgt = (np.random.rand(*shapes[0]) > 0.5).astype(np.float32)
    elif name == "kldiv":
        inp = np.log(np.random.dirichlet(np.ones(shapes[0][1]), shapes[0][0])).astype(
            np.float32
        )
        tgt = np.random.dirichlet(np.ones(shapes[0][1]), shapes[0][0]).astype(
            np.float32
        )
    else:
        tgt = rnd(*shapes[0])
    _check_vjp(name, (red,), [inp, tgt], diff_idx=[0], tol=1e-4)


@pytest.mark.parametrize("red", ["mean", "sum"])
def test_bce_vjp(red):
    inp = np.random.uniform(0.05, 0.95, (4, 3)).astype(np.float32)
    tgt = (np.random.rand(4, 3) > 0.5).astype(np.float32)
    _check_vjp("bce", (red,), [inp, tgt], diff_idx=[0], tol=1e-4)


# --------------------------------------------------------------------------
# numeric goldens for non-standard semantics


def test_nll_class_axis_first():
    # reference layout: input (C, N) log-probs, target (N,) class indices
    # (nll/mod.rs:46-68); Mean divides by C in fwd, by N in bwd.
    logp = np.log(
        np.random.dirichlet(np.ones(3), 4).astype(np.float32)
    ).T  # (C=3, N=4)
    tgt = np.array([0.0, 2.0, 1.0, 2.0], dtype=np.float32)
    inp = nk.from_ndarray(logp).requires_grad()
    loss = inp.nll(nk.from_ndarray(tgt), nk.Reduction.Sum)
    loss.forward()
    expected = -sum(logp[int(t), j] for j, t in enumerate(tgt))
    assert_close(loss.data(), expected, tol=1e-5)
    loss.backward(1.0)
    g = np.zeros((3, 4), dtype=np.float32)
    for j, t in enumerate(tgt):
        g[int(t), j] = -1.0
    assert_close(inp.grad(), g)

    # Mean quirk: fwd /= C, bwd /= N (replicated from the reference)
    inp2 = nk.from_ndarray(logp).requires_grad()
    loss2 = inp2.nll(nk.from_ndarray(tgt), nk.Reduction.Mean)
    loss2.forward()
    assert_close(loss2.data(), expected / 3.0, tol=1e-5)
    loss2.backward(1.0)
    assert_close(inp2.grad(), g / 4.0)


def test_kldiv_batchmean():
    p = np.random.dirichlet(np.ones(4), 3).astype(np.float32)
    q = np.random.dirichlet(np.ones(4), 3).astype(np.float32)
    x = nk.from_ndarray(np.log(q))
    loss = x.kldiv(nk.from_ndarray(p), nk.Reduction.Mean)
    loss.forward()
    expected = (p * (np.log(p) - np.log(q))).sum() / 3.0
    assert_close(loss.data(), expected, tol=1e-5)


def test_mse_golden():
    a = nk.from_ndarray([[1.0, 2.0], [3.0, 4.0]]).requires_grad()
    t = nk.from_ndarray([[0.0, 0.0], [0.0, 0.0]])
    loss = a.mse(t, nk.Reduction.Mean)
    loss.forward()
    assert_close(loss.data(), 7.5)
    loss_sum = a.mse(t, nk.Reduction.Sum)
    loss_sum.forward()
    assert_close(loss_sum.data(), 30.0)


def test_pad_modes_golden():
    x = np.arange(1.0, 5.0, dtype=np.float32).reshape(1, 1, 2, 2)
    v = nk.from_ndarray(x)
    zero = v.pad((1, 1), nk.Zero())
    zero.forward()
    assert_close(zero.data(), np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)]))
    const = v.pad((1, 1), nk.Constant(9.0))
    const.forward()
    assert_close(
        const.data(),
        np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], constant_values=9.0),
    )
    refl = v.pad((1, 1), nk.Reflective())
    refl.forward()
    assert_close(
        refl.data(), np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], mode="reflect")
    )
    repl = v.pad((1, 1), nk.Replicative())
    repl.forward()
    assert_close(
        repl.data(), np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], mode="edge")
    )


def test_softmax_rows_sum_to_one():
    x = nk.from_ndarray(rnd(5, 7))
    s = x.softmax(1)
    s.forward()
    assert_close(np.asarray(s.data()).sum(1), np.ones(5))


def test_free_cat_stack():
    a, b = nk.ones((2, 2)), nk.zeros((2, 2))
    c = nk.cat(a, b, 0)
    c.forward()
    assert c.shape == (4, 2)
    s = nk.stack(a, b, 0)
    s.forward()
    assert s.shape == (2, 2, 2)


def test_varargs_cat_stack_methods():
    a = nk.ones((2, 2))
    c = a.cat([nk.zeros((3, 2)), nk.ones((1, 2))], 0)
    c.forward()
    assert c.shape == (6, 2)
    s = a.stack([nk.zeros((2, 2))], 0)
    s.forward()
    assert s.shape == (2, 2, 2)


def test_pad_backward_slices_interior_reference_divergence():
    """The reference's pad backward only slices the interior for ALL modes
    (node/pad/mod.rs:161-182), dropping reflected/replicated border
    contributions — replicated here deliberately (so it deviates from the
    autodiff-exact jax.grad for reflect/edge)."""
    x = rnd(1, 1, 4, 4)
    for mode in ("reflective", "replicative"):
        op = OPS["pad"]
        extra = ((1, 1), mode, 0.0)
        xj = jnp.asarray(x)
        out = op.fwd(extra, xj)
        g = jnp.ones_like(out)
        (dx,) = op.vjp(extra, [xj], out, g)
        # interior slice of an all-ones out-grad is all ones
        assert_close(dx, np.ones_like(x))
