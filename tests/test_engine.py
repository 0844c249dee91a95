"""Engine semantics: define-by-run contract of Var/VarDiff.

Mirrors the reference's API integration tier
(neuronika-variable/src/test.rs, 73 tests): build graph -> forward() ->
assert data; diff variants run backward and assert gradient accumulation,
zero_grad, no_grad/with_grad, and tape sharing semantics.
"""

import numpy as np
import pytest

import neuronika_tpu as nk
from tests.conftest import assert_close


def test_forward_is_lazy():
    x = nk.ones((2, 2))
    y = x + x
    # before forward the output buffer is zeroed, like the reference's
    # zero-allocated node buffers (var.rs:53-61)
    assert_close(y.data(), np.zeros((2, 2)))
    y.forward()
    assert_close(y.data(), np.full((2, 2), 2.0))


def test_sticky_differentiability():
    x = nk.ones((2, 2))
    w = nk.ones((2, 2)).requires_grad()
    assert isinstance(x + x, nk.Var)
    assert not isinstance(x + x, nk.VarDiff)
    assert isinstance(x + w, nk.VarDiff)
    assert isinstance(w + x, nk.VarDiff)
    assert isinstance(w + w, nk.VarDiff)


def test_backward_seed_and_accumulation():
    w = nk.full((3,), 2.0).requires_grad()
    y = (w * w).sum()
    y.forward()
    y.backward(1.0)
    assert_close(w.grad(), np.full((3,), 4.0))
    # gradients accumulate across backward calls (vardiff.rs:136-140)
    y.backward(1.0)
    assert_close(w.grad(), np.full((3,), 8.0))
    # zero_grad resets only the variable it is called on (vardiff.rs:99-101)
    w.zero_grad()
    # seeded backward scales the root gradient (vardiff.rs:133)
    y.backward(0.5)
    assert_close(w.grad(), np.full((3,), 2.0))


def test_backward_requires_forward():
    w = nk.ones((2,)).requires_grad()
    y = (w + w).sum()
    with pytest.raises(RuntimeError, match="forgot to call .forward"):
        y.backward(1.0)


def test_no_grad_with_grad():
    w = nk.ones((2,)).requires_grad()
    y = (w * 3.0).sum()
    y.forward()
    y.no_grad()
    with pytest.raises(RuntimeError, match="deallocated"):
        y.backward(1.0)
    y.with_grad()
    y.backward(1.0)
    assert_close(w.grad(), np.full((2,), 3.0))


def test_interior_gradients():
    # every VarDiff exposes .grad(), including interior nodes
    w = nk.full((2,), 3.0).requires_grad()
    mid = w * w
    y = mid.sum()
    y.forward()
    y.backward(1.0)
    assert_close(mid.grad(), np.ones((2,)))
    assert_close(w.grad(), np.full((2,), 6.0))


def test_shared_tape_merge_dedup():
    # diamond: z = (x*y) + (x*y) reuses the same node; grads double
    x = nk.full((2,), 2.0).requires_grad()
    m = x * x
    z = (m + m).sum()
    z.forward()
    assert_close(z.data(), 16.0)
    z.backward(1.0)
    assert_close(x.grad(), np.full((2,), 8.0))


def test_trace_cache_reuse():
    import neuronika_tpu._engine.executor as ex

    ex.clear_cache()
    for _ in range(3):
        x = nk.ones((4, 4)).requires_grad()
        y = (x * 2.0).sum()
        y.forward()
        y.backward(1.0)
    # identical graph structure+shapes -> single compiled fwd and bwd
    assert ex.cache_stats() == (1, 1)


def test_data_mut_and_assign():
    x = nk.zeros((2, 2))
    x.assign(np.arange(4.0).reshape(2, 2))
    assert_close(x.data(), np.arange(4.0).reshape(2, 2))
    with x.data_mut() as arr:
        arr[0, 0] = 42.0
    assert x.item() == 42.0


def test_requires_grad_shares_buffer():
    x = nk.full((2,), 7.0)
    d = x.requires_grad()
    assert_close(d.data(), x.data())
    x.assign(np.full((2,), 3.0))
    assert_close(d.data(), np.full((2,), 3.0))


def test_repeated_forward_recomputes():
    x = nk.ones((2,))
    y = x * 2.0
    y.forward()
    assert_close(y.data(), np.full((2,), 2.0))
    x.assign(np.full((2,), 5.0))
    y.forward()
    assert_close(y.data(), np.full((2,), 10.0))


def test_dropout_status_cell():
    nk.seed(1)
    status = nk.StatusCell(True)
    x = nk.ones((64, 64)).requires_grad()
    y = x.dropout(0.5, status)
    y.forward()
    data_train = np.asarray(y.data())
    assert (data_train == 0.0).any()
    # surviving entries are scaled by 1/(1-p)
    assert_close(data_train[data_train != 0.0], 2.0)
    # backward uses the SAME mask as forward
    s = y.sum()
    s.forward()
    s.backward(1.0)
    g = np.asarray(x.grad())
    assert ((g == 0.0) == (np.asarray(y.data()) == 0.0)).all()
    # eval mode: identity
    status.set(False)
    y.forward()
    assert_close(y.data(), np.ones((64, 64)))


def test_dropout_p_validation():
    x = nk.ones((2,))
    with pytest.raises(ValueError):
        x.dropout(1.5, nk.StatusCell())


def test_chunks():
    x = nk.from_ndarray(np.arange(16.0).reshape(4, 4))
    cs = x.chunks((2, 2))
    assert len(cs) == 4
    cs[3].forward()
    assert_close(cs[3].data(), np.array([[10.0, 11.0], [14.0, 15.0]]))
    # diff flavor: gradient scatters into the right region
    xd = nk.from_ndarray(np.arange(16.0).reshape(4, 4)).requires_grad()
    c = xd.chunks((2, 2))[1]
    s = c.sum()
    s.forward()
    s.backward(1.0)
    expected = np.zeros((4, 4))
    expected[0:2, 2:4] = 1.0
    assert_close(xd.grad(), expected)


def test_item():
    x = nk.full((1,), 3.5)
    assert x.item() == pytest.approx(3.5)


def test_root_gradient_filled_not_accumulated():
    """backward(seed) FILLS the root's own gradient (vardiff.rs:133) while
    ancestors accumulate across calls."""
    w = nk.full((2,), 3.0).requires_grad()
    y = (w * w).sum()
    y.forward()
    y.backward(1.0)
    y.backward(1.0)
    assert_close(y.grad(), 1.0)                    # filled, not 2.0
    assert_close(w.grad(), np.full((2,), 12.0))    # accumulated

    # leaf backward also fills
    leaf = nk.ones((3,)).requires_grad()
    leaf.backward(2.0)
    leaf.backward(2.0)
    assert_close(leaf.grad(), np.full((3,), 2.0))


def test_global_seed_determinism():
    """nk.seed makes rand factories and dropout draws reproducible."""
    nk.seed(123)
    a1 = np.asarray(nk.rand((4, 4)).data())
    d1 = nk.ones((32, 32)).dropout(0.5, nk.StatusCell(True))
    d1.forward()
    m1 = np.asarray(d1.data())

    nk.seed(123)
    a2 = np.asarray(nk.rand((4, 4)).data())
    d2 = nk.ones((32, 32)).dropout(0.5, nk.StatusCell(True))
    d2.forward()
    m2 = np.asarray(d2.data())

    assert_close(a1, a2)
    assert_close(m1, m2)


def test_native_tape_walker_matches_python():
    """The C++ tape walker (when built) must produce identical tape order,
    leaf order, and structural signature to the Python implementation."""
    import neuronika_tpu._engine.executor as ex

    if ex._native_tape is None:
        pytest.skip("native tape walker not built")
    nk.seed(0)
    x = nk.rand((4, 3)).requires_grad()
    w = nk.rand((5, 3)).requires_grad()
    status = nk.StatusCell(True)
    y = (x.mm_t(w) + 1.0).relu().dropout(0.3, status).softmax(1).sum()
    t1, l1, s1 = ex._plan_and_sign(y.node)
    t2, l2 = ex._plan(y.node)
    s2 = ex._signature(t2, l2)
    assert [n.id for n in t1] == [n.id for n in t2]
    assert [n.id for n in l1] == [n.id for n in l2]
    assert s1 == s2 and hash(s1) == hash(s2)
    # diamond + status=False variant
    status.set(False)
    m = x * x
    z = (m + m).sum()
    ta, la, sa = ex._plan_and_sign(z.node)
    tb, lb = ex._plan(z.node)
    assert sa == ex._signature(tb, lb)
