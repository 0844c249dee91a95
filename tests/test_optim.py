"""Optimizer tests: update rules replicated in numpy from the reference
(neuronika-optim/src/*/mod.rs) and compared step-by-step, plus scheduler lr
sequences (lr_scheduler/*/test.rs style) and constructor validation."""

import jax.numpy as jnp
import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu import optim
from neuronika_tpu.optim import lr_scheduler as sched
from tests.conftest import assert_close


def make_param(value, grad):
    p = nk.from_ndarray(value).requires_grad()
    with p.grad_mut() as g:
        g[...] = grad
    return p


def run_steps(opt, p, grads, n):
    history = []
    for i in range(n):
        p.node.grad = None
        with p.grad_mut() as g:
            g[...] = grads[i]
        opt.step()
        history.append(np.asarray(p.data()).copy())
    return history


def test_sgd_plain():
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, 0.5, -1.0], np.float32)
    p = make_param(w0, g)
    opt = optim.StochasticGD(0.1)
    opt.register(p)
    opt.step()
    assert_close(p.data(), w0 - 0.1 * g)


def test_sgd_momentum_zero_init_buffer():
    # reference quirk: buffer starts at zeros, so step1 uses (1-damp)*g
    # (sgd/mod.rs:205-215) — unlike PyTorch's buf=g initialisation.
    w0 = np.array([1.0, 1.0], np.float32)
    g = np.array([1.0, 2.0], np.float32)
    p = make_param(w0, g)
    opt = optim.StochasticGD(0.1, momentum=0.9, dampening=0.1)
    opt.register(p)
    opt.step()
    buf = 0.9 * g  # (1-0.1)*g
    assert_close(p.data(), w0 - 0.1 * buf)
    # second step with same grad
    with p.grad_mut() as gm:
        gm[...] = g
    p.node.grad = nk.from_ndarray(g).data()
    opt.step()
    buf2 = 0.9 * buf + 0.9 * g
    assert_close(p.data(), w0 - 0.1 * buf - 0.1 * buf2, tol=1e-5)


def test_sgd_nesterov():
    w0 = np.array([1.0], np.float32)
    g = np.array([2.0], np.float32)
    p = make_param(w0, g)
    opt = optim.StochasticGD(0.1, momentum=0.5, nesterov=True)
    opt.register(p)
    opt.step()
    buf = g  # (1-0)*g
    assert_close(p.data(), w0 - (g + 0.5 * buf) * 0.1)


def test_sgd_nesterov_requires_momentum():
    with pytest.raises(ValueError):
        optim.StochasticGD(0.1, nesterov=True)


def test_l2_penalty_added_to_grad():
    w0 = np.array([2.0], np.float32)
    g = np.array([1.0], np.float32)
    p = make_param(w0, g)
    opt = optim.StochasticGD(0.1, optim.L2(0.5))
    opt.register(p)
    opt.step()
    # grad' = g + 2*λ*w = 1 + 2*0.5*2 = 3
    assert_close(p.data(), w0 - 0.1 * 3.0)
    # the penalised grad is written back (reference mutates grad in place)
    assert_close(p.grad(), np.array([3.0]))


def test_l1_and_elasticnet_penalties():
    w = np.array([2.0, -2.0], np.float32)
    import jax.numpy as jnp

    assert_close(optim.L1(0.3).penalize(jnp.asarray(w)), [0.3, -0.3])
    assert_close(
        optim.ElasticNet(0.3, 0.5).penalize(jnp.asarray(w)),
        [0.3 + 2.0, -0.3 - 2.0],
    )


def test_adam_matches_reference_rule():
    w0 = np.array([1.0, -1.0], np.float32)
    grads = [np.array([0.1, 0.2], np.float32), np.array([-0.3, 0.4], np.float32)]
    p = make_param(w0, grads[0])
    opt = optim.Adam(0.01, 0.9, 0.999, None, 1e-8)
    opt.register(p)

    # numpy replica (adam/mod.rs:117-160)
    m = np.zeros(2)
    v = np.zeros(2)
    w = w0.astype(np.float64)
    hist = run_steps(opt, p, grads, 2)
    for t, g in enumerate(grads, start=1):
        m = m * 0.9 + g * 0.1
        v = v * 0.999 + g * g * 0.001
        bc1 = 1 - 0.9**t
        bc2 = 1 - 0.999**t
        w = w - m / (np.sqrt(v) / np.sqrt(bc2) + 1e-8) * (0.01 / bc1)
        assert_close(hist[t - 1], w, tol=1e-5)


def test_amsgrad_uses_running_max():
    w0 = np.array([1.0], np.float32)
    grads = [np.array([1.0], np.float32), np.array([0.1], np.float32)]
    p = make_param(w0, grads[0])
    opt = optim.AMSGrad(0.01, 0.9, 0.999, None, 1e-8)
    opt.register(p)
    m = np.zeros(1)
    v = np.zeros(1)
    vmax = np.zeros(1)
    w = w0.astype(np.float64)
    hist = run_steps(opt, p, grads, 2)
    for t, g in enumerate(grads, start=1):
        m = m * 0.9 + g * 0.1
        v = v * 0.999 + g * g * 0.001
        vmax = np.maximum(vmax, v)
        bc1 = 1 - 0.9**t
        bc2 = 1 - 0.999**t
        w = w - m / (np.sqrt(vmax) / np.sqrt(bc2) + 1e-8) * (0.01 / bc1)
        assert_close(hist[t - 1], w, tol=1e-5)


def test_adagrad_lr_decay():
    w0 = np.array([1.0], np.float32)
    grads = [np.array([0.5], np.float32)] * 3
    p = make_param(w0, grads[0])
    opt = optim.Adagrad(0.1, 0.5, None, 1e-10)
    opt.register(p)
    gs = np.zeros(1)
    w = w0.astype(np.float64)
    hist = run_steps(opt, p, grads, 3)
    for t, g in enumerate(grads, start=1):
        clr = 0.1 / (1.0 + (t - 1) * 0.5)
        gs = gs + g * g
        w = w - g / (np.sqrt(gs) + 1e-10) * clr
        assert_close(hist[t - 1], w, tol=1e-5)


@pytest.mark.parametrize("centered", [False, True])
@pytest.mark.parametrize("momentum", [None, 0.5])
def test_rmsprop_four_paths(centered, momentum):
    w0 = np.array([1.0, 2.0], np.float32)
    grads = [np.array([0.3, -0.1], np.float32), np.array([0.2, 0.2], np.float32)]
    p = make_param(w0, grads[0])
    opt = optim.RMSProp(0.01, None, 0.9, momentum, centered, 1e-8)
    opt.register(p)
    sq = np.zeros(2)
    ga = np.zeros(2)
    buf = np.zeros(2)
    w = w0.astype(np.float64)
    hist = run_steps(opt, p, grads, 2)
    for t, g in enumerate(grads, start=1):
        sq = sq * 0.9 + g * g * 0.1
        if centered:
            ga = ga * 0.9 + g * 0.1
            denom = np.sqrt(sq - ga * ga) + 1e-8
        else:
            denom = np.sqrt(sq) + 1e-8
        if momentum:
            buf = buf * momentum + g / denom
            w = w - buf * 0.01
        else:
            w = w - g / denom * 0.01
        assert_close(hist[t - 1], w, tol=1e-5)


def test_set_lr_validation():
    opt = optim.StochasticGD(0.1)
    with pytest.raises(ValueError):
        opt.set_lr(-1.0)


def test_register_requires_vardiff():
    opt = optim.StochasticGD(0.1)
    with pytest.raises(TypeError):
        opt.register(nk.ones((2,)))


# ------------------------------------------------------------- schedulers


def test_exponential_lr():
    opt = optim.StochasticGD(1.0)
    s = sched.ExponentialLR(opt, 0.5)
    lrs = []
    for _ in range(3):
        s.step()
        lrs.append(opt.get_lr())
    assert lrs == [0.5, 0.25, 0.125]
    assert s.get_current_epoch() == 3
    assert s.get_last_lr() == 0.25


def test_step_lr():
    opt = optim.StochasticGD(1.0)
    s = sched.StepLR(opt, 2, 0.1)
    lrs = []
    for _ in range(4):
        s.step()
        lrs.append(round(opt.get_lr(), 6))
    assert lrs == [1.0, 0.1, 0.1, 0.01]


def test_multi_step_lr():
    opt = optim.StochasticGD(1.0)
    s = sched.MultiStepLR(opt, [1, 3], 0.1)
    lrs = []
    for _ in range(4):
        s.step()
        lrs.append(round(opt.get_lr(), 6))
    assert lrs == [0.1, 0.1, 0.01, 0.01]


def test_lambda_lr():
    opt = optim.StochasticGD(2.0)
    s = sched.LambdaLR(opt, lambda epoch: 1.0 / (1 + epoch))
    s.step()
    assert opt.get_lr() == pytest.approx(1.0)
    s.step()
    assert opt.get_lr() == pytest.approx(2.0 / 3.0)


def test_multiplicative_lr():
    opt = optim.StochasticGD(1.0)
    s = sched.MultiplicativeLR(opt, lambda epoch: 0.5)
    s.step()
    s.step()
    assert opt.get_lr() == pytest.approx(0.25)


def test_scheduler_does_not_recompile_step():
    import neuronika_tpu._engine.executor as ex

    opt = optim.StochasticGD(1.0)
    p = make_param(np.ones(3, np.float32), np.ones(3, np.float32))
    opt.register(p)
    s = sched.ExponentialLR(opt, 0.9)
    opt.step()
    compiled = opt._compiled
    for _ in range(3):
        s.step()
        p.node.grad = nk.ones(3).data()
        opt.step()
    assert opt._compiled is compiled  # lr is traced, not baked


def test_clip_by_global_norm():
    import jax.numpy as jnp

    from neuronika_tpu.optim.functional import clip_by_global_norm, global_norm

    grads = {"a": jnp.ones((3,)) * 3.0, "b": jnp.ones((4,)) * 4.0}
    n = float(global_norm(grads))
    assert n == pytest.approx(np.sqrt(9 * 3 + 16 * 4))
    clipped, norm = clip_by_global_norm(grads, 1.0)
    assert float(global_norm(clipped)) == pytest.approx(1.0, rel=1e-5)
    # below the limit: untouched
    same, _ = clip_by_global_norm(grads, 1e6)
    assert_close(same["a"], grads["a"])


def test_warmup_cosine_schedule():
    from neuronika_tpu.optim.functional import warmup_cosine_schedule

    lr_at = warmup_cosine_schedule(1.0, warmup_steps=10, total_steps=110)
    assert float(lr_at(0)) == 0.0
    assert float(lr_at(5)) == pytest.approx(0.5)
    assert float(lr_at(10)) == pytest.approx(1.0)
    assert float(lr_at(110)) == pytest.approx(0.1, abs=1e-6)
    assert float(lr_at(60)) == pytest.approx(0.55, abs=1e-6)


def test_warmup_cosine_lr():
    from neuronika_tpu.optim.lr_scheduler import WarmupCosineLR

    opt = optim.SGD(1.0)
    sched = WarmupCosineLR(opt, warmup_epochs=2, total_epochs=10, min_lr=0.1)
    lrs = []
    for _ in range(12):
        sched.step()
        lrs.append(opt.get_lr())
    assert lrs[0] == pytest.approx(0.5)   # warmup 1/2
    assert lrs[1] == pytest.approx(1.0)   # peak at end of warmup
    assert lrs[9] == pytest.approx(0.1)   # decayed to min at total
    assert lrs[11] == pytest.approx(0.1)  # clamped after total
    assert all(lrs[i] >= lrs[i + 1] for i in range(1, 11))  # monotone decay
    with pytest.raises(ValueError):
        WarmupCosineLR(opt, warmup_epochs=5, total_epochs=5)


def test_clip_grad_norm_define_by_run():
    import neuronika_tpu as nk

    w = nk.from_ndarray(np.ones((2, 2), np.float32)).requires_grad()
    loss = (w * 3.0).sum()
    loss.forward()
    loss.backward(1.0)
    # grad is all 3s: global norm = sqrt(4*9) = 6
    norm = optim.clip_grad_norm([w], 1.5)
    assert norm == pytest.approx(6.0, rel=1e-5)
    clipped = np.asarray(w.grad())
    assert np.allclose(np.sqrt((clipped ** 2).sum()), 1.5, rtol=1e-5)
    # already-small grads untouched
    norm2 = optim.clip_grad_norm([w], 100.0)
    assert np.allclose(np.asarray(w.grad()), clipped)
    assert norm2 == pytest.approx(1.5, rel=1e-5)


def test_functional_clip_by_global_norm():
    import jax.numpy as jnp

    from neuronika_tpu.optim.functional import clip_by_global_norm, global_norm

    tree = {"a": jnp.full((3,), 4.0), "b": jnp.full((4,), 3.0)}
    n = float(global_norm(tree))
    assert n == pytest.approx(np.sqrt(3 * 16 + 4 * 9))
    clipped, norm = clip_by_global_norm(tree, 1.0)
    assert float(norm) == pytest.approx(n)
    assert float(global_norm(clipped)) == pytest.approx(1.0, rel=1e-5)


def test_adam_bf16_state_matches_f32():
    """bf16 m/v state: same trajectory as f32 to bf16 rounding tolerance,
    state arrays actually stored in bf16 (half the HBM traffic)."""
    import jax.numpy as jnp

    from neuronika_tpu.optim.functional import adam_init, adam_update

    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8)}
    s32 = adam_init(params)
    s16 = adam_init(params, state_dtype=jnp.bfloat16)
    assert s16["m"]["w"].dtype == jnp.bfloat16
    p32, p16 = params, params
    for i in range(5):
        g = {"w": jnp.cos(jnp.arange(64.0)).reshape(8, 8) * (i + 1) * 0.1}
        p32, s32 = adam_update(p32, g, s32, 1e-2)
        p16, s16 = adam_update(p16, g, s16, 1e-2)
    assert s16["v"]["w"].dtype == jnp.bfloat16
    assert np.allclose(np.asarray(p32["w"]), np.asarray(p16["w"]),
                       atol=2e-2), "bf16-state Adam diverged from f32"


def test_functional_updates_preserve_param_dtype():
    """bf16 parameter trees must stay bf16 through every functional
    update rule — an f32 `lr` used to win the binop promotion and
    silently upcast params on the first step (breaking scan carries
    and doubling parameter HBM)."""
    import jax.numpy as jnp

    from neuronika_tpu.optim import functional as F

    params = {"w": jnp.ones((4, 4), jnp.bfloat16)}
    grads = {"w": jnp.full((4, 4), 0.5, jnp.bfloat16)}
    lr = jnp.float32(1e-2)

    for name, init_kw, upd_kw in [
        ("sgd", {}, {}),
        ("sgd", {"momentum": 0.9}, {"momentum": 0.9}),
        ("sgd", {"momentum": 0.9}, {"momentum": 0.9, "nesterov": True}),
        ("adam", {}, {}),
        ("amsgrad", {}, {}),
        ("adagrad", {}, {}),
        ("rmsprop", {}, {}),
        ("rmsprop", {"momentum": 0.9}, {"momentum": 0.9}),
        ("rmsprop", {"centered": True}, {"centered": True}),
    ]:
        state = getattr(F, f"{name}_init")(params, **init_kw)
        p, state = getattr(F, f"{name}_update")(params, grads, state, lr,
                                                **upd_kw)
        assert p["w"].dtype == jnp.bfloat16, (name, upd_kw, p["w"].dtype)
        # and a second step from the updated tree (the scan-carry case)
        p, _ = getattr(F, f"{name}_update")(p, grads, state, lr, **upd_kw)
        assert p["w"].dtype == jnp.bfloat16, (name, upd_kw)


def test_adam_class_bf16_state():
    import jax.numpy as jnp

    import neuronika_tpu as nk

    w = nk.from_ndarray(np.ones((4, 4), np.float32)).requires_grad()
    opt = optim.Adam(0.01, state_dtype=jnp.bfloat16)
    opt.register(w)
    loss = (w * w).sum()
    loss.forward()
    loss.backward(1.0)
    opt.step()
    st = opt._state[0]
    assert st["exp_avg"].dtype == jnp.bfloat16
    assert not np.allclose(np.asarray(w.data()), 1.0)


def test_class_optimizers_preserve_bf16_param_dtype():
    """Class-tier rules run their update math in f32 and cast back:
    bf16 params must not silently promote to f32 after step() (the f32
    hypers used to win the binop promotion — same bug fixed in the
    functional tier in test_functional_updates_preserve_param_dtype),
    and state buffers must keep their storage dtype."""
    import jax.numpy as jnp

    for make in [
        lambda: optim.StochasticGD(0.1, momentum=0.9),
        lambda: optim.Adam(0.01),
        lambda: optim.Adam(0.01, state_dtype=jnp.bfloat16),
        lambda: optim.AMSGrad(0.01),
        lambda: optim.Adagrad(0.01),
        lambda: optim.RMSProp(0.01, momentum=0.9, centered=True),
    ]:
        w = nk.from_ndarray(np.ones((4, 4)), dtype=jnp.bfloat16)
        w = w.requires_grad()
        opt = make()
        opt.register(w)
        loss = (w * w).sum()
        for _ in range(2):  # second step exercises the updated tree
            loss.forward()
            loss.backward(1.0)
            opt.step()
            opt.zero_grad()
        name = type(opt).__name__
        assert w.data().dtype == jnp.bfloat16, name
        for k, s in opt._state[0].items():
            # every rule inits state at the param's (or state_dtype's)
            # storage dtype — here bf16 either way
            assert s.dtype == jnp.bfloat16, (name, k, s.dtype)
        assert not np.allclose(np.asarray(w.data(), np.float32), 1.0), name


def test_fused_step_preserves_bf16_param_dtype():
    """Same contract through the fused forward+backward+update program."""
    import jax.numpy as jnp

    w = nk.from_ndarray(np.ones((4, 4)), dtype=jnp.bfloat16).requires_grad()
    opt = optim.Adam(0.01)
    opt.register(w)
    loss = (w * w).sum()
    for _ in range(2):
        opt.train_step(loss)
    assert w.data().dtype == jnp.bfloat16
    assert opt._state[0]["exp_avg"].dtype == jnp.bfloat16
    assert not np.allclose(np.asarray(w.data(), np.float32), 1.0)


# ------------------------------------------------------------- new tiers
# AdamW / Lion / Adafactor (extensions beyond the reference — the
# transformer-era optimizer set; each has a functional rule and a class)


def test_adamw_matches_torch():
    import torch

    w0 = np.array([1.0, -2.0, 0.5], np.float32)
    grads = [np.array([0.1, 0.2, -0.3], np.float32),
             np.array([-0.2, 0.4, 0.1], np.float32),
             np.array([0.3, -0.1, 0.2], np.float32)]
    p = make_param(w0, grads[0])
    opt = optim.AdamW(0.01, 0.9, 0.999, weight_decay=0.1)
    opt.register(p)
    hist = run_steps(opt, p, grads, 3)

    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.AdamW([tw], lr=0.01, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=0.1)
    for i, g in enumerate(grads):
        tw.grad = torch.tensor(g)
        topt.step()
        assert_close(hist[i], tw.detach().numpy(), tol=1e-5)


def test_adamw_functional_matches_class():
    from neuronika_tpu.optim import functional as F

    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    grads = [np.random.RandomState(i).randn(2, 2).astype(np.float32)
             for i in range(3)]
    params = {"w": jnp.asarray(w0)}
    state = F.adamw_init(params)
    for g in grads:
        params, state = F.adamw_update(params, {"w": jnp.asarray(g)},
                                       state, 0.01, weight_decay=0.1)

    p = make_param(w0, grads[0])
    opt = optim.AdamW(0.01, weight_decay=0.1)
    opt.register(p)
    hist = run_steps(opt, p, grads, 3)
    assert_close(np.asarray(params["w"]), hist[-1], tol=1e-5)


def test_lion_sign_update_rule():
    """Numpy replica of Lion: u = sign(b1*m + (1-b1)*g); m' = b2*m +
    (1-b2)*g; single state buffer."""
    w0 = np.array([1.0, -1.0, 2.0], np.float32)
    grads = [np.array([0.5, -0.2, 0.0], np.float32),
             np.array([-0.1, 0.3, -0.4], np.float32)]
    p = make_param(w0, grads[0])
    opt = optim.Lion(0.01, 0.9, 0.99, weight_decay=0.1)
    opt.register(p)
    hist = run_steps(opt, p, grads, 2)

    m = np.zeros(3)
    w = w0.astype(np.float64)
    for t, g in enumerate(grads, 1):
        u = np.sign(0.9 * m + 0.1 * g)
        w = w - 0.01 * u - w * (0.01 * 0.1)
        m = 0.99 * m + 0.01 * g
        assert_close(hist[t - 1], w, tol=1e-5)
    # single-buffer state (half of Adam's)
    assert set(opt._state[0].keys()) == {"exp_avg"}


def test_lion_functional_matches_class():
    from neuronika_tpu.optim import functional as F

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(4, 3).astype(np.float32)
             for i in range(3)]
    params = {"w": jnp.asarray(w0)}
    state = F.lion_init(params)
    for g in grads:
        params, state = F.lion_update(params, {"w": jnp.asarray(g)},
                                      state, 0.01, weight_decay=0.05)
    p = make_param(w0, grads[0])
    opt = optim.Lion(0.01, weight_decay=0.05)
    opt.register(p)
    hist = run_steps(opt, p, grads, 3)
    assert_close(np.asarray(params["w"]), hist[-1], tol=1e-5)


def test_adafactor_factored_state_and_rule():
    """Matrices carry a row + column accumulator (O(n+m) memory); the
    numpy replica follows Shazeer & Stern eq. 4-5 with RMS clipping."""
    w0 = np.random.RandomState(0).randn(3, 4).astype(np.float32)
    grads = [np.random.RandomState(i + 10).randn(3, 4).astype(np.float32)
             for i in range(2)]
    p = make_param(w0, grads[0])
    opt = optim.Adafactor(0.01)
    opt.register(p)
    hist = run_steps(opt, p, grads, 2)

    assert set(opt._state[0].keys()) == {"vr", "vc"}
    assert opt._state[0]["vr"].shape == (3,)
    assert opt._state[0]["vc"].shape == (4,)

    eps = 1e-30
    vr = np.zeros(3)
    vc = np.zeros(4)
    w = w0.astype(np.float64)
    for t, g in enumerate(grads, 1):
        b2t = 1.0 - t ** -0.8
        sq = g.astype(np.float64) ** 2 + eps
        vr = vr * b2t + sq.mean(axis=1) * (1 - b2t)
        vc = vc * b2t + sq.mean(axis=0) * (1 - b2t)
        vhat = np.outer(vr / vr.mean(), vc)
        u = g / np.sqrt(vhat + eps)
        rms = np.sqrt((u * u).mean() + 1e-30)
        u = u / max(1.0, rms / 1.0)
        w = w - 0.01 * u
        assert_close(hist[t - 1], w, tol=1e-4)


def test_adafactor_vector_param_full_state():
    w0 = np.array([1.0, -1.0], np.float32)
    p = make_param(w0, np.array([0.1, 0.2], np.float32))
    opt = optim.Adafactor(0.01)
    opt.register(p)
    assert set(opt._state[0].keys()) == {"v"}
    opt.step()
    assert np.isfinite(np.asarray(p.data())).all()


def test_adafactor_functional_matches_class():
    from neuronika_tpu.optim import functional as F

    w0 = np.random.RandomState(3).randn(4, 5).astype(np.float32)
    grads = [np.random.RandomState(i + 7).randn(4, 5).astype(np.float32)
             for i in range(3)]
    params = {"w": jnp.asarray(w0)}
    state = F.adafactor_init(params)
    for g in grads:
        params, state = F.adafactor_update(
            params, {"w": jnp.asarray(g)}, state, 0.01)
    p = make_param(w0, grads[0])
    opt = optim.Adafactor(0.01)
    opt.register(p)
    hist = run_steps(opt, p, grads, 3)
    assert_close(np.asarray(params["w"]), hist[-1], tol=1e-4)


def test_new_optimizers_converge_on_quadratic():
    """All three drive ||w||^2 down on a simple bowl."""
    for make in (lambda: optim.AdamW(0.05), lambda: optim.Lion(0.05),
                 lambda: optim.Adafactor(0.5)):
        w0 = np.random.RandomState(0).randn(4, 4).astype(np.float32) * 2
        p = make_param(w0, np.zeros((4, 4), np.float32))
        opt = make()
        opt.register(p)
        start = float((np.asarray(p.data()) ** 2).sum())
        for _ in range(25):
            w = np.asarray(p.data())
            p.node.grad = None
            with p.grad_mut() as g:
                g[...] = 2 * w
            opt.step()
        end = float((np.asarray(p.data()) ** 2).sum())
        assert end < 0.5 * start, (type(opt).__name__, start, end)


def test_muon_newton_schulz_orthogonalizes():
    """NS5 drives singular values of the momentum toward 1."""
    from neuronika_tpu.optim.functional import _newton_schulz5

    m = np.random.RandomState(0).randn(64, 32).astype(np.float32)
    o = np.asarray(_newton_schulz5(jnp.asarray(m)))
    s = np.linalg.svd(o, compute_uv=False)
    assert s.max() < 1.3 and s.min() > 0.6   # near-orthogonal
    # batched leading axis (stacked layers)
    mb = np.random.RandomState(1).randn(3, 64, 32).astype(np.float32)
    ob = np.asarray(_newton_schulz5(jnp.asarray(mb)))
    for i in range(3):
        sb = np.linalg.svd(ob[i], compute_uv=False)
        assert sb.max() < 1.3 and sb.min() > 0.6


def test_muon_functional_matches_class():
    from neuronika_tpu.optim import functional as F

    w0 = np.random.RandomState(2).randn(16, 8).astype(np.float32)
    grads = [np.random.RandomState(i + 3).randn(16, 8).astype(np.float32)
             for i in range(3)]
    params = {"w": jnp.asarray(w0)}
    state = F.muon_init(params)
    for g in grads:
        params, state = F.muon_update(params, {"w": jnp.asarray(g)},
                                      state, 0.02)
    p = make_param(w0, grads[0])
    opt = optim.Muon(0.02)
    opt.register(p)
    hist = run_steps(opt, p, grads, 3)
    assert_close(np.asarray(params["w"]), hist[-1], tol=1e-4)


def test_muon_vector_fallback_and_convergence():
    from neuronika_tpu.optim import functional as F

    # 1D leaf: plain momentum SGD (no NS)
    params = {"b": jnp.asarray(np.float32([1.0, -2.0]))}
    state = F.muon_init(params)
    g = {"b": jnp.asarray(np.float32([0.5, -0.5]))}
    p2, _ = F.muon_update(params, g, state, 0.1, momentum=0.0,
                          nesterov=False)
    assert_close(np.asarray(p2["b"]), [0.95, -1.95], tol=1e-6)

    # matrix quadratic bowl converges. Muon's updates are orthogonal
    # (constant Frobenius norm ~sqrt(min(r,c)) * lr), so it moves at a
    # fixed speed: size lr/steps to cover the distance to the minimum.
    w = {"w": jnp.asarray(np.random.RandomState(0).randn(8, 8),
                          jnp.float32)}
    s = F.muon_init(w)
    start = float((np.asarray(w["w"]) ** 2).sum())
    for _ in range(100):
        g = {"w": 2 * w["w"]}
        w, s = F.muon_update(w, g, s, 0.05, momentum=0.5)
    assert float((np.asarray(w["w"]) ** 2).sum()) < 0.3 * start
