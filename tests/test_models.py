"""Model-family tests (BASELINE.md configs): MLP, MNIST CNN, char-RNN,
mini-GPT2 (functional + Var-API parity tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu import models, optim
from neuronika_tpu.models import transformer as T
from tests.conftest import assert_close


def test_mlp_trains():
    mlp = models.MLP((3, 8, 1))
    opt = optim.SGD(0.05)
    opt.register_all(mlp.parameters())
    X = np.random.randn(16, 3).astype(np.float32)
    Y = (X.sum(1, keepdims=True) > 0).astype(np.float32)
    first = last = None
    for _ in range(30):
        loss = mlp.forward(nk.from_ndarray(X)).mse(
            nk.from_ndarray(Y), nk.Reduction.Mean
        )
        loss.forward()
        if first is None:
            first = loss.item()
        last = loss.item()
        loss.backward(1.0)
        opt.step()
        opt.zero_grad()
    assert last < first


def test_mnist_cnn_shapes_and_step():
    cnn = models.MnistCNN(channels=4, hidden=16, image=28)
    x = nk.rand((2, 1, 28, 28))
    logits = cnn.forward(x)
    logits.forward()
    assert logits.shape == (2, 10)
    # one Adam+L2 training step (the configs[1] recipe)
    opt = optim.Adam(1e-3, penalty=optim.L2(1e-4))
    opt.register_all(cnn.parameters())
    tgt = np.zeros(2, np.float32)
    loss = logits.log_softmax(1).t().nll(nk.from_ndarray(tgt), nk.Reduction.Mean)
    loss.forward()
    loss.backward(1.0)
    opt.step()
    assert np.isfinite(loss.item())
    # eval mode disables dropout: two forwards agree
    cnn.eval()
    y1 = cnn.forward(x)
    y1.forward()
    y2 = cnn.forward(x)
    y2.forward()
    assert_close(y1.data(), y2.data())


@pytest.mark.parametrize("kind", ["lstm", "gru"])
def test_char_rnn_trains_and_caches(kind):
    import neuronika_tpu._engine.executor as ex

    rnn = models.CharRNN(vocab=12, hidden=16, cell=kind)
    opt = optim.Adam(1e-2)
    opt.register_all(rnn.parameters())
    rng = np.random.default_rng(0)

    def step(T_len):
        ids = rng.integers(0, 12, (2, T_len))
        tgt = np.roll(ids, -1, axis=1)
        loss = rnn.loss(ids, tgt)
        loss.forward()
        loss.backward(1.0)
        opt.step()
        opt.zero_grad()
        return loss.item()

    ex.clear_cache()
    first = step(6)
    for _ in range(3):
        last = step(6)
    fwd_after_same, bwd_after_same = ex.cache_stats()
    # variable length -> one extra compile, not one per call
    step(9)
    step(9)
    fwd_after_var, _ = ex.cache_stats()
    assert fwd_after_var == fwd_after_same + 1  # retrace-and-cache
    assert np.isfinite(last)


def test_transformer_functional_trains():
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.adam_init(params)
    step = T.make_train_step(cfg)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    losses = []
    for i in range(10):
        params, opt, loss = step(params, opt, toks, tgts,
                                 jnp.float32(1e-2), jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_transformer_causality():
    cfg = T.GPTConfig(vocab_size=17, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=8, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    a = jax.random.randint(jax.random.key(1), (1, 8), 0, 17)
    b = a.at[0, 5].set((a[0, 5] + 1) % 17)  # change a future token
    la = T.forward(params, a, cfg)
    lb = T.forward(params, b, cfg)
    # positions before the edit are unaffected
    assert_close(la[0, :5], lb[0, :5], tol=1e-5)
    assert not np.allclose(np.asarray(la[0, 5]), np.asarray(lb[0, 5]))


def test_transformer_var_api_parity_tier():
    """Full multi-head multi-layer GPT-2 block stack on the define-by-run
    tier: trains a couple of steps and respects causality."""
    cfg = T.GPTConfig(vocab_size=16, n_layer=2, n_head=2, d_model=16,
                      d_ff=32, max_seq=8, dtype=jnp.float32)
    nk.seed(0)
    np.random.seed(0)
    params, fwd = T.build_var_model(cfg, batch=1, seq=8)
    ids = (np.arange(8.0) * 3) % 16
    targets = np.roll(ids, -1)

    opt = nk.optim.Adam(1e-2)
    opt.register_all(params)
    losses = []
    for _ in range(5):
        logits = fwd(nk.from_ndarray(ids))
        loss = logits.log_softmax(1).t().nll(
            nk.from_ndarray(targets), nk.Reduction.Mean
        )
        losses.append(opt.train_step(loss))
    assert losses[-1] < losses[0]

    # causality: mutate a future token, earlier logits unchanged
    logits_a = fwd(nk.from_ndarray(ids))
    logits_a.forward()
    ids_b = ids.copy()
    ids_b[6] = (ids_b[6] + 1) % 16
    logits_b = fwd(nk.from_ndarray(ids_b))
    logits_b.forward()
    assert_close(
        np.asarray(logits_a.data())[:6], np.asarray(logits_b.data())[:6], tol=1e-4
    )


def test_kv_cache_decode_matches_full_forward():
    cfg = T.GPTConfig(vocab_size=24, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=10, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (2, 6), 0, 24)
    full = T.forward(params, toks, cfg)

    decode = T.make_decode_step(cfg)
    cache = T.init_kv_cache(cfg, 2)
    for t in range(6):
        logits, cache = decode(params, cache, toks[:, t])
        assert_close(logits, full[:, t], tol=1e-4)


def test_generate_greedy():
    cfg = T.GPTConfig(vocab_size=12, n_layer=1, n_head=1, d_model=16,
                      d_ff=32, max_seq=12, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    prompt = np.array([[1, 2, 3]], np.int32)
    out = T.generate(params, cfg, prompt, max_new=4)
    assert out.shape == (1, 7)
    assert (out[:, :3] == prompt).all()
    assert ((out >= 0) & (out < 12)).all()


def test_moe_transformer_trains_and_matches_density():
    """MoE FFN (dense dispatch): trains, and with 1 expert equals the gate
    probability-weighted dense MLP output shape/finiteness."""
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32, n_experts=4)
    params = T.init_params(jax.random.key(0), cfg)
    step = T.make_train_step(cfg)
    opt = T.adam_init(params)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    losses = []
    for i in range(8):
        params, opt, loss = step(params, opt, toks, tgts,
                                 jnp.float32(1e-2), jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_moe_sharded_over_ep_axis():
    from neuronika_tpu import parallel

    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32, n_experts=4)
    mesh = parallel.make_mesh([("dp", 2), ("tp", 2), ("ep", 2)])
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.adam_init(params)
    step = T.make_sharded_train_step(mesh, cfg)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    params, opt, loss = step(params, opt, toks, tgts, jnp.float32(1e-3),
                             jax.random.key(2))
    assert np.isfinite(float(loss))


def test_sparse_moe_matches_dense_at_full_capacity():
    """Switch-style capacity dispatch with capacity >= tokens equals the
    dense-dispatch MoE exactly (same routing, same math)."""
    base = dict(vocab_size=32, n_layer=2, n_head=2, d_model=32, d_ff=64,
                max_seq=16, dtype=jnp.float32, n_experts=4)
    cfg_d = T.GPTConfig(**base, moe_impl="dense")
    cfg_s = T.GPTConfig(**base, moe_impl="sparse", moe_capacity=8.0)
    params = T.init_params(jax.random.key(0), cfg_d)
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    out_d = T.forward(params, toks, cfg_d)
    out_s = T.forward(params, toks, cfg_s)
    assert_close(out_d, out_s, tol=1e-4)


def test_sparse_moe_trains_with_overflow():
    """Tight capacity (tokens dropped to the residual) still trains."""
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32,
                      n_experts=4, moe_impl="sparse", moe_capacity=1.0)
    params = T.init_params(jax.random.key(0), cfg)
    step = T.make_train_step(cfg)
    opt = T.adam_init(params)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    losses = []
    for i in range(8):
        params, opt, loss = step(params, opt, toks, tgts,
                                 jnp.float32(1e-2), jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_sort_moe_matches_sparse_exactly():
    """Sort-based dispatch == capacity-einsum dispatch (same routing, same
    keep-set under overflow — stable sort preserves original token order
    within each expert, like the cumsum ranking)."""
    base = dict(vocab_size=32, n_layer=2, n_head=2, d_model=32, d_ff=64,
                max_seq=16, dtype=jnp.float32, n_experts=4)
    params = T.init_params(jax.random.key(0), T.GPTConfig(**base))
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    for cap in (8.0, 1.0, 0.25):  # full capacity and two overflow regimes
        cfg_s = T.GPTConfig(**base, moe_impl="sparse", moe_capacity=cap)
        cfg_o = T.GPTConfig(**base, moe_impl="sort", moe_capacity=cap)
        assert_close(T.forward(params, toks, cfg_s),
                     T.forward(params, toks, cfg_o), tol=1e-5)


def test_sort_moe_grads_match_sparse():
    base = dict(vocab_size=32, n_layer=2, n_head=2, d_model=32, d_ff=64,
                max_seq=16, dtype=jnp.float32, n_experts=4)
    params = T.init_params(jax.random.key(0), T.GPTConfig(**base))
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)

    def grads(impl):
        cfg = T.GPTConfig(**base, moe_impl=impl, moe_capacity=1.0)
        return jax.grad(lambda p: T.loss_fn(p, toks, tgts, cfg))(params)

    gs, go = grads("sparse"), grads("sort")
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(go)):
        assert_close(a, b, tol=1e-5)


def test_sort_moe_trains_and_shards_over_ep():
    from neuronika_tpu import parallel

    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32,
                      n_experts=4, moe_impl="sort", moe_capacity=1.25)
    mesh = parallel.make_mesh([("dp", 2), ("tp", 2), ("ep", 2)])
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.adam_init(params)
    step = T.make_sharded_train_step(mesh, cfg)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    params, opt, loss = step(params, opt, toks, tgts, jnp.float32(1e-3),
                             jax.random.key(2))
    assert np.isfinite(float(loss))


def test_moe_aux_loss_plumbing():
    """moe_aux_weight adds the Switch load-balance term to the loss."""
    base = dict(vocab_size=32, n_layer=2, n_head=2, d_model=32, d_ff=64,
                max_seq=16, dtype=jnp.float32, n_experts=4)
    params = T.init_params(jax.random.key(0), T.GPTConfig(**base))
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    l0 = float(T.loss_fn(params, toks, tgts, T.GPTConfig(**base, moe_aux_weight=0.0)))
    l1 = float(T.loss_fn(params, toks, tgts, T.GPTConfig(**base, moe_aux_weight=0.1)))
    # aux >= 1 for any routing, so the weighted loss strictly increases
    assert l1 > l0 + 0.1 * 0.9 * 2  # ~weight * aux(>~1) * n_layers


def test_dense_mlp_aux_is_zero():
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    _, aux = T.hidden_states(params, toks, cfg)
    assert float(aux) == 0.0


def test_gqa_matches_mha_when_equal_heads():
    base = dict(vocab_size=32, n_layer=2, d_model=32, d_ff=64, max_seq=16,
                dtype=jnp.float32)
    cfg_mha = T.GPTConfig(**base, n_head=4)
    cfg_gqa = T.GPTConfig(**base, n_head=4, n_kv_head=4)
    params = T.init_params(jax.random.key(0), cfg_mha)
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    assert_close(T.forward(params, toks, cfg_mha),
                 T.forward(params, toks, cfg_gqa), tol=1e-6)


def test_gqa_decode_matches_full_forward():
    cfg = T.GPTConfig(vocab_size=24, n_layer=2, n_head=4, n_kv_head=2,
                      d_model=32, d_ff=64, max_seq=10, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (2, 6), 0, 24)
    full = T.forward(params, toks, cfg)
    decode = T.make_decode_step(cfg)
    cache = T.init_kv_cache(cfg, 2)
    # GQA cache is half the MHA size
    assert cache["k"].shape[2] == 2
    for t in range(6):
        logits, cache = decode(params, cache, toks[:, t])
        assert_close(logits, full[:, t], tol=1e-4)


def test_gqa_trains():
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=4, n_kv_head=1,
                      d_model=32, d_ff=64, max_seq=16, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    step = T.make_train_step(cfg)
    opt = T.adam_init(params)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    losses = []
    for i in range(8):
        params, opt, loss = step(params, opt, toks, tgts,
                                 jnp.float32(1e-2), jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_train_step_grad_clip_and_accum():
    """Gradient accumulation equals the full-batch step exactly; clipping
    bounds the update."""
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32, flash="off",
                      remat=False, dropout=0.0)
    params = T.init_params(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (8, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)
    lr = jnp.float32(1e-3)

    def run(**kw):
        step = T.make_train_step(cfg, **kw)
        p, o, l = step(jax.tree.map(jnp.copy, params), T.adam_init(params),
                       toks, tgts, lr, jax.random.key(0))
        return p, float(l)

    p1, l1 = run()
    p4, l4 = run(accum_steps=4)
    assert abs(l1 - l4) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        assert_close(a, b, tol=1e-5)
    # clipping with a tiny max_norm changes the params but still trains
    pc, lc = run(grad_clip=1e-3)
    assert np.isfinite(lc)
    diff = max(float(jnp.abs(a - b).max())
               for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pc)))
    assert diff > 0.0


def test_sample_logits_controls():
    logits = jnp.log(jnp.asarray([[0.05, 0.15, 0.3, 0.5]]))
    # greedy
    assert int(T.sample_logits(logits, jax.random.key(0))[0]) == 3
    # top_k=1 == greedy regardless of temperature
    for i in range(5):
        assert int(T.sample_logits(logits, jax.random.key(i), 1.0,
                                    top_k=1)[0]) == 3
    # top_p=0.5: only token 3 (p=0.5 set) survives... cumulative < 0.5
    for i in range(5):
        assert int(T.sample_logits(logits, jax.random.key(i), 1.0,
                                    top_p=0.5)[0]) == 3
    # top_p=0.9 allows tokens {1,2,3} but never 0
    seen = {int(T.sample_logits(logits, jax.random.key(i), 1.0,
                                top_p=0.9)[0]) for i in range(40)}
    assert 0 not in seen and 3 in seen and len(seen) >= 2


def test_moe_decode_never_drops_tokens():
    """Capacity-based dispatch (sparse/sort) must not apply during decode:
    at S=1 the capacity count runs over the batch, so a popular expert
    would drop tokens mid-generation. All three moe_impls must produce
    identical decode logits (the no-drop dense routing)."""
    base = dict(vocab_size=24, n_layer=2, n_head=2, d_model=32, d_ff=64,
                max_seq=10, dtype=jnp.float32, n_experts=4)
    params = T.init_params(jax.random.key(0),
                           T.GPTConfig(**base, moe_impl="dense"))
    toks = jax.random.randint(jax.random.key(1), (8, 6), 0, 24)
    outs = {}
    for impl in ("dense", "sparse", "sort"):
        cfg = T.GPTConfig(**base, moe_impl=impl)
        decode = T.make_decode_step(cfg)
        cache = T.init_kv_cache(cfg, 8)
        for t in range(6):
            logits, cache = decode(params, cache, toks[:, t])
        outs[impl] = logits
    assert_close(outs["sparse"], outs["dense"], tol=1e-6)
    assert_close(outs["sort"], outs["dense"], tol=1e-6)
    # and dense decode tracks the dense full forward (existing invariant)
    cfg = T.GPTConfig(**base, moe_impl="dense")
    full = T.forward(params, toks, cfg)
    assert_close(outs["dense"], full[:, 5], tol=1e-4)


def test_int8_decode_tracks_fp_model():
    """W8A8 quantized serving (quant="int8"): on a briefly-trained model
    the quantized logits stay within ~2% of full precision and greedy
    decoding emits the same tokens."""
    cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=2, d_model=64,
                      d_ff=128, max_seq=32, dtype=jnp.float32, flash="off",
                      remat=False)
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.opt_init(params, cfg)
    step = T.make_train_step(cfg)
    toks = jax.random.randint(jax.random.key(1), (8, 32), 0, 64)
    tgt = jnp.roll(toks, -1, 1)
    for i in range(60):
        params, opt, _ = step(params, opt, toks, tgt, jnp.float32(1e-2),
                              jax.random.key(i))

    prompt = jnp.asarray(toks[:4, :8])
    out_fp = np.asarray(T.make_generate(cfg, max_new=8)(
        params, prompt, jax.random.key(5)))
    out_q8 = np.asarray(T.make_generate(cfg, max_new=8, quant="int8")(
        params, prompt, jax.random.key(5)))
    assert (out_fp == out_q8).all()

    d_fp = T.make_decode_step(cfg)
    d_q8 = T.make_decode_step(cfg, quant="int8")
    c1, c2 = T.init_kv_cache(cfg, 4), T.init_kv_cache(cfg, 4)
    for t in range(8):
        lf, c1 = d_fp(params, c1, prompt[:, t])
        lq, c2 = d_q8(params, c2, prompt[:, t])
    rel = float(jnp.abs(lf - lq).max() / (jnp.abs(lf).max() + 1e-9))
    assert rel < 0.02, rel
    assert (lf.argmax(-1) == lq.argmax(-1)).all()


def test_int8_kv_cache_decode():
    """quant="int8-kv": int8 weights AND int8 KV cache (per-token/head
    scales). On a trained GQA model the logits stay within ~2% and greedy
    generation matches full precision."""
    cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, n_kv_head=2,
                      d_model=64, d_ff=128, max_seq=32, dtype=jnp.float32,
                      flash="off", remat=False)
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.opt_init(params, cfg)
    step = T.make_train_step(cfg)
    toks = jax.random.randint(jax.random.key(1), (8, 32), 0, 64)
    tgt = jnp.roll(toks, -1, 1)
    for i in range(60):
        params, opt, _ = step(params, opt, toks, tgt, jnp.float32(1e-2),
                              jax.random.key(i))
    prompt = toks[:4, :8]
    out_fp = np.asarray(T.make_generate(cfg, max_new=8)(
        params, prompt, jax.random.key(5)))
    out_kv = np.asarray(T.make_generate(cfg, max_new=8, quant="int8-kv")(
        params, prompt, jax.random.key(5)))
    assert (out_fp == out_kv).all()

    d_fp = T.make_decode_step(cfg)
    d_kv = T.make_decode_step(cfg, quant="int8-kv")
    c1 = T.init_kv_cache(cfg, 4)
    c2 = T.init_kv_cache(cfg, 4, quant="int8-kv")
    assert c2["k"].dtype == jnp.int8
    for t in range(8):
        lf, c1 = d_fp(params, c1, prompt[:, t])
        lq, c2 = d_kv(params, c2, prompt[:, t])
    rel = float(jnp.abs(lf - lq).max() / (jnp.abs(lf).max() + 1e-9))
    assert rel < 0.02, rel
    assert (lf.argmax(-1) == lq.argmax(-1)).all()


def test_int4_decode_tracks_fp_model():
    """quant="int4" (W4A16: group-wise packed int4 body weights, int8
    head): greedy decoding matches full precision on a briefly-trained
    model and the logits stay within ~6%. prepare_decode_params gives
    BIT-IDENTICAL logits to in-program quantization (same math, hoisted
    out of the per-step program)."""
    cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=2, d_model=64,
                      d_ff=128, max_seq=32, dtype=jnp.float32, flash="off",
                      remat=False)
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.opt_init(params, cfg)
    step = T.make_train_step(cfg)
    toks = jax.random.randint(jax.random.key(1), (8, 32), 0, 64)
    tgt = jnp.roll(toks, -1, 1)
    for i in range(60):
        params, opt, _ = step(params, opt, toks, tgt, jnp.float32(1e-2),
                              jax.random.key(i))
    prompt = jnp.asarray(toks[:4, :8])
    out_fp = np.asarray(T.make_generate(cfg, max_new=8)(
        params, prompt, jax.random.key(5)))
    out_q4 = np.asarray(T.make_generate(cfg, max_new=8, quant="int4")(
        params, prompt, jax.random.key(5)))
    assert (out_fp == out_q4).all()

    d_fp = T.make_decode_step(cfg)
    d_q4 = T.make_decode_step(cfg, quant="int4")
    prepared = T.prepare_decode_params(params, cfg, "int4")
    assert isinstance(prepared["blocks"]["qkv"], dict)   # packed int4
    assert prepared["blocks"]["qkv"]["q4p"].dtype == jnp.int8
    c1, c2, c3 = (T.init_kv_cache(cfg, 4), T.init_kv_cache(cfg, 4),
                  T.init_kv_cache(cfg, 4))
    for t in range(8):
        lf, c1 = d_fp(params, c1, prompt[:, t])
        lq, c2 = d_q4(params, c2, prompt[:, t])
        lp, c3 = d_q4(prepared, c3, prompt[:, t])
    rel = float(jnp.abs(lf - lq).max() / (jnp.abs(lf).max() + 1e-9))
    assert rel < 0.06, rel
    assert (lf.argmax(-1) == lq.argmax(-1)).all()
    assert np.array_equal(np.asarray(lp), np.asarray(lq))


def test_min_p_and_repetition_penalty():
    """min-p keeps only tokens within min_p x the top probability;
    repetition penalty pushes greedy decoding off already-seen tokens."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    # min_p=0.5: only tokens with p >= 0.25 survive (tokens 0 and 1)
    seen = {int(T.sample_logits(logits, jax.random.key(i), 1.0,
                                min_p=0.5)[0]) for i in range(40)}
    assert seen <= {0, 1} and 0 in seen

    # a tiny trained model loops without penalty; with a harsh penalty
    # the greedy output must not immediately repeat the previous token
    cfg = T.GPTConfig(vocab_size=16, n_layer=1, n_head=1, d_model=16,
                      d_ff=32, max_seq=24, dtype=jnp.float32, flash="off",
                      remat=False)
    params = T.init_params(jax.random.key(0), cfg)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    plain = np.asarray(T.make_generate(cfg, max_new=12)(
        params, prompt, jax.random.key(0)))[0, 3:]
    pen = np.asarray(T.make_generate(cfg, max_new=12,
                                     repetition_penalty=1e6)(
        params, prompt, jax.random.key(0)))[0, 3:]
    # greedy decoding of an untrained model loops; the penalty must
    # strictly increase token diversity (CTRL-style division cannot ban
    # absolutely when all logits are negative, so == max_new is not
    # guaranteed)
    assert len(set(pen.tolist())) > len(set(plain.tolist()))
    assert len(set(pen.tolist())) >= 10


def test_ema_tracks_params():
    from neuronika_tpu.optim.functional import (ema_init, ema_params,
                                                ema_update)

    p = {"w": jnp.ones((4,), jnp.bfloat16)}
    ema = ema_init(p)
    assert ema["w"].dtype == jnp.float32
    for _ in range(200):
        p = {"w": p["w"] * 0 + 2.0}  # params jump to 2.0
        ema = ema_update(ema, p, decay=0.9)
    out = ema_params(ema, p)
    assert out["w"].dtype == jnp.bfloat16
    assert abs(float(ema["w"][0]) - 2.0) < 1e-3


def test_external_serving_loop_contract():
    """SERVING.md's external-loop recipe (make_prefill once + greedy
    make_decode_step continuation) must reproduce make_generate
    exactly."""
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=24, dtype=jnp.float32, flash="off",
                      remat=False)
    params = T.init_params(jax.random.key(0), cfg)
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    ref = np.asarray(T.make_generate(cfg, max_new=6)(
        params, prompt, jax.random.key(0)))
    pre = T.make_prefill(cfg)
    dec = T.make_decode_step(cfg)
    cache = T.init_kv_cache(cfg, 2)
    logits, cache = pre(params, cache, prompt)
    toks = [np.asarray(prompt)]
    for _ in range(6):
        nxt = logits.argmax(-1).astype(jnp.int32)
        toks.append(np.asarray(nxt)[:, None])
        logits, cache = dec(params, cache, nxt)
    assert (np.concatenate(toks, axis=1) == ref).all()


def test_beam_and_speculative_under_quant_modes():
    """Beam search and speculative decoding must stay self-consistent
    under every quant mode: beams match full precision on a small model,
    and speculative output equals the SAME-quant greedy generate."""
    cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=24, dtype=jnp.float32, flash="off",
                      remat=False)
    cfg_d = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                        d_ff=64, max_seq=24, dtype=jnp.float32,
                        flash="off", remat=False)
    params = T.init_params(jax.random.key(0), cfg)
    pd = T.init_params(jax.random.key(7), cfg_d)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    t_fp, s_fp = T.make_beam_search(cfg, max_new=6, n_beams=3)(params,
                                                               prompt)
    for q in ("int8", "int8-kv"):
        t_q, s_q = T.make_beam_search(cfg, max_new=6, n_beams=3,
                                      quant=q)(params, prompt)
        assert (np.asarray(t_q) == np.asarray(t_fp)).all(), q
        assert np.allclose(np.asarray(s_q), np.asarray(s_fp), atol=0.05)
    for q in (None, "int8", "int8-kv"):
        ref = np.asarray(T.make_generate(cfg, max_new=6, quant=q)(
            params, prompt, jax.random.key(0)))
        out, _ = T.make_speculative_generate(
            cfg, cfg_d, 6, gamma=3, quant=q, draft_quant=q)(params, pd,
                                                            prompt)
        assert (np.asarray(out) == ref).all(), q


def test_speculative_decode_equals_target_greedy():
    """Speculative decoding must emit EXACTLY the target model's greedy
    continuation for any draft (accepted tokens equal the target argmax
    by construction; mismatches emit the correction), and a perfect
    draft (the target itself) must cut the number of target passes to
    ~max_new/(gamma+1)."""
    cfg_t = T.GPTConfig(vocab_size=48, n_layer=2, n_head=2, d_model=48,
                        d_ff=96, max_seq=64, dtype=jnp.float32,
                        flash="off", remat=False)
    cfg_d = T.GPTConfig(vocab_size=48, n_layer=1, n_head=2, d_model=32,
                        d_ff=64, max_seq=64, dtype=jnp.float32,
                        flash="off", remat=False)
    pt = T.init_params(jax.random.key(0), cfg_t)
    pd = T.init_params(jax.random.key(9), cfg_d)
    opt = T.opt_init(pt, cfg_t)
    step = T.make_train_step(cfg_t)
    toks = jax.random.randint(jax.random.key(1), (8, 32), 0, 48)
    tgt = jnp.roll(toks, -1, 1)
    for i in range(40):
        pt, opt, _ = step(pt, opt, toks, tgt, jnp.float32(1e-2),
                          jax.random.key(i))

    prompt = toks[:1, :8]
    ref = np.asarray(T.make_generate(cfg_t, max_new=16)(
        pt, prompt, jax.random.key(0)))
    for gamma in (1, 4, 7):
        out, iters = T.make_speculative_generate(
            cfg_t, cfg_d, 16, gamma=gamma)(pt, pd, prompt)
        assert (np.asarray(out) == ref).all(), gamma
        assert int(iters) <= 16
    out, iters = T.make_speculative_generate(cfg_t, cfg_t, 16, gamma=4)(
        pt, pt, prompt)
    assert (np.asarray(out) == ref).all()
    assert int(iters) <= 5  # perfect draft: ceil(16/5) + slack


def test_beam_search_exhaustive_and_greedy_equivalence():
    """Beam search: n_beams=1 must equal greedy generation, and with
    n_beams == vocab_size and max_new=2 the search is exhaustive — the
    top beam must match the brute-force best sequence and its exact
    total log-probability."""
    import itertools

    cfg = T.GPTConfig(vocab_size=8, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32, flash="off",
                      remat=False)
    params = T.init_params(jax.random.key(3), cfg)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)

    greedy = np.asarray(T.make_generate(cfg, max_new=4)(
        params, prompt, jax.random.key(0)))
    toks, _ = T.make_beam_search(cfg, max_new=4, n_beams=1)(params, prompt)
    assert (np.asarray(toks)[0, 0] == greedy[0]).all()

    toks, scores = T.make_beam_search(cfg, max_new=2, n_beams=8)(
        params, prompt)

    def seq_logp(t1, t2):
        ids = jnp.asarray([[1, 2, 3, t1, t2]], jnp.int32)
        lp = jax.nn.log_softmax(
            T.forward(params, ids, cfg).astype(jnp.float32), -1)
        return float(lp[0, 2, t1] + lp[0, 3, t2])

    best = max(((t1, t2, seq_logp(t1, t2)) for t1, t2 in
                itertools.product(range(8), range(8))),
               key=lambda x: x[2])
    assert (np.asarray(toks)[0, 0, 3:] == np.array(best[:2])).all()
    assert abs(float(scores[0, 0]) - best[2]) < 1e-4
    # beams come back sorted best-first
    s = np.asarray(scores)[0]
    assert (np.diff(s) <= 1e-6).all()


def test_make_generate_on_device_matches_host_loop():
    """The single-program scan generator (make_generate) must emit exactly
    the host-loop generate() tokens under greedy decoding."""
    cfg = T.GPTConfig(vocab_size=24, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, max_seq=16, dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    prompt = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    host = T.generate(params, cfg, prompt, max_new=6)
    gen = T.make_generate(cfg, max_new=6)
    dev = np.asarray(gen(params, jnp.asarray(prompt), jax.random.key(0)))
    assert (host == dev).all()


def test_make_generate_sampling_controls():
    cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                      d_ff=64, max_seq=32, dtype=jnp.float32, flash="off")
    params = T.init_params(jax.random.key(0), cfg)
    gen = T.make_generate(cfg, max_new=5, temperature=0.8, top_k=8,
                          top_p=0.9)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    out = np.asarray(gen(params, prompt, jax.random.key(1)))
    assert out.shape == (1, 8)
    assert (out[:, :3] == np.asarray(prompt)).all()
    assert ((out >= 0) & (out < 32)).all()


def test_generate_with_sampling_controls():
    cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                      d_ff=64, max_seq=32, dtype=jnp.float32, flash="off")
    params = T.init_params(jax.random.key(0), cfg)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    out = T.generate(params, cfg, prompt, 5, key=jax.random.key(1),
                     temperature=0.8, top_k=8, top_p=0.9)
    assert out.shape == (1, 8)
    assert (out[:, :3] == np.asarray(prompt)).all()
    assert ((out >= 0) & (out < 32)).all()


def test_unrolled_layers_match_scan():
    """cfg.scan_layers=False (unrolled python loop; profiling showed the
    scan's residual stacking costs ~29% of the train step) produces the
    same loss and gradients as the scan."""
    base = dict(vocab_size=32, n_layer=3, n_head=2, d_model=32, d_ff=64,
                max_seq=16, dtype=jnp.float32, flash="off", remat=True)
    params = T.init_params(jax.random.key(0), T.GPTConfig(**base))
    toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
    tgts = jnp.roll(toks, -1, axis=1)

    def lg(scan):
        cfg = T.GPTConfig(**base, scan_layers=scan)
        return jax.value_and_grad(
            lambda p: T.loss_fn(p, toks, tgts, cfg, train=True,
                                key=jax.random.key(0)))(params)

    (l1, g1), (l2, g2) = lg(True), lg(False)
    assert_close(l1, l2, tol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert_close(a, b, tol=1e-5)


class TestResNet:
    def test_forward_shapes_and_training(self):
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.models import resnet as R

        cfg = R.ResNetConfig(stages=(1, 1), width=16, num_classes=4)
        p = R.init_params(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        y = jax.random.randint(jax.random.key(2), (8,), 0, 4)
        logits = R.forward(p, x, cfg)
        assert logits.shape == (8, 4)
        assert logits.dtype == jnp.float32
        step = R.make_train_step(cfg, weight_decay=1e-4)
        buf = R.momentum_init(p)
        first = None
        for _ in range(12):
            p, buf, loss = step(p, buf, x, y, jnp.float32(0.05))
            first = first or float(loss)
        assert float(loss) < first

    def test_imagenet_stem_downsamples(self):
        import jax

        from neuronika_tpu.models import resnet as R

        cfg = R.ResNetConfig(stages=(1,), width=8, num_classes=3,
                             stem="imagenet")
        p = R.init_params(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
        assert R.forward(p, x, cfg).shape == (2, 3)

    def test_pallas_conv_impl_matches_xla(self):
        """conv_impl="pallas" (direct NHWC kernel, strided via phase
        decomposition, Pallas dx/dw for stride 1) == the XLA conv path —
        logits AND parameter gradients, cifar (3x3/s1 + s2 downsample
        stage) and imagenet (7x7/s2 stem) variants."""
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.config import config
        from neuronika_tpu.models import resnet as R

        config.pallas_interpret = True
        try:
            for stem, hw in (("cifar", 16), ("imagenet", 18)):
                cfg_x = R.ResNetConfig(stages=(1, 1), width=8, num_classes=3,
                                       stem=stem)
                cfg_p = R.ResNetConfig(stages=(1, 1), width=8, num_classes=3,
                                       stem=stem, conv_impl="pallas")
                p = R.init_params(jax.random.key(0), cfg_x)
                x = jax.random.uniform(jax.random.key(1), (2, hw, hw, 3))
                y = jax.random.randint(jax.random.key(2), (2,), 0, 3)
                assert_close(R.forward(p, x, cfg_p),
                             R.forward(p, x, cfg_x), tol=1e-4)
                ga = jax.grad(R.loss_fn)(p, x, y, cfg_p)
                gb = jax.grad(R.loss_fn)(p, x, y, cfg_x)
                jax.tree.map(lambda a, b: assert_close(a, b, tol=1e-4),
                             ga, gb)
        finally:
            config.pallas_interpret = False

    def test_groupnorm_batch_independent(self):
        """GN: per-sample stats — row 0's output can't depend on row 1."""
        import jax
        import numpy as np

        from neuronika_tpu.models import resnet as R

        cfg = R.ResNetConfig(stages=(1,), width=8, num_classes=3)
        p = R.init_params(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
        full = R.forward(p, x, cfg)
        solo = R.forward(p, x[:1], cfg)
        np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(solo),
                                   rtol=2e-5, atol=2e-5)


class TestViT:
    def test_forward_and_training(self):
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.models import vit as V
        from neuronika_tpu.optim.functional import adam_init

        cfg = V.ViTConfig(image=16, patch=4, d_model=64, n_layer=2,
                          n_head=2, d_ff=128, num_classes=5)
        p = V.init_params(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (8, 16, 16, 3))
        y = jax.random.randint(jax.random.key(2), (8,), 0, 5)
        assert V.forward(p, x, cfg).shape == (8, 5)
        step = V.make_train_step(cfg)
        o = adam_init(p)
        first = None
        for _ in range(15):
            p, o, loss = step(p, o, x, y, jnp.float32(1e-3))
            first = first or float(loss)
        assert float(loss) < first

    def test_patchify_is_exact_unfold(self):
        import jax
        import numpy as np

        from neuronika_tpu.models import vit as V

        cfg = V.ViTConfig(image=8, patch=4)
        x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 3))
        got = np.asarray(V._patchify(x, cfg))
        xn = np.asarray(x)
        # patch 0 is the top-left 4x4 block, row-major
        np.testing.assert_allclose(got[0, 0], xn[0, :4, :4, :].reshape(-1))
        np.testing.assert_allclose(got[0, 1], xn[0, :4, 4:, :].reshape(-1))
        np.testing.assert_allclose(got[0, 2], xn[0, 4:, :4, :].reshape(-1))


def test_flash_small_head_dim_routes_to_split_layout():
    """hd < 128: the packed-qkv kernels are illegal on TPU (Mosaic's
    128-lane block rule), so flash='on' must route through the split
    (B,H,S,hd) kernels — and match the composite path numerically.
    Regression for the d512/H8 crash found by tools/train_demo.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuronika_tpu.config import config as C
    from neuronika_tpu.models import transformer as T

    old = C.pallas_interpret
    C.pallas_interpret = True
    try:
        kw = dict(vocab_size=64, n_layer=1, n_head=4, d_model=256,
                  d_ff=256, max_seq=128, dropout=0.0, dtype=jnp.float32)
        cfg_fl = T.GPTConfig(**kw, flash="on")
        cfg_off = T.GPTConfig(**kw, flash="off")
        assert cfg_fl.d_model // cfg_fl.n_head == 64
        params = T.init_params(jax.random.key(0), cfg_fl)
        tok = jax.random.randint(jax.random.key(1), (2, 128), 0, 64)
        tgt = jnp.roll(tok, -1, 1)
        k = jax.random.key(2)
        lf = float(T.loss_fn(params, tok, tgt, cfg_fl, train=True, key=k))
        lo = float(T.loss_fn(params, tok, tgt, cfg_off, train=True, key=k))
        assert np.isfinite(lf)
        np.testing.assert_allclose(lf, lo, rtol=2e-4)
    finally:
        C.pallas_interpret = old


class TestContinuousBatching:
    def _cfg(self):
        import jax.numpy as jnp

        return T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                           d_ff=128, max_seq=48, dtype=jnp.float32,
                           flash="off")

    @pytest.mark.parametrize("quant", [None, "int8", "int4"])
    def test_matches_one_shot_generate(self, quant):
        """Three requests of different lengths through TWO slots: every
        request's greedy tokens must equal its own one-shot
        make_generate run (slot batching and mid-flight admission must
        not perturb decoding)."""
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts = [
            np.array([1, 2, 3, 4], np.int32),
            np.array([7, 8], np.int32),
            np.array([9, 10, 11, 12, 13, 14, 15, 16], np.int32),
        ]
        max_news = [10, 4, 7]

        cb = ContinuousBatcher(params, cfg, n_slots=2, quant=quant)
        rids = [cb.submit(p, m) for p, m in zip(prompts, max_news)]
        assert cb.stats[1] == 1  # third request queued behind 2 slots
        done = cb.run()
        assert set(done) == set(rids)

        for p, m, rid in zip(prompts, max_news, rids):
            gen = T.make_generate(cfg, max_new=m, quant=quant)
            ref = np.asarray(gen(params, p[None], jax.random.key(1)))[0]
            np.testing.assert_array_equal(done[rid], ref[len(p):])

    @pytest.mark.parametrize("quant", [None, "int4"])
    def test_prefix_caching_matches_full_prefill(self, quant):
        """register_prefix: requests sharing a system prefix reuse its
        cached KV (only the suffix is prefilled) and must emit EXACTLY
        the tokens of a batcher with no prefix registered — the slot
        state is byte-identical to a full prefill. Longest matching
        prefix wins; non-matching prompts take the full-prefill path."""
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        system = np.array([5, 6, 7, 8, 9, 10], np.int32)
        longer = np.concatenate([system, [11, 12]]).astype(np.int32)
        prompts = [
            np.concatenate([system, [1, 2]]).astype(np.int32),
            np.concatenate([longer, [3]]).astype(np.int32),   # longest wins
            np.array([40, 41, 42], np.int32),                 # no match
        ]
        max_news = [6, 5, 4]

        plain = ContinuousBatcher(params, cfg, n_slots=2, quant=quant)
        rids0 = [plain.submit(p, m) for p, m in zip(prompts, max_news)]
        ref = plain.run()

        cb = ContinuousBatcher(params, cfg, n_slots=2, quant=quant)
        cb.register_prefix(system)
        cb.register_prefix(longer)
        assert cb._match_prefix(prompts[1])[2] == len(longer)
        assert cb._match_prefix(prompts[2]) is None
        rids = [cb.submit(p, m) for p, m in zip(prompts, max_news)]
        out = cb.run()
        for r0, r in zip(rids0, rids):
            np.testing.assert_array_equal(out[r], ref[r0])

    def test_eos_frees_slot_early(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        # find the greedy first token of this prompt, then use it as eos
        gen = T.make_generate(cfg, max_new=2)
        p = np.array([5, 6, 7], np.int32)
        first = int(np.asarray(gen(params, p[None], jax.random.key(1))
                               )[0, len(p)])
        cb = ContinuousBatcher(params, cfg, n_slots=1, eos_id=first)
        rid = cb.submit(p, max_new=20)
        done = cb.run()
        assert done[rid].shape[0] == 1      # stopped at eos immediately
        assert done[rid][0] == first


class TestPagedBatcher:
    """vLLM-style paged KV cache: block-pool K/V + block tables +
    on-demand allocation with preemption. Greedy outputs must be
    byte-identical to the dense-slot batcher in every regime."""

    def _cfg(self, **kw):
        import jax.numpy as jnp

        base = dict(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                    d_ff=128, max_seq=48, dtype=jnp.float32, flash="off")
        base.update(kw)
        return T.GPTConfig(**base)

    def _prompts(self):
        return ([np.array([1, 2, 3, 4], np.int32),
                 np.array([7, 8], np.int32),
                 np.array([9, 10, 11, 12, 13, 14, 15, 16], np.int32)],
                [10, 4, 7])

    def _run_pair(self, cfg, quant=None, **paged_kw):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher, PagedBatcher

        params = T.init_params(jax.random.key(0), cfg)
        prompts, max_news = self._prompts()
        plain = ContinuousBatcher(params, cfg, n_slots=2, quant=quant)
        r0 = [plain.submit(p, m) for p, m in zip(prompts, max_news)]
        ref = plain.run()
        pb = PagedBatcher(params, cfg, n_slots=2, quant=quant, **paged_kw)
        r1 = [pb.submit(p, m) for p, m in zip(prompts, max_news)]
        out = pb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(out[b], ref[a])
        return pb

    @pytest.mark.parametrize("quant", [None, "int8", "int4"])
    def test_matches_dense_batcher(self, quant):
        pb = self._run_pair(self._cfg(), quant=quant,
                            n_blocks=16, block_size=8)
        # all blocks returned to the pool when every request finished
        assert pb.block_stats == (0, 15)
        assert pb.preemptions == 0

    def test_preemption_preserves_output(self):
        """A pool too small for all admitted requests forces the
        newest running request to be preempted (blocks freed, request
        re-queued) and later re-prefilled from its own history — the
        greedy tokens must not change."""
        pb = self._run_pair(self._cfg(), n_blocks=5, block_size=4)
        assert pb.preemptions > 0
        assert pb.block_stats == (0, 4)

    def test_kernel_on_with_mesh_raises(self):
        """ADVICE r4: the fused block-table kernel is a single-chip
        Pallas program — an explicit kernel="on" combined with mesh=
        must fail loudly at construction, not at trace time."""
        import jax

        from neuronika_tpu import parallel
        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        mesh = parallel.make_mesh([("tp", 2)], devices=jax.devices()[:2])
        with pytest.raises(ValueError, match="tp-sharded"):
            PagedBatcher(params, cfg, n_slots=2, n_blocks=8,
                         block_size=4, kernel="on", mesh=mesh)

    def test_unsatisfiable_window_does_not_evict(self):
        """ADVICE r4: a window reservation that cannot be hosted even
        by preempting every peer must bail BEFORE evicting anyone.

        Through the public API `step_many` caps k at the tightest
        remaining budget and `submit` gates each request's worst case
        to fit the pool alone, so the guard is a defensive invariant —
        exercise it by calling `_grow_many` directly with an oversized
        k (pool: 4 usable blocks; each slot holds 1; a k=32 window
        needs 9 blocks for one slot, more than free 2 + the peer's 1):
        it must return False with NO preemption and both requests still
        running (the old code evicted the peer, then abandoned the
        window anyway when the pool still came up short)."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts = [np.array([1, 2, 3, 4], np.int32),
                   np.array([5, 6, 7, 8], np.int32)]
        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=5,
                          block_size=4)
        rids = [pb.submit(p, 4) for p in prompts]
        pb.step()                        # admit + prefill both
        assert len(pb._running) == 2
        pos_before = pb._pos.copy()
        assert pb._grow_many(32) is False
        assert pb.preemptions == 0
        assert len(pb._running) == 2     # nobody evicted
        # positions only advance when the whole window is reserved
        np.testing.assert_array_equal(pb._pos, pos_before)
        out = pb.run()                   # per-step path finishes cleanly
        assert pb.preemptions == 0
        assert all(len(out[r]) == 4 for r in rids)

    def test_block_pool_partition_invariant(self):
        """Allocator soundness under a randomized workload: at every
        step, each block id 1..n_blocks-1 sits in EXACTLY one of the
        free list, the prefix registry, or one slot's owned list — no
        leaks, no double ownership — across admission, prefix hits,
        chunked prefill, multi-step windows and preemption; and every
        request still completes with its full token budget."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        pb = PagedBatcher(params, cfg, n_slots=3, n_blocks=14,
                          block_size=4, prefill_chunk=4)

        def check():
            free = list(pb._free_blocks)
            pref = [b for _, blocks in pb._paged_prefixes
                    for b in np.asarray(blocks).tolist()]
            owned = [b for bl in pb._slot_blocks.values() for b in bl]
            ids = free + pref + owned
            assert len(ids) == len(set(ids)), "block owned twice"
            assert set(ids) == set(range(1, pb.n_blocks)), "block leaked"
            # shared prefix blocks are table-only: never in owned lists
            assert not (set(owned) & set(pref))

        prefix = np.arange(1, 9, dtype=np.int32)          # 2 full blocks
        pb.register_prefix(prefix)
        check()
        rng = np.random.default_rng(7)
        want = {}
        for _ in range(9):
            if rng.random() < 0.4:  # prefix hit (suffix keeps it shared)
                p = np.concatenate(
                    [prefix, rng.integers(1, 64, 3).astype(np.int32)])
            else:
                p = rng.integers(1, 64, int(rng.integers(2, 9))).astype(
                    np.int32)
            new = int(rng.integers(2, 7))
            want[pb.submit(p, new)] = new
        guard = 0
        while (pb._running or pb._queue) and guard < 300:
            if guard % 3 == 2:
                pb.step_many(2)
            else:
                pb.step()
            check()
            guard += 1
        assert guard < 300, "batcher did not drain"
        out = pb.run()
        check()
        assert {r: len(t) for r, t in out.items()} == want

    def test_rope_gqa_sliding_window(self):
        """Positions survive paging: rope rotation, grouped-query KV
        and the sliding-window mask all key off LOGICAL positions,
        which the block-table gather preserves by construction."""
        cfg = self._cfg(n_kv_head=2, pos_emb="rope", window=6)
        self._run_pair(cfg, n_blocks=16, block_size=8)

    def test_admission_gated_on_blocks(self):
        """With free slots but a dry pool the queue must hold (no
        scratch-block corruption), then drain as blocks free."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        pb = PagedBatcher(params, cfg, n_slots=4, n_blocks=5,
                          block_size=4)
        pb.submit(np.arange(1, 13, dtype=np.int32), 4)   # 3 blocks
        pb.submit(np.arange(1, 9, dtype=np.int32), 4)    # needs 2: only 1
        assert pb.stats[0] == 1 and pb.stats[1] == 1
        done = pb.run()
        assert len(done) == 2

    def test_oversized_request_rejected(self):
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        pb = PagedBatcher(params, cfg, n_slots=1, n_blocks=3,
                          block_size=4)
        with pytest.raises(ValueError, match="blocks"):
            pb.submit(np.arange(1, 9, dtype=np.int32), 8)

    @pytest.mark.parametrize("kw", [
        {},
        dict(n_kv_head=2, pos_emb="rope"),
    ])
    def test_prefix_caching_matches_unprefixed(self, kw):
        """vLLM full-block prefix sharing: a registered prefix reserves
        whole pool blocks once; matching requests point their tables at
        them and prefill only the suffix — greedy output must be
        byte-identical to the unprefixed paged batcher."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg(**kw)
        params = T.init_params(jax.random.key(0), cfg)
        prefix = np.arange(1, 18, dtype=np.int32)       # 17 toks, BS=8
        prompts = [np.concatenate([prefix, extra]) for extra in (
            np.array([20, 21], np.int32),
            np.array([30], np.int32),
            np.array([40, 41, 42, 43, 44, 45, 46, 47], np.int32),
        )]
        plain = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                             block_size=8)
        r0 = [plain.submit(p, m) for p, m in zip(prompts, (8, 6, 5))]
        ref = plain.run()
        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                          block_size=8)
        pid = pb.register_prefix(prefix)
        assert pid == 0 and pb.reserved_blocks == 2    # 17 // 8 full blocks
        r1 = [pb.submit(p, m) for p, m in zip(prompts, (8, 6, 5))]
        out = pb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(out[b], ref[a])
        # shared blocks stay reserved, own blocks all returned
        assert pb.block_stats == (0, 32 - 1 - 2)

    def test_prefix_survives_preemption(self):
        """A preempted prefix-matched request must re-match on resume
        and still produce identical tokens."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prefix = np.arange(1, 9, dtype=np.int32)        # exactly 1 block
        prompts = [np.concatenate([prefix, np.array([20 + i], np.int32)])
                   for i in range(3)]
        plain = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                             block_size=4)
        r0 = [plain.submit(p, 10) for p in prompts]
        ref = plain.run()
        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=8,
                          block_size=4)   # tight pool -> preemption
        pb.register_prefix(prefix)
        r1 = [pb.submit(p, 10) for p in prompts]
        out = pb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(out[b], ref[a])
        assert pb.preemptions > 0

    def test_prefix_validation(self):
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        pb = PagedBatcher(params, cfg, n_slots=1, n_blocks=8,
                          block_size=8)
        with pytest.raises(ValueError, match="full block"):
            pb.register_prefix(np.arange(5, dtype=np.int32))

    @pytest.mark.parametrize("kw", [
        {},
        dict(n_kv_head=2, pos_emb="rope", window=6),
    ])
    def test_pallas_kernel_matches_dense_batcher(self, kw):
        """kernel="on" routes decode attention through the fused
        block-table Pallas kernel (interpret mode off-TPU) — greedy
        output must stay byte-identical to the dense batcher, i.e. to
        the XLA gather path, including under GQA + rope + window."""
        from neuronika_tpu.config import config

        config.pallas_interpret = True
        try:
            self._run_pair(self._cfg(**kw), n_blocks=16, block_size=8,
                           kernel="on")
        finally:
            config.pallas_interpret = False


class TestBatcherSampling:
    """Per-request sampling in the batchers (`submit(..., temperature=,
    top_k=, top_p=, min_p=, seed=)`), built on `sample_logits_batched`
    — one compiled program serves heterogeneous greedy/sampled rows,
    and each row's randomness keys off (seed, tokens_emitted) so output
    is independent of batch composition."""

    def _cfg(self):
        import jax.numpy as jnp

        return T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                           d_ff=128, max_seq=48, dtype=jnp.float32,
                           flash="off")

    def test_sampler_greedy_rows_match_argmax(self):
        import jax

        logits = jax.random.normal(jax.random.key(0), (4, 64))
        out = T.sample_logits_batched(
            logits, jnp.zeros(4, jnp.uint32), jnp.zeros(4, jnp.int32),
            jnp.zeros(4), jnp.zeros(4, jnp.int32), jnp.zeros(4),
            jnp.zeros(4))
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(logits.argmax(-1)))

    def test_sampler_respects_topk_filter(self):
        import jax

        logits = jax.random.normal(jax.random.key(1), (2, 64))
        top3 = np.asarray(jax.lax.top_k(logits, 3)[1])
        for step in range(50):
            out = np.asarray(T.sample_logits_batched(
                logits, jnp.asarray([7, 8], jnp.uint32),
                jnp.full((2,), step, jnp.int32),
                jnp.full((2,), 5.0), jnp.full((2,), 3, jnp.int32),
                jnp.zeros(2), jnp.zeros(2)))
            for b in range(2):
                assert out[b] in top3[b], (b, out[b], top3[b])

    def test_topk1_equals_greedy_end_to_end(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompt = np.array([3, 1, 4, 1, 5], np.int32)
        cb = ContinuousBatcher(params, cfg, n_slots=2)
        r_greedy = cb.submit(prompt, 8)
        r_k1 = cb.submit(prompt, 8, temperature=1.7, top_k=1)
        out = cb.run()
        np.testing.assert_array_equal(out[r_k1], out[r_greedy])

    def test_sampled_request_independent_of_batchmates(self):
        """Same (prompt, seed, controls) must emit the same tokens
        whether served alone or co-batched with other requests — the
        per-row fold_in(seed, tokens_emitted) key schedule."""
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompt = np.array([9, 10, 11], np.int32)
        kw = dict(temperature=0.9, top_k=8, seed=42)
        alone = ContinuousBatcher(params, cfg, n_slots=3)
        r0 = alone.submit(prompt, 10, **kw)
        want = alone.run()[r0]
        crowded = ContinuousBatcher(params, cfg, n_slots=3)
        crowded.submit(np.array([20, 21], np.int32), 12)
        r1 = crowded.submit(prompt, 10, **kw)
        crowded.submit(np.array([30], np.int32), 6, temperature=1.2,
                       seed=7)
        out = crowded.run()
        np.testing.assert_array_equal(out[r1], want)

    def test_sampling_survives_preemption_paged(self):
        """A sampled request preempted mid-stream must resume with the
        SAME continuation (key schedule counts tokens emitted, and the
        re-prefill rebuilds exact K/V)."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts = [np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], np.int32),
                   np.array([20, 21, 22, 23, 24, 25, 26, 27], np.int32)]
        kw = dict(temperature=0.8, top_k=12, seed=5)
        roomy = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                             block_size=4)
        r0 = [roomy.submit(p, 10, **kw) for p in prompts]
        ref = roomy.run()
        tight = PagedBatcher(params, cfg, n_slots=2, n_blocks=8,
                             block_size=4)
        r1 = [tight.submit(p, 10, **kw) for p in prompts]
        out = tight.run()
        assert tight.preemptions > 0
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(out[b], ref[a])


class TestRoPE:
    """pos_emb="rope": rotary positions (GPT-NeoX half-split), no wpe
    param; keys cached post-rotation so decode needs no re-rotation."""

    def _cfg(self, **kw):
        import jax.numpy as jnp

        base = dict(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                    d_ff=128, max_seq=48, dtype=jnp.float32, flash="off",
                    pos_emb="rope")
        base.update(kw)
        return T.GPTConfig(**base)

    def test_no_wpe_param_and_trains(self):
        import jax
        import jax.numpy as jnp

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        assert "wpe" not in p
        step = T.make_train_step(cfg)
        opt = T.adam_init(p)
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 64)
        first = None
        for i in range(8):
            p, opt, loss = step(p, opt, toks, jnp.roll(toks, -1, 1),
                                jnp.float32(1e-2), jax.random.key(i))
            first = first or float(loss)
        assert float(loss) < first

    def test_matches_manual_rotary_reference(self):
        """Model attention == hand-built rotary attention on the same
        unpacked q/k/v (pins the rotation convention)."""
        import jax
        import jax.numpy as jnp

        cfg = self._cfg(n_layer=1)
        p = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (1, 8), 0, 64)
        S, D, H = 8, cfg.d_model, cfg.n_head
        hd = D // H

        # model forward
        out = T.forward(p, toks, cfg)

        # manual: embed, ln, qkv, rotate, attend, proj, mlp, head
        blk = jax.tree.map(lambda l: l[0], p["blocks"])
        x = p["wte"][toks].astype(jnp.float32)
        h1 = T._layer_norm(x, blk["ln1"])
        qkv = h1 @ blk["qkv"] + blk["qkv_b"]
        q, k, v = T._unpack_qkv(qkv, cfg)            # (1,S,KV,G,hd)/(1,S,KV,hd)
        q = q.reshape(1, S, H, hd).transpose(0, 2, 1, 3)
        k = jnp.repeat(k.transpose(0, 2, 1, 3), H // T._kv_heads(cfg), 1)
        v = jnp.repeat(v.transpose(0, 2, 1, 3), H // T._kv_heads(cfg), 1)
        pos = jnp.arange(S, dtype=jnp.float32)
        inv = cfg.rope_theta ** (-jnp.arange(0, hd, 2) / hd)
        ang = pos[:, None] * inv                      # (S, hd/2)

        def rot(t):
            t1, t2 = jnp.split(t, 2, -1)
            return jnp.concatenate(
                [t1 * jnp.cos(ang) - t2 * jnp.sin(ang),
                 t2 * jnp.cos(ang) + t1 * jnp.sin(ang)], -1)

        q, k = rot(q), rot(k)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        att = jnp.where(jnp.tril(jnp.ones((S, S), bool)), att, -1e30)
        att = jax.nn.softmax(att, -1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(1, S, D)
        x = x + ctx @ blk["proj"] + blk["proj_b"]
        h2 = T._layer_norm(x, blk["ln2"])
        m = jax.nn.gelu(h2 @ blk["fc_in"] + blk["fc_in_b"])
        x = x + m @ blk["fc_out"] + blk["fc_out_b"]
        ref = T._layer_norm(x, p["ln_f"]) @ p["wte"].T
        assert_close(out, ref, tol=1e-4)

    @pytest.mark.parametrize("kv", [0, 2])
    def test_generate_matches_forward(self, kv):
        """Greedy decode (prefill + scanned decode with per-position
        rotation of fresh q/k only) == teacher-forced forward argmax."""
        import jax
        import jax.numpy as jnp

        cfg = self._cfg(n_kv_head=kv)
        p = T.init_params(jax.random.key(0), cfg)
        prompt = jax.random.randint(jax.random.key(1), (2, 6), 0, 64)
        gen = T.make_generate(cfg, max_new=10)
        out = np.asarray(gen(p, prompt, jax.random.key(2)))
        seq = prompt
        for _ in range(10):
            logits = T.forward(p, seq, cfg)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(out, np.asarray(seq))

    def test_flash_matches_xla_attention(self):
        """rope routes through the split flash path — same logits as the
        materialised-attention path."""
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.config import config

        cfg_f = self._cfg(max_seq=128, flash="on", flash_block=128)
        cfg_x = self._cfg(max_seq=128, flash="off")
        p = T.init_params(jax.random.key(0), cfg_f)
        toks = jax.random.randint(jax.random.key(1), (2, 128), 0, 64)
        config.pallas_interpret = True
        try:
            a = T.forward(p, toks, cfg_f)
        finally:
            config.pallas_interpret = False
        b = T.forward(p, toks, cfg_x)
        assert_close(a, b, tol=1e-4)

    def test_continuous_batching_rope(self):
        """Slot serving (vector positions) under rope matches one-shot."""
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        prompts = [np.array([1, 2, 3], np.int32),
                   np.array([9, 8, 7, 6], np.int32)]
        cb = ContinuousBatcher(p, cfg, n_slots=2)
        rids = [cb.submit(q, 8) for q in prompts]
        done = cb.run()
        for q, rid in zip(prompts, rids):
            gen = T.make_generate(cfg, max_new=8)
            ref = np.asarray(gen(p, q[None], jax.random.key(1)))[0]
            np.testing.assert_array_equal(done[rid], ref[len(q):])

    def test_speculative_rope(self):
        """Speculative verify (_verify_body rotates at pos+arange(C))
        stays exact under rope."""
        import jax

        cfg = self._cfg()
        p_t = T.init_params(jax.random.key(0), cfg)
        p_d = T.init_params(jax.random.key(3), cfg)
        prompt = np.array([[4, 5, 6]], np.int32)
        spec = T.make_speculative_generate(cfg, cfg, max_new=8, gamma=3)
        out, _ = spec(p_t, p_d, jax.numpy.asarray(prompt))
        gen = T.make_generate(cfg, max_new=8)
        ref = np.asarray(gen(p_t, jax.numpy.asarray(prompt),
                             jax.random.key(1)))
        np.testing.assert_array_equal(np.asarray(out), ref)


class TestLlamaFamily:
    """llama_config preset: RMSNorm + SwiGLU + no biases + untied head
    (+ rope). Structure-driven dispatch: rms ln params carry only a
    scale; bias params are absent entirely."""

    def _cfg(self, **kw):
        import jax.numpy as jnp

        base = dict(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                    d_ff=96, max_seq=48, dtype=jnp.float32, flash="off")
        base.update(kw)
        return T.llama_config(**base)

    def test_param_structure(self):
        import jax

        p = T.init_params(jax.random.key(0), self._cfg())
        assert "wpe" not in p and "lm_head" in p
        assert "bias" not in p["ln_f"]
        assert "fc_gate" in p["blocks"]
        assert not any(k.endswith("_b") for k in p["blocks"])

    def test_trains(self):
        import jax
        import jax.numpy as jnp

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        step = T.make_train_step(cfg)
        opt = T.adam_init(p)
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 64)
        first = None
        for i in range(8):
            p, opt, loss = step(p, opt, toks, jnp.roll(toks, -1, 1),
                                jnp.float32(1e-2), jax.random.key(i))
            first = first or float(loss)
        assert float(loss) < first

    def test_matches_manual_reference(self):
        """forward == hand-built rmsnorm/rope/swiglu/untied-head stack
        (pins every convention at once)."""
        import jax
        import jax.numpy as jnp

        cfg = self._cfg(n_layer=1)
        p = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (1, 8), 0, 64)
        S, D, H = 8, cfg.d_model, cfg.n_head
        hd = D // H
        out = T.forward(p, toks, cfg)

        def rms(x, scale):
            x = x.astype(jnp.float32)
            return x * jax.lax.rsqrt((x * x).mean(-1, keepdims=True)
                                     + 1e-5) * scale

        blk = jax.tree.map(lambda l: l[0], p["blocks"])
        x = p["wte"][toks].astype(jnp.float32)
        qkv = rms(x, blk["ln1"]["scale"]) @ blk["qkv"]
        q, k, v = T._unpack_qkv(qkv, cfg)
        q = q.reshape(1, S, H, hd).transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        ang = (jnp.arange(S, dtype=jnp.float32)[:, None]
               * cfg.rope_theta ** (-jnp.arange(0, hd, 2) / hd))

        def rot(t):
            t1, t2 = jnp.split(t, 2, -1)
            return jnp.concatenate(
                [t1 * jnp.cos(ang) - t2 * jnp.sin(ang),
                 t2 * jnp.cos(ang) + t1 * jnp.sin(ang)], -1)

        att = jnp.einsum("bhqd,bhkd->bhqk", rot(q), rot(k)) / np.sqrt(hd)
        att = jnp.where(jnp.tril(jnp.ones((S, S), bool)), att, -1e30)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(att, -1), v)
        x = x + ctx.transpose(0, 2, 1, 3).reshape(1, S, D) @ blk["proj"]
        h2 = rms(x, blk["ln2"]["scale"])
        m = jax.nn.silu(h2 @ blk["fc_gate"]) * (h2 @ blk["fc_in"])
        x = x + m @ blk["fc_out"]
        ref = rms(x, p["ln_f"]["scale"]) @ p["lm_head"].T
        assert_close(out, ref, tol=1e-4)

    @pytest.mark.parametrize("quant", [None, "int8"])
    def test_generate_matches_forward(self, quant):
        import jax
        import jax.numpy as jnp

        cfg = self._cfg(n_kv_head=2)
        p = T.init_params(jax.random.key(0), cfg)
        prompt = jax.random.randint(jax.random.key(1), (2, 5), 0, 64)
        gen = T.make_generate(cfg, max_new=8, quant=quant)
        out = np.asarray(gen(p, prompt, jax.random.key(2)))
        if quant:        # int8 weights: just check shape/dtype contract
            assert out.shape == (2, 13)
            return
        seq = prompt
        for _ in range(8):
            logits = T.forward(p, seq, cfg)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(out, np.asarray(seq))

    def test_speculative_and_batching(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        prompt = np.array([[4, 5, 6]], np.int32)
        spec = T.make_speculative_generate(cfg, cfg, max_new=6, gamma=3)
        out, _ = spec(p, T.init_params(jax.random.key(3), cfg),
                      jax.numpy.asarray(prompt))
        gen = T.make_generate(cfg, max_new=6)
        ref = np.asarray(gen(p, jax.numpy.asarray(prompt),
                             jax.random.key(1)))
        np.testing.assert_array_equal(np.asarray(out), ref)
        cb = ContinuousBatcher(p, cfg, n_slots=2)
        rid = cb.submit(np.array([1, 2, 3], np.int32), 6)
        done = cb.run()
        np.testing.assert_array_equal(
            done[rid],
            np.asarray(gen(p, np.array([[1, 2, 3]], np.int32),
                           jax.random.key(1)))[0][3:])

    def test_pipeline_requires_tied_head(self):
        import pytest as _pytest

        from neuronika_tpu import parallel
        if jax.device_count() < 2:
            _pytest.skip("needs multi-device mesh")
        mesh = parallel.make_mesh([("pp", 2)], devices=jax.devices()[:2])
        with _pytest.raises(ValueError, match="tied_head"):
            T.make_pipelined_train_step(mesh, self._cfg(), 2)
        with _pytest.raises(ValueError, match="tied_head"):
            T.make_pipelined_train_step_1f1b(mesh, self._cfg(), 2)

    def test_moe_biasless(self):
        """bias=False composes with MoE (gelu experts; swiglu is
        dense-only and raises)."""
        import jax
        import jax.numpy as jnp

        with pytest.raises(ValueError, match="swiglu"):
            T.init_params(jax.random.key(0), self._cfg(n_experts=2))
        cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                          d_ff=96, max_seq=48, dtype=jnp.float32,
                          flash="off", bias=False, n_experts=2,
                          moe_impl="sparse")
        p = T.init_params(jax.random.key(0), cfg)
        assert not any(k.endswith("_b") for k in p["blocks"])
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 64)
        loss = T.loss_fn(p, toks, jnp.roll(toks, -1, 1), cfg)
        assert np.isfinite(float(loss))


class TestSlidingWindow:
    """cfg.window > 0 (Mistral): every inference path must agree with the
    training forward, and the training forward must actually mask."""

    def _cfg(self, **kw):
        base = dict(vocab_size=24, n_layer=2, n_head=2, d_model=32,
                    d_ff=64, max_seq=12, dtype=jnp.float32, window=3)
        base.update(kw)
        return T.GPTConfig(**base)

    def test_window_changes_logits(self):
        cfg = self._cfg()
        full = self._cfg(window=0)
        params = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, 24)
        a = T.forward(params, toks, cfg)
        b = T.forward(params, toks, full)
        # positions < window see everything -> identical; later ones differ
        assert_close(a[:, :3], b[:, :3], tol=1e-5)
        assert float(jnp.abs(a[:, 4:] - b[:, 4:]).max()) > 1e-4

    def test_wide_window_equals_full_causal(self):
        cfg = self._cfg(window=999)
        full = self._cfg(window=0)
        params = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, 24)
        assert_close(T.forward(params, toks, cfg),
                     T.forward(params, toks, full), tol=1e-6)

    def test_decode_matches_full_forward(self):
        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, 24)
        full = T.forward(params, toks, cfg)
        decode = T.make_decode_step(cfg)
        cache = T.init_kv_cache(cfg, 2)
        for t in range(8):
            logits, cache = decode(params, cache, toks[:, t])
            assert_close(logits, full[:, t], tol=1e-4)

    def test_prefill_matches_full_forward(self):
        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, 24)
        full = T.forward(params, toks, cfg)
        cache = T.init_kv_cache(cfg, 2)
        logits, cache = T.make_prefill(cfg)(params, cache, toks)
        assert_close(logits, full[:, -1], tol=1e-4)

    def test_verify_body_matches_decode(self):
        """Speculative-verify chunked pass honours the window."""
        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (1, 8), 0, 24)
        full = T.forward(params, toks, cfg)
        cache = T.init_kv_cache(cfg, 1)
        logits, _ = T._verify_body(params, cache, toks, cfg)
        assert_close(logits[0], full[0], tol=1e-4)

    def test_mistral_preset(self):
        cfg = T.mistral_config(vocab_size=64, n_layer=1, n_head=2,
                               d_model=32, d_ff=96, max_seq=16,
                               dtype=jnp.float32)
        assert cfg.window == 4096 and cfg.norm == "rms"
        assert cfg.mlp == "swiglu" and not cfg.bias
        p = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 64)
        loss = T.loss_fn(p, toks, jnp.roll(toks, -1, 1), cfg)
        assert np.isfinite(float(loss))


class TestLoRA:
    """Low-rank adapters: merge-on-the-fly over the stacked block
    leaves; the base tree stays frozen during fine-tuning."""

    def _setup(self, **kw):
        from neuronika_tpu.models import lora as LR

        base = dict(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                    d_ff=64, max_seq=16, dtype=jnp.float32)
        base.update(kw)
        cfg = T.GPTConfig(**base)
        params = T.init_params(jax.random.key(0), cfg)
        ad = LR.lora_init(jax.random.key(1), params, rank=4)
        return LR, cfg, params, ad

    def test_init_is_identity(self):
        LR, cfg, params, ad = self._setup()
        toks = jax.random.randint(jax.random.key(2), (2, 16), 0, 32)
        a = T.forward(LR.lora_apply(params, ad), toks, cfg)
        b = T.forward(params, toks, cfg)
        assert_close(a, b, tol=1e-6)

    def test_train_step_moves_only_adapters(self):
        LR, cfg, params, ad = self._setup()
        step = LR.make_lora_train_step(cfg)
        opt = T.adam_init(ad)
        toks = jax.random.randint(jax.random.key(2), (4, 16), 0, 32)
        tgts = jnp.roll(toks, -1, axis=1)
        frozen = jax.tree.map(jnp.copy, params)
        losses = []
        for i in range(8):
            ad, opt, loss = step(params, ad, opt, toks, tgts,
                                 jnp.float32(1e-2), jax.random.key(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # base weights untouched
        same = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), params, frozen)
        assert max(jax.tree.leaves(same)) == 0.0
        # adapters moved
        assert float(jnp.abs(ad["qkv"]["B"]).max()) > 0.0

    def test_merge_equals_apply(self):
        LR, cfg, params, ad = self._setup()
        # give B nonzero content
        ad = jax.tree.map(
            lambda x: x + 0.01 * jax.random.normal(
                jax.random.key(9), x.shape), ad)
        toks = jax.random.randint(jax.random.key(2), (2, 16), 0, 32)
        merged = LR.lora_merge(params, ad)
        assert "A" not in str(jax.tree_util.tree_structure(merged))
        a = T.forward(merged, toks, cfg)
        b = T.forward(LR.lora_apply(params, ad), toks, cfg)
        assert_close(a, b, tol=1e-6)

    def test_param_count_and_bad_target(self):
        LR, cfg, params, ad = self._setup()
        # rank 4, qkv (2,32,96) + proj (2,32,32): 2*(32*4+4*96)+2*(32*4+4*32)
        expect = 2 * (32 * 4 + 4 * 96) + 2 * (32 * 4 + 4 * 32)
        assert LR.lora_param_count(ad) == expect
        with pytest.raises(ValueError, match="unknown LoRA target"):
            LR.lora_init(jax.random.key(0), params, 4, targets=("nope",))

    def test_llama_family_targets(self):
        LR, cfg, params, ad = self._setup()
        from neuronika_tpu.models import lora as _  # noqa: F401

        cfg = T.llama_config(vocab_size=32, n_layer=2, n_head=4,
                             n_kv_head=2, d_model=32, d_ff=96,
                             max_seq=16, dtype=jnp.float32)
        params = T.init_params(jax.random.key(0), cfg)
        ad = LR.lora_init(jax.random.key(1), params, 2,
                          targets=("qkv", "proj", "fc_gate"))
        step = LR.make_lora_train_step(cfg)
        toks = jax.random.randint(jax.random.key(2), (2, 16), 0, 32)
        ad, _, loss = step(params, ad, T.adam_init(ad), toks,
                           jnp.roll(toks, -1, 1), jnp.float32(1e-3),
                           jax.random.key(3))
        assert np.isfinite(float(loss))


class TestQLoRA:
    """QLoRA: adapters over an int4-quantized frozen base. The
    persistent state is int4 base + f32 adapters + adapter Adam
    moments; the forward is the plain forward over the dequantized
    merged tree."""

    def _setup(self):
        from neuronika_tpu.models import lora as LR

        cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                          d_ff=64, max_seq=16, dtype=jnp.float32)
        params = T.init_params(jax.random.key(0), cfg)
        qbase = LR.qlora_quantize_base(params)
        ad = LR.lora_init(jax.random.key(1), params, rank=4)
        return LR, cfg, params, qbase, ad

    def test_base_is_int4_and_smaller(self):
        LR, cfg, params, qbase, ad = self._setup()
        q = qbase["blocks"]["qkv"]
        assert set(q) == {"q4p", "s4"} and q["q4p"].dtype == jnp.int8
        f32_bytes = params["blocks"]["qkv"].size * 4
        q_bytes = q["q4p"].size + q["s4"].size * 4
        assert q_bytes < f32_bytes / 6     # ~4.25 bits/weight
        # embeddings / norms stay full precision
        assert qbase["wte"].dtype == jnp.float32

    def test_zero_adapters_match_dequantized_base(self):
        LR, cfg, params, qbase, ad = self._setup()
        toks = jax.random.randint(jax.random.key(2), (2, 16), 0, 32)
        a = T.forward(LR.qlora_apply(qbase, ad, dtype=jnp.float32),
                      toks, cfg)
        b = T.forward(params, toks, cfg)
        # int4 is the only error source (B=0 -> adapters are identity)
        rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
        assert rel < 0.15, rel

    def test_train_step_moves_only_adapters(self):
        LR, cfg, params, qbase, ad = self._setup()
        step = LR.make_qlora_train_step(cfg)
        opt = T.adam_init(ad)
        toks = jax.random.randint(jax.random.key(2), (4, 16), 0, 32)
        tgts = jnp.roll(toks, -1, axis=1)
        frozen = jax.tree.map(jnp.copy, qbase)
        losses = []
        for i in range(8):
            ad, opt, loss = step(qbase, ad, opt, toks, tgts,
                                 jnp.float32(1e-2), jax.random.key(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        same = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), qbase, frozen)
        assert max(jax.tree.leaves(same)) == 0.0
        assert float(jnp.abs(ad["qkv"]["B"]).max()) > 0.0

    def test_merge_exports_plain_tree(self):
        LR, cfg, params, qbase, ad = self._setup()
        ad = jax.tree.map(
            lambda x: x + 0.01 * jax.random.normal(
                jax.random.key(9), x.shape), ad)
        toks = jax.random.randint(jax.random.key(2), (2, 16), 0, 32)
        merged = LR.qlora_merge(qbase, ad, dtype=jnp.float32)
        assert not isinstance(merged["blocks"]["qkv"], dict)
        a = T.forward(merged, toks, cfg)
        b = T.forward(LR.qlora_apply(qbase, ad, dtype=jnp.float32),
                      toks, cfg)
        assert_close(a, b, tol=1e-6)


class TestBertEncoder:
    """causal=False: the GPT body becomes a bidirectional encoder
    (models/bert.py) with MLM pre-training and classification tiers."""

    def _cfg(self, **kw):
        from neuronika_tpu.models import bert as B

        base = dict(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                    d_ff=64, max_seq=16, dtype=jnp.float32)
        base.update(kw)
        return B.bert_config(**base)

    def test_position_zero_sees_future(self):
        from neuronika_tpu.models import bert as B

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
        toks2 = toks.at[:, -1].set((toks[:, -1] + 1) % 32)
        h = B.encode(p, toks, cfg)
        h2 = B.encode(p, toks2, cfg)
        assert float(jnp.abs(h[:, 0] - h2[:, 0]).max()) > 1e-6

    def test_flash_bidirectional_matches_composite(self):
        from neuronika_tpu.config import config
        from neuronika_tpu.models import bert as B

        cfg_f = self._cfg(max_seq=128, flash="on", flash_block=64)
        cfg_c = self._cfg(max_seq=128, flash="off")
        p = T.init_params(jax.random.key(0), cfg_f)
        toks = jax.random.randint(jax.random.key(1), (2, 128), 0, 32)
        config.pallas_interpret = True
        try:
            a = B.encode(p, toks, cfg_f)
        finally:
            config.pallas_interpret = False
        b = B.encode(p, toks, cfg_c)
        assert_close(a, b, tol=1e-4)

    def test_mask_tokens_contract(self):
        from neuronika_tpu.models import bert as B

        toks = jax.random.randint(jax.random.key(0), (64, 64), 0, 100)
        corrupted, labels, w = B.mask_tokens(
            jax.random.key(1), toks, mask_id=99, vocab_size=100, rate=0.15)
        assert (labels == toks).all()          # labels are the originals
        frac = float(w.mean())
        assert 0.10 < frac < 0.20              # ~15% selected
        sel = w.astype(bool)
        masked = float((jnp.asarray(corrupted)[sel] == 99).mean())
        assert 0.7 < masked < 0.9              # ~80% become [MASK]
        assert (jnp.asarray(corrupted)[~sel] == jnp.asarray(toks)[~sel]).all()

    def test_mlm_training_converges(self):
        from neuronika_tpu.models import bert as B

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (8, 16), 0, 32)
        step = B.make_mlm_train_step(cfg)
        opt = T.adam_init(p)
        losses = []
        # fixed key -> fixed mask: deterministic optimisation target
        for _ in range(10):
            p, opt, loss = step(p, opt, toks, jnp.float32(5e-3),
                                jax.random.key(7))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)

    def test_classifier_converges(self):
        from neuronika_tpu.models import bert as B

        cfg = self._cfg()
        p = T.init_params(jax.random.key(0), cfg)
        toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
        labels = jnp.array([0, 1, 2, 1])
        head = B.init_classifier(jax.random.key(2), cfg, 3)
        step = B.make_classifier_train_step(cfg, 3)
        opt = T.adam_init((p, head))
        losses = []
        for i in range(10):
            p, head, opt, l = step(p, head, opt, toks, labels,
                                   jnp.float32(1e-2), jax.random.key(i))
            losses.append(float(l))
        assert losses[-1] < 0.5 * losses[0]

    def test_decoding_guard(self):
        cfg = self._cfg()
        with pytest.raises(ValueError, match="bidirectional encoder"):
            T.make_decode_step(cfg)
        with pytest.raises(ValueError, match="bidirectional encoder"):
            T.make_generate(cfg, max_new=4)

    def test_pool_modes(self):
        from neuronika_tpu.models import bert as B

        h = jax.random.normal(jax.random.key(0), (2, 5, 8))
        assert B.pool(h, "mean").shape == (2, 8)
        assert (B.pool(h, "cls") == h[:, 0]).all()
        with pytest.raises(ValueError):
            B.pool(h, "max")


class TestEvaluate:
    def _setup(self):
        cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                          d_ff=64, max_seq=16, dtype=jnp.float32)
        params = T.init_params(jax.random.key(0), cfg)
        return cfg, params

    def test_matches_loss_fn(self):
        cfg, params = self._setup()
        toks = jax.random.randint(jax.random.key(1), (4, 16), 0, 32)
        tgts = jnp.roll(toks, -1, axis=1)
        out = T.evaluate(params, cfg, [(toks, tgts)])
        ref = float(T.loss_fn(params, toks, tgts, cfg))
        assert abs(out["loss"] - ref) < 1e-5
        assert abs(out["perplexity"] - np.exp(ref)) < 1e-2
        assert out["tokens"] == 64

    def test_pad_positions_excluded(self):
        cfg, params = self._setup()
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 31)
        tgts = jnp.roll(toks, -1, axis=1).at[:, 8:].set(31)  # pad tail
        out = T.evaluate(params, cfg, [(toks, tgts)], pad_id=31)
        assert out["tokens"] == 16
        # unpadded reference over the first 8 target positions
        step = T.make_eval_step(cfg)
        s_all, _ = step(params, toks, jnp.roll(toks, -1, axis=1))
        # padded total must differ from full total (tail dropped)
        assert abs(out["loss"] * 16 - float(s_all)) > 1e-3

    def test_multi_batch_accumulation(self):
        cfg, params = self._setup()
        t1 = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
        t2 = jax.random.randint(jax.random.key(2), (2, 16), 0, 32)
        batches = [(t1, jnp.roll(t1, -1, 1)), (t2, jnp.roll(t2, -1, 1))]
        out = T.evaluate(params, cfg, batches)
        l1 = float(T.loss_fn(params, t1, jnp.roll(t1, -1, 1), cfg))
        l2 = float(T.loss_fn(params, t2, jnp.roll(t2, -1, 1), cfg))
        assert abs(out["loss"] - (l1 + l2) / 2) < 1e-5

    def test_empty_raises(self):
        cfg, params = self._setup()
        with pytest.raises(ValueError, match="no tokens"):
            T.evaluate(params, cfg, [])


class TestSeq2Seq:
    """Encoder-decoder with cross-attention (models/t5.py)."""

    def _cfg(self):
        from neuronika_tpu.models import t5

        return t5.Seq2SeqConfig(vocab_size=40, n_layer=2, n_head=2,
                                d_model=32, d_ff=64, max_src=16,
                                max_tgt=16, dtype=jnp.float32)

    def test_shapes_and_memory_reuse(self):
        from neuronika_tpu.models import t5

        cfg = self._cfg()
        p = t5.init_params(jax.random.key(0), cfg)
        src = jax.random.randint(jax.random.key(1), (2, 8), 0, 40)
        tgt = jax.random.randint(jax.random.key(2), (2, 6), 0, 40)
        logits = t5.forward(p, src, tgt, cfg)
        assert logits.shape == (2, 6, 40)
        mem = t5.encode(p, src, cfg)
        assert_close(t5.forward(p, None, tgt, cfg, memory=mem), logits,
                     tol=1e-6)

    def test_cross_attention_reads_source(self):
        from neuronika_tpu.models import t5

        cfg = self._cfg()
        p = t5.init_params(jax.random.key(0), cfg)
        src = jax.random.randint(jax.random.key(1), (2, 8), 0, 40)
        tgt = jax.random.randint(jax.random.key(2), (2, 6), 0, 40)
        a = t5.forward(p, src, tgt, cfg)
        src2 = src.at[:, 0].set((src[:, 0] + 1) % 40)
        b = t5.forward(p, src2, tgt, cfg)
        assert float(jnp.abs(a - b).max()) > 1e-6

    def test_decoder_is_causal(self):
        from neuronika_tpu.models import t5

        cfg = self._cfg()
        p = t5.init_params(jax.random.key(0), cfg)
        src = jax.random.randint(jax.random.key(1), (1, 8), 0, 40)
        tgt = jax.random.randint(jax.random.key(2), (1, 6), 0, 40)
        a = t5.forward(p, src, tgt, cfg)
        tgt2 = tgt.at[:, -1].set((tgt[:, -1] + 1) % 40)
        b = t5.forward(p, src, tgt2, cfg)
        assert_close(a[:, :-1], b[:, :-1], tol=1e-6)
        assert float(jnp.abs(a[:, -1] - b[:, -1]).max()) > 1e-6

    def test_learns_reversal_and_generates(self):
        from neuronika_tpu.models import t5

        cfg = self._cfg()
        p = t5.init_params(jax.random.key(0), cfg)
        BOS, EOS = 38, 39
        rng = np.random.default_rng(0)

        def batch(n=16):
            src = rng.integers(0, 38, (n, 8)).astype(np.int32)
            tgt = src[:, ::-1]
            ti = np.concatenate([np.full((n, 1), BOS, np.int32), tgt], 1)
            to = np.concatenate([tgt, np.full((n, 1), EOS, np.int32)], 1)
            return jnp.asarray(src), jnp.asarray(ti), jnp.asarray(to)

        step = t5.make_train_step(cfg, grad_clip=1.0)
        opt = T.adam_init(p)
        for i in range(250):
            src, ti, to = batch()
            p, opt, loss = step(p, opt, src, ti, to, jnp.float32(3e-3),
                                jax.random.key(i))
        assert float(loss) < 0.5

        src, _, _ = batch(4)
        out = t5.greedy_generate(p, src, cfg, bos_id=BOS, eos_id=EOS,
                                 max_new=10)
        acc = (out[:, 1:9] == np.asarray(src)[:, ::-1]).mean()
        assert acc > 0.9
        assert (out[:, 9] == EOS).all()

    def test_pad_id_excluded_from_loss(self):
        from neuronika_tpu.models import t5

        cfg = self._cfg()
        p = t5.init_params(jax.random.key(0), cfg)
        src = jax.random.randint(jax.random.key(1), (2, 8), 0, 40)
        ti = jax.random.randint(jax.random.key(2), (2, 6), 0, 38)
        to = jnp.roll(ti, -1, 1).at[:, 3:].set(37)
        l_pad = float(t5.loss_fn(p, src, ti, to, cfg, pad_id=37))
        l_all = float(t5.loss_fn(p, src, ti, to, cfg))
        assert abs(l_pad - l_all) > 1e-6

    def test_flash_path_matches_composite(self):
        """cfg.flash="on": decoder self-attention runs the causal flash
        kernel and CROSS-attention the non-causal kernel with Sq != Skv;
        both must match the composite oracle."""
        from neuronika_tpu.config import config
        from neuronika_tpu.models import t5

        base = dict(vocab_size=40, n_layer=2, n_head=2, d_model=32,
                    d_ff=64, max_src=64, max_tgt=32, dtype=jnp.float32,
                    flash_block=16)
        cfg_f = t5.Seq2SeqConfig(**base, flash="on")
        cfg_c = t5.Seq2SeqConfig(**base, flash="off")
        p = t5.init_params(jax.random.key(0), cfg_f)
        src = jax.random.randint(jax.random.key(1), (2, 64), 0, 40)
        tgt = jax.random.randint(jax.random.key(2), (2, 32), 0, 40)
        config.pallas_interpret = True
        try:
            a = t5.forward(p, src, tgt, cfg_f)
        finally:
            config.pallas_interpret = False
        b = t5.forward(p, src, tgt, cfg_c)
        assert_close(a, b, tol=2e-4)

    def test_decoder_dropout_active_in_training(self):
        """Seq2SeqConfig.dropout regularises the DECODER too: train-mode
        forwards differ across keys, eval-mode forwards are
        deterministic."""
        from neuronika_tpu.models import t5

        cfg = t5.Seq2SeqConfig(vocab_size=40, n_layer=1, n_head=2,
                               d_model=32, d_ff=64, max_src=8,
                               max_tgt=8, dtype=jnp.float32, dropout=0.5)
        p = t5.init_params(jax.random.key(0), cfg)
        src = jax.random.randint(jax.random.key(1), (1, 8), 0, 40)
        tgt = jax.random.randint(jax.random.key(2), (1, 8), 0, 40)
        mem = t5.encode(p, src, cfg)  # isolate the decoder
        a = t5.forward(p, None, tgt, cfg, memory=mem, train=True,
                       key=jax.random.key(3))
        b = t5.forward(p, None, tgt, cfg, memory=mem, train=True,
                       key=jax.random.key(4))
        c = t5.forward(p, None, tgt, cfg, memory=mem)
        d = t5.forward(p, None, tgt, cfg, memory=mem)
        assert float(jnp.abs(a - b).max()) > 1e-4   # dropout varies
        assert_close(c, d, tol=0)                   # eval deterministic


class TestMultiLoRAServing:
    """S-LoRA-style multi-adapter serving: requests with DIFFERENT LoRA
    adapters co-batch in one jitted decode step via a stacked adapter
    tree + per-slot selector (adapter 0 = base model)."""

    def _setup(self):
        from neuronika_tpu.models import lora as LR

        cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                          d_ff=128, max_seq=48, dtype=jnp.float32,
                          flash="off")
        params = T.init_params(jax.random.key(0), cfg)

        def mk_adapter(key, rank, targets):
            ad = LR.lora_init(key, params, rank, targets=targets)
            # nonzero B so the adapter actually changes the model
            return jax.tree.map(
                lambda x: x + 0.05 * jax.random.normal(
                    jax.random.fold_in(key, 7), x.shape), ad)

        # heterogeneous ranks AND target sets (exercises zero-padding)
        ad1 = mk_adapter(jax.random.key(1), 2, ("qkv", "proj"))
        ad2 = mk_adapter(jax.random.key(2), 4, ("qkv", "fc_in", "fc_out"))
        return LR, cfg, params, ad1, ad2

    def test_adapter_zero_is_base(self):
        """Requests with adapter=0 through a batcher that HAS adapters
        registered emit exactly the base model's tokens."""
        from neuronika_tpu.serving import ContinuousBatcher

        LR, cfg, params, ad1, ad2 = self._setup()
        p = np.array([3, 4, 5, 6], np.int32)
        cb = ContinuousBatcher(params, cfg, n_slots=2)
        cb.register_adapter(ad1)
        rid = cb.submit(p, max_new=8)          # adapter defaults to 0
        out = cb.run()
        gen = T.make_generate(cfg, max_new=8)
        ref = np.asarray(gen(params, p[None], jax.random.key(1)))[0]
        np.testing.assert_array_equal(out[rid], ref[len(p):])

    def test_mixed_batch_matches_merged_models(self):
        """Three co-batched requests — adapter 1, adapter 2, base —
        each match a one-shot generate on the correspondingly MERGED
        weights (merge-at-serve == low-rank correction at use sites)."""
        from neuronika_tpu.serving import ContinuousBatcher

        LR, cfg, params, ad1, ad2 = self._setup()
        prompts = [np.array([1, 2, 3, 4], np.int32),
                   np.array([7, 8, 9], np.int32),
                   np.array([20, 21], np.int32)]
        cb = ContinuousBatcher(params, cfg, n_slots=3)
        a1 = cb.register_adapter(ad1)
        a2 = cb.register_adapter(ad2)
        assert (a1, a2) == (1, 2)
        rids = [cb.submit(prompts[0], 8, adapter=a1),
                cb.submit(prompts[1], 8, adapter=a2),
                cb.submit(prompts[2], 8, adapter=0)]
        out = cb.run()
        for p, rid, ad in zip(prompts, rids, [ad1, ad2, None]):
            ref_p = params if ad is None else LR.lora_merge(params, ad)
            gen = T.make_generate(cfg, max_new=8)
            ref = np.asarray(gen(ref_p, p[None], jax.random.key(1)))[0]
            np.testing.assert_array_equal(out[rid], ref[len(p):])

    def test_paged_matches_dense(self):
        """The paged batcher with per-request adapters is byte-identical
        to the dense-slot batcher with the same adapters."""
        from neuronika_tpu.serving import ContinuousBatcher, PagedBatcher

        LR, cfg, params, ad1, ad2 = self._setup()
        prompts = [np.array([1, 2, 3, 4, 5], np.int32),
                   np.array([9, 10, 11], np.int32)]

        dense = ContinuousBatcher(params, cfg, n_slots=2)
        dense.register_adapter(ad1)
        dense.register_adapter(ad2)
        r0 = [dense.submit(prompts[0], 8, adapter=1),
              dense.submit(prompts[1], 8, adapter=2)]
        ref = dense.run()

        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=16,
                          block_size=8)
        pb.register_adapter(ad1)
        pb.register_adapter(ad2)
        r1 = [pb.submit(prompts[0], 8, adapter=1),
              pb.submit(prompts[1], 8, adapter=2)]
        out = pb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(ref[a], out[b])

    def test_adapter_requests_skip_prefix_cache(self):
        """A registered prompt prefix must NOT be reused by adapter
        requests: the prefix K/V was computed under the base model, so
        adapter requests take the full-prefill path (and still produce
        the merged model's output)."""
        from neuronika_tpu.serving import ContinuousBatcher

        LR, cfg, params, ad1, ad2 = self._setup()
        system = np.array([5, 6, 7, 8], np.int32)
        p = np.concatenate([system, [1, 2]]).astype(np.int32)
        cb = ContinuousBatcher(params, cfg, n_slots=1)
        cb.register_prefix(system)
        cb.register_adapter(ad1)
        rid = cb.submit(p, 6, adapter=1)
        out = cb.run()
        gen = T.make_generate(cfg, max_new=6)
        ref = np.asarray(gen(LR.lora_merge(params, ad1), p[None],
                             jax.random.key(1)))[0]
        np.testing.assert_array_equal(out[rid], ref[len(p):])

    def test_bad_adapter_id_and_shapes(self):
        from neuronika_tpu.serving import ContinuousBatcher

        LR, cfg, params, ad1, ad2 = self._setup()
        cb = ContinuousBatcher(params, cfg, n_slots=1)
        with pytest.raises(ValueError, match="not registered"):
            cb.submit(np.array([1, 2], np.int32), 4, adapter=1)
        with pytest.raises(ValueError, match="want A"):
            cb.register_adapter(
                {"qkv": {"A": np.zeros((2, 64, 4), np.float32),
                         "B": np.zeros((2, 8, 64), np.float32)}})


class TestChunkedPrefill:
    """SARATHI-style chunked prefill: long prompts prefill in fixed
    chunks interleaved with decode steps, bounding the stall a new
    admission imposes on co-running requests. Outputs must be
    token-identical to the one-shot prefill."""

    def _cfg(self, **kw):
        base = dict(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                    d_ff=128, max_seq=48, dtype=jnp.float32, flash="off")
        base.update(kw)
        return T.GPTConfig(**base)

    def _prompts(self):
        rng = np.random.default_rng(3)
        return [rng.integers(1, 60, n).astype(np.int32)
                for n in (20, 17, 3)]          # 17: odd → overlap chunk

    @pytest.mark.parametrize("quant", [None, "int4"])
    def test_dense_matches_one_shot(self, quant):
        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts = self._prompts()
        plain = ContinuousBatcher(params, cfg, n_slots=2, quant=quant)
        r0 = [plain.submit(p, 8) for p in prompts]
        ref = plain.run()
        cb = ContinuousBatcher(params, cfg, n_slots=2, quant=quant,
                               prefill_chunk=8)
        r1 = [cb.submit(p, 8) for p in prompts]
        out = cb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(ref[a], out[b])

    def test_paged_matches_one_shot(self):
        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts = self._prompts()
        plain = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                             block_size=8)
        r0 = [plain.submit(p, 8) for p in prompts]
        ref = plain.run()
        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                          block_size=8, prefill_chunk=8)
        r1 = [pb.submit(p, 8) for p in prompts]
        out = pb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(ref[a], out[b])

    def test_decode_progress_during_chunked_prefill(self):
        """The whole point: while a long prompt prefills chunk by
        chunk, an already-running request keeps emitting tokens."""
        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        cb = ContinuousBatcher(params, cfg, n_slots=2, prefill_chunk=4)
        short = cb.submit(np.array([1, 2, 3], np.int32), 30)
        long_r = cb.submit(np.arange(1, 25, dtype=np.int32), 8)
        req_s = cb._running[0]
        assert cb._prefilling           # long one is mid-prefill
        before = len(req_s.tokens)
        while cb._prefilling:
            cb.step()
        # the short request decoded on every step of the long prefill
        assert len(req_s.tokens) > before
        out = cb.run()
        gen = T.make_generate(cfg, max_new=30)
        ref = np.asarray(gen(params, np.array([[1, 2, 3]], np.int32),
                             jax.random.key(1)))[0]
        np.testing.assert_array_equal(out[short], ref[3:])
        assert long_r in out

    def test_chunked_with_adapter(self):
        from neuronika_tpu.models import lora as LR
        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        ad = LR.lora_init(jax.random.key(1), params, 2)
        ad = jax.tree.map(lambda x: x + 0.05 * jax.random.normal(
            jax.random.key(7), x.shape), ad)
        p = np.arange(2, 22, dtype=np.int32)
        cb = ContinuousBatcher(params, cfg, n_slots=1, prefill_chunk=8)
        cb.register_adapter(ad)
        rid = cb.submit(p, 6, adapter=1)
        out = cb.run()
        gen = T.make_generate(cfg, max_new=6)
        ref = np.asarray(gen(LR.lora_merge(params, ad), p[None],
                             jax.random.key(1)))[0]
        np.testing.assert_array_equal(out[rid], ref[len(p):])

    def test_prefix_hit_stays_one_shot(self):
        """A prefix-cache hit prefills only the (short) suffix, so it
        is never chunked; a long non-matching prompt in the same
        batcher is. Outputs match the unchunked batcher either way."""
        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        system = np.arange(1, 13, dtype=np.int32)
        p_hit = np.concatenate([system, [30, 31]]).astype(np.int32)
        p_miss = np.arange(40, 60, dtype=np.int32)
        plain = ContinuousBatcher(params, cfg, n_slots=2)
        r0 = [plain.submit(p_hit, 6), plain.submit(p_miss, 6)]
        ref = plain.run()
        cb = ContinuousBatcher(params, cfg, n_slots=2, prefill_chunk=8)
        cb.register_prefix(system)
        assert not cb._should_chunk(
            __import__("neuronika_tpu.serving", fromlist=["_Request"]
                       )._Request(0, p_hit[None], 6))
        r1 = [cb.submit(p_hit, 6), cb.submit(p_miss, 6)]
        out = cb.run()
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(ref[a], out[b])

    def test_paged_preemption_of_chunked(self):
        """Preempting a request mid-chunked-prefill drops its chunk
        progress with its blocks; on resume it re-chunks and emits the
        same tokens."""
        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        p1 = np.arange(1, 17, dtype=np.int32)     # 2 blocks @ BS=8
        p2 = np.arange(20, 40, dtype=np.int32)    # 3 blocks
        plain = PagedBatcher(params, cfg, n_slots=2, n_blocks=32,
                             block_size=8)
        r0 = [plain.submit(p1, 12), plain.submit(p2, 12)]
        ref = plain.run()
        # tight pool: p1 decodes past a block boundary and must steal
        # p2's blocks while p2 may still be prefilling
        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=7,
                          block_size=8, prefill_chunk=8)
        r1 = [pb.submit(p1, 12), pb.submit(p2, 12)]
        out = pb.run()
        assert pb.preemptions >= 1
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(ref[a], out[b])


class TestServingUX:
    """Per-request stop sequences, streaming token callbacks, and the
    batcher's latency/throughput metrics."""

    def _setup(self):
        cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                          d_ff=128, max_seq=48, dtype=jnp.float32,
                          flash="off")
        params = T.init_params(jax.random.key(0), cfg)
        return cfg, params

    def test_stop_sequence_trims(self):
        """Generation ends at the first suffix match of any stop
        sequence and the match is trimmed — checked against a host-side
        replay of the same sampled reference tokens."""
        from neuronika_tpu.serving import ContinuousBatcher

        cfg, params = self._setup()
        p = np.array([3, 4, 5], np.int32)
        sample = dict(temperature=1.0, seed=7)    # varied, reproducible
        ref_cb = ContinuousBatcher(params, cfg, n_slots=1)
        rid = ref_cb.submit(p, 10, **sample)
        ref = ref_cb.run()[rid].tolist()
        stop = [ref[2:4], ref[6:9]]

        def host_expect(tokens, stops):
            out = []
            for t in tokens:
                out.append(t)
                for s in stops:
                    if len(out) >= len(s) and out[-len(s):] == s:
                        return out[:-len(s)]
            return out

        expect = host_expect(ref, stop)
        assert len(expect) < len(ref)            # a stop actually fired
        cb = ContinuousBatcher(params, cfg, n_slots=1)
        rid2 = cb.submit(p, 10, stop=stop, **sample)
        out = cb.run()[rid2]
        np.testing.assert_array_equal(out, np.asarray(expect, np.int32))

    def test_on_token_streams_everything(self):
        from neuronika_tpu.serving import ContinuousBatcher

        cfg, params = self._setup()
        got = []
        cb = ContinuousBatcher(params, cfg, n_slots=2)
        r1 = cb.submit(np.array([3, 4, 5], np.int32), 7,
                       on_token=lambda rid, t: got.append((rid, t)))
        r2 = cb.submit(np.array([9, 8], np.int32), 5)
        out = cb.run()
        streamed = [t for rid, t in got if rid == r1]
        np.testing.assert_array_equal(np.asarray(streamed), out[r1])
        assert not any(rid == r2 for rid, _ in got)

    def test_metrics_accumulate(self):
        from neuronika_tpu.serving import PagedBatcher

        cfg, params = self._setup()
        pb = PagedBatcher(params, cfg, n_slots=2, n_blocks=16,
                          block_size=8)
        pb.submit(np.array([3, 4, 5], np.int32), 6)
        pb.submit(np.arange(1, 10, dtype=np.int32), 4)
        pb.run()
        m = pb.metrics
        assert m["completed"] == 2
        assert m["tokens_out"] == 10
        assert m["ttft_mean_s"] > 0.0
        assert m["itl_mean_s"] > 0.0


class TestMultiStepDecode:
    """step_many / run(multi_step=k): k decode+sample steps in ONE device
    program must emit exactly the per-step path's tokens — per-request
    seeded sampling makes the window size unobservable (overshoot past
    eos/stop is discarded; the window caps at the tightest budget)."""

    def _cfg(self, **kw):
        import jax.numpy as jnp

        base = dict(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                    d_ff=128, max_seq=48, dtype=jnp.float32, flash="off")
        base.update(kw)
        return T.GPTConfig(**base)

    def _submit_mixed(self, cb, eos_tok=None):
        import numpy as np

        prompts = [np.array([1, 2, 3, 4], np.int32),
                   np.array([7, 8], np.int32),
                   np.array([9, 10, 11, 12, 13, 14, 15, 16], np.int32),
                   np.array([20, 21, 22], np.int32)]
        max_news = [10, 4, 7, 12]
        kws = [dict(), dict(temperature=0.9, top_k=8, seed=3),
               dict(temperature=1.2, top_p=0.8, seed=5),
               dict(stop=[[eos_tok]] if eos_tok is not None else None)]
        return [cb.submit(p, m, **kw)
                for p, m, kw in zip(prompts, max_news, kws)]

    def test_dense_matches_per_step(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        a = ContinuousBatcher(params, cfg, n_slots=3)
        ra = self._submit_mixed(a)
        ref = a.run()
        b = ContinuousBatcher(params, cfg, n_slots=3)
        rb = self._submit_mixed(b)
        out = b.run(multi_step=4)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])

    def test_dense_stop_and_eos_overshoot_discarded(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        # find the greedy first token; use it as a stop so the request
        # finishes mid-window
        gen = T.make_generate(cfg, max_new=2)
        p = np.array([5, 6, 7], np.int32)
        first = int(np.asarray(gen(params, p[None], jax.random.key(1))
                               )[0, len(p)])
        a = ContinuousBatcher(params, cfg, n_slots=2, eos_id=first)
        ra = [a.submit(p, 20), a.submit(np.array([30, 31], np.int32), 9)]
        ref = a.run()
        b = ContinuousBatcher(params, cfg, n_slots=2, eos_id=first)
        rb = [b.submit(p, 20), b.submit(np.array([30, 31], np.int32), 9)]
        out = b.run(multi_step=8)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])
        assert len(out[rb[0]]) == 1          # stopped at eos immediately

    @pytest.mark.parametrize("n_blocks,block_size", [(16, 8), (5, 4)])
    def test_paged_matches_per_step(self, n_blocks, block_size):
        """Paged windows pre-allocate blocks through pos+k (preempting
        under pressure — the (5, 4) pool forces it) and must still be
        token-identical to the per-step paged batcher."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        a = PagedBatcher(params, cfg, n_slots=3, n_blocks=n_blocks,
                         block_size=block_size)
        ra = self._submit_mixed(a)
        ref = a.run()
        b = PagedBatcher(params, cfg, n_slots=3, n_blocks=n_blocks,
                         block_size=block_size)
        rb = self._submit_mixed(b)
        out = b.run(multi_step=4)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])
        assert b.block_stats[0] == 0         # pool fully returned
        if n_blocks == 5:
            assert b.preemptions > 0


class TestGroupedPrefill:
    """Grouped admission (make_slot_prefill_multi): same-shape queued
    prompts admit in ONE multi-row prefill call — one weight read and
    one host round trip per group. Outputs must be token-identical to
    per-request admission (per-request seeded sampling; the m-row
    scatter pads to a power of two by replicating row 0, whose
    duplicate writes are byte-identical)."""

    def _cfg(self, **kw):
        import jax.numpy as jnp

        base = dict(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                    d_ff=128, max_seq=48, dtype=jnp.float32, flash="off")
        base.update(kw)
        return T.GPTConfig(**base)

    def _reqs(self):
        rng = np.random.default_rng(0)
        return [(rng.integers(1, 64, (int(rng.choice([4, 4, 8])),))
                 .astype(np.int32), int(rng.choice([6, 10])))
                for _ in range(9)]

    @pytest.mark.parametrize("bucket,ms", [(None, 1), (None, 4),
                                           ("pow2", 4)])
    def test_matches_per_request_admission(self, bucket, ms):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        reqs = self._reqs()
        a = ContinuousBatcher(params, cfg, n_slots=4, eos_id=9)
        ra = [a.submit(p, m, temperature=0.7, seed=i)
              for i, (p, m) in enumerate(reqs)]
        assert a._multi_prefill is None      # eager per-request admits
        ref = a.run()
        b = ContinuousBatcher(params, cfg, n_slots=4, eos_id=9,
                              prefill_bucket=bucket)
        with b.defer_admission():
            rb = [b.submit(p, m, temperature=0.7, seed=i)
                  for i, (p, m) in enumerate(reqs)]
        out = b.run(multi_step=ms)
        assert b._multi_prefill is not None  # grouped path engaged
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])

    def test_groups_form_at_window_ends_without_defer(self):
        """Equal-budget requests finish at the same multi-step window
        end, freeing several slots at once — re-admission groups even
        with eager submit."""
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        reqs = self._reqs()
        a = ContinuousBatcher(params, cfg, n_slots=4, eos_id=9)
        ra = [a.submit(p, m, temperature=0.7, seed=i)
              for i, (p, m) in enumerate(reqs)]
        ref = a.run()
        b = ContinuousBatcher(params, cfg, n_slots=4, eos_id=9)
        rb = [b.submit(p, m, temperature=0.7, seed=i)
              for i, (p, m) in enumerate(reqs)]
        out = b.run(multi_step=4)
        assert b._multi_prefill is not None
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])

    @pytest.mark.parametrize("n_blocks,bucket", [(32, None), (32, "pow2"),
                                                 (9, None)])
    def test_paged_grouped_matches_per_request(self, n_blocks, bucket):
        """Paged grouped admission (make_paged_prefill_multi): blocks
        allocated up front, scratch-0 tails, cumulative pool check —
        the (9-block) pool forces small groups + preemption and must
        still match per-request admission exactly."""
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        reqs = self._reqs()
        a = PagedBatcher(params, cfg, n_slots=4, n_blocks=32,
                         block_size=4, eos_id=9)
        ra = [a.submit(p, m, temperature=0.7, seed=i)
              for i, (p, m) in enumerate(reqs)]
        ref = a.run()
        b = PagedBatcher(params, cfg, n_slots=4, n_blocks=n_blocks,
                         block_size=4, eos_id=9, prefill_bucket=bucket)
        with b.defer_admission():
            rb = [b.submit(p, m, temperature=0.7, seed=i)
                  for i, (p, m) in enumerate(reqs)]
        out = b.run(multi_step=4)
        assert b._multi_prefill is not None
        assert b.block_stats[0] == 0         # pool fully returned
        if n_blocks == 9:
            assert b.preemptions > 0
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])

    def test_ineligible_requests_stay_on_single_path(self):
        """Prefix-cache hits and adapter requests fall back to the
        single-request programs inside a deferred burst, and the mix
        still matches per-request admission."""
        import jax

        from neuronika_tpu.models.lora import lora_init
        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prefix = np.arange(1, 7, dtype=np.int32)
        prompts = [np.concatenate([prefix, [20 + i]]).astype(np.int32)
                   for i in range(2)] + \
                  [np.array([30 + i, 31, 32, 33], np.int32)
                   for i in range(4)]
        adapters = [0, 0, 1, 0, 0, 1]

        def build():
            cb = ContinuousBatcher(params, cfg, n_slots=3, eos_id=9)
            cb.register_adapter(lora_init(jax.random.key(1), params, 4))
            cb.register_prefix(prefix)
            return cb

        a = build()
        ra = [a.submit(p, 8, temperature=0.5, seed=i, adapter=ad)
              for i, (p, ad) in enumerate(zip(prompts, adapters))]
        ref = a.run()
        b = build()
        with b.defer_admission():
            rb = [b.submit(p, 8, temperature=0.5, seed=i, adapter=ad)
                  for i, (p, ad) in enumerate(zip(prompts, adapters))]
        out = b.run(multi_step=4)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])


class TestBucketedPrefill:
    """prefill_bucket: prompts pad to shape buckets so one compiled
    program serves every length in the bucket (arbitrary-length
    workloads otherwise compile one prefill per distinct length).
    Outputs must be byte-identical to exact-shape prefill — the padded
    tail's K/V are dead by the causal mask + decode-overwrite
    argument."""

    def _cfg(self):
        import jax.numpy as jnp

        return T.GPTConfig(vocab_size=64, n_layer=2, n_head=4, d_model=64,
                           d_ff=128, max_seq=48, dtype=jnp.float32,
                           flash="off")

    def _prompts(self):
        # deliberately awkward lengths: 3, 5, 6, 11 all land in pow2
        # buckets 16; 17 lands in 32
        lens = [3, 5, 6, 11, 17]
        return ([np.arange(1, n + 1, dtype=np.int32) for n in lens],
                [6, 4, 5, 7, 6])

    @pytest.mark.parametrize("bucket", ["pow2", 8])
    def test_dense_bucketed_matches_exact(self, bucket):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts, max_news = self._prompts()
        a = ContinuousBatcher(params, cfg, n_slots=2)
        ra = [a.submit(p, m) for p, m in zip(prompts, max_news)]
        ref = a.run()
        b = ContinuousBatcher(params, cfg, n_slots=2,
                              prefill_bucket=bucket)
        rb = [b.submit(p, m) for p, m in zip(prompts, max_news)]
        out = b.run()
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])
        if bucket == "pow2":
            # 5 distinct lengths but only 2 buckets -> 2 compiled shapes
            assert b._prefill._cache_size() == 2

    def test_paged_bucketed_matches_exact(self):
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        prompts, max_news = self._prompts()
        a = PagedBatcher(params, cfg, n_slots=2, n_blocks=16, block_size=8)
        ra = [a.submit(p, m) for p, m in zip(prompts, max_news)]
        ref = a.run()
        b = PagedBatcher(params, cfg, n_slots=2, n_blocks=16, block_size=8,
                         prefill_bucket="pow2")
        rb = [b.submit(p, m) for p, m in zip(prompts, max_news)]
        out = b.run(multi_step=2)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])
        assert b._prefill._cache_size() == 2
        assert b.block_stats[0] == 0     # exact allocation: all returned

    def test_bad_bucket_rejected(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        with pytest.raises(ValueError, match="prefill_bucket"):
            ContinuousBatcher(params, cfg, n_slots=2, prefill_bucket=0)

    def test_dense_bucketed_prefix_cache_matches_exact(self):
        import jax

        from neuronika_tpu.serving import ContinuousBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        system = np.array([5, 6, 7, 8, 9, 10], np.int32)
        prompts = [np.concatenate([system, np.arange(1, n + 1)]).astype(
            np.int32) for n in (2, 3, 7, 13)]
        max_news = [6, 4, 5, 5]
        a = ContinuousBatcher(params, cfg, n_slots=2)
        a.register_prefix(system)
        ra = [a.submit(p, m) for p, m in zip(prompts, max_news)]
        ref = a.run()
        b = ContinuousBatcher(params, cfg, n_slots=2,
                              prefill_bucket="pow2")
        b.register_prefix(system)
        rb = [b.submit(p, m) for p, m in zip(prompts, max_news)]
        out = b.run()
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])
        # 4 suffix lengths land in pow2 bucket 16 -> ONE suffix program
        assert b._suffix_prefill._cache_size() == 1

    def test_paged_bucketed_prefix_cache_matches_exact(self):
        import jax

        from neuronika_tpu.serving import PagedBatcher

        cfg = self._cfg()
        params = T.init_params(jax.random.key(0), cfg)
        system = np.arange(50, 58, dtype=np.int32)       # one full block
        prompts = [np.concatenate([system, np.arange(1, n + 1)]).astype(
            np.int32) for n in (2, 5, 9)]
        max_news = [6, 4, 5]
        a = PagedBatcher(params, cfg, n_slots=2, n_blocks=16, block_size=8)
        a.register_prefix(system)
        ra = [a.submit(p, m) for p, m in zip(prompts, max_news)]
        ref = a.run()
        b = PagedBatcher(params, cfg, n_slots=2, n_blocks=16, block_size=8,
                         prefill_bucket="pow2")
        b.register_prefix(system)
        rb = [b.submit(p, m) for p, m in zip(prompts, max_news)]
        out = b.run(multi_step=2)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(out[y], ref[x])
        assert b._paged_suffix._cache_size() == 1
        assert b.block_stats[0] == 0
