"""Serialization tests (reference serde tier: data-only Var serde,
layer derive, JSON model load — serde.rs:10-58, quickstart.rs:47-179)."""

import json

import numpy as np
import pytest

import neuronika_tpu as nk
from neuronika_tpu import nn, utils
from tests.conftest import assert_close


def test_var_json_roundtrip():
    v = nk.from_ndarray(np.arange(6.0).reshape(2, 3))
    s = utils.dumps(v)
    w = utils.loads(s)
    assert_close(w.data(), v.data())
    d = json.loads(s)
    assert d["dim"] == [2, 3]
    assert d["v"] == 1


def test_vardiff_serializes_data_only():
    v = nk.from_ndarray(np.ones((2,))).requires_grad()
    (v * 2.0).sum().forward()
    loss = (v * 2.0).sum()
    loss.forward()
    loss.backward(1.0)
    w = utils.loads(utils.dumps(v), requires_grad=True)
    assert_close(w.data(), v.data())
    assert_close(w.grad(), np.zeros(2))  # gradient NOT persisted


def test_layer_roundtrip():
    lin = nn.Linear(3, 2)
    state = utils.save_layer(lin)
    lin2 = nn.Linear(3, 2)
    utils.load_layer(lin2, state)
    assert_close(lin2.weight.data(), lin.weight.data())
    assert_close(lin2.bias.data(), lin.bias.data())


def test_model_json_load_like_quickstart():
    """Loading a model from a JSON string (quickstart.rs:47-179)."""
    model = {"lin1": nn.Linear(3, 5), "lin2": nn.Linear(5, 1)}
    blob = json.dumps(utils.state_dict(model))
    fresh = {"lin1": nn.Linear(3, 5), "lin2": nn.Linear(5, 1)}
    utils.load_state_dict(fresh, json.loads(blob))
    assert_close(fresh["lin1"].weight.data(), model["lin1"].weight.data())
    x = nk.rand((4, 3))
    y1 = model["lin2"].forward(model["lin1"].forward(x).relu())
    y2 = fresh["lin2"].forward(fresh["lin1"].forward(x).relu())
    y1.forward()
    y2.forward()
    assert_close(y1.data(), y2.data())


def test_npz_roundtrip(tmp_path):
    lin = nn.Linear(4, 4)
    path = str(tmp_path / "ckpt.npz")
    utils.save_npz(path, {"w": lin.weight, "b": lin.bias})
    lin2 = nn.Linear(4, 4)
    utils.load_npz(path, {"w": lin2.weight, "b": lin2.bias})
    assert_close(lin2.weight.data(), lin.weight.data())


def test_npz_roundtrip_suffixless_path(tmp_path):
    # np.savez appends '.npz' to a bare path; save/load must both normalise
    # (ADVICE r1: save_npz('ckpt')/load_npz('ckpt') used to FileNotFoundError)
    lin = nn.Linear(4, 4)
    path = str(tmp_path / "ckpt")
    utils.save_npz(path, {"w": lin.weight, "b": lin.bias})
    lin2 = nn.Linear(4, 4)
    utils.load_npz(path, {"w": lin2.weight, "b": lin2.bias})
    assert_close(lin2.weight.data(), lin.weight.data())


def test_gradcheck_noncontiguous_input():
    # reshape(-1) on a transposed (non-contiguous) array returns a copy,
    # which used to make the finite-difference bump a silent no-op
    from neuronika_tpu.utils.gradcheck import gradcheck

    base = np.asfortranarray(np.random.rand(3, 4).astype(np.float32))
    assert not base.flags["C_CONTIGUOUS"]
    gradcheck(lambda v: (v * v).sum(), [base])


def test_pytree_roundtrip(tmp_path):
    import jax

    from neuronika_tpu.models import transformer as T

    cfg = T.GPTConfig(vocab_size=8, n_layer=1, n_head=1, d_model=8,
                      d_ff=16, max_seq=4)
    params = T.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "params.npz")
    utils.save_pytree(path, params)
    like = T.init_params(jax.random.key(1), cfg)
    loaded = utils.load_pytree(path, like)
    assert_close(loaded["wte"], params["wte"])
    assert_close(loaded["blocks"]["qkv"], params["blocks"]["qkv"])


def test_optimizer_state_roundtrip(tmp_path):
    import numpy as np

    from neuronika_tpu import optim

    lin = nn.Linear(3, 2)
    opt = optim.Adam(0.01)
    opt.register_all(lin.parameters())
    for _ in range(3):
        loss = lin.forward(nk.ones((4, 3))).mse(nk.zeros((4, 2)), nk.Reduction.Mean)
        opt.train_step(loss)
    path = str(tmp_path / "opt.npz")
    utils.serde.save_optimizer(path, opt)

    opt2 = optim.Adam(0.01)
    lin2 = nn.Linear(3, 2)
    opt2.register_all(lin2.parameters())
    utils.serde.load_optimizer(path, opt2)
    assert opt2._step_count == opt._step_count
    assert_close(opt2._state[0]["exp_avg"], opt._state[0]["exp_avg"])


class TestOrbaxCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.utils.checkpoint import Checkpointer

        state = {
            "params": {"w": jnp.arange(12.0).reshape(3, 4),
                       "b": jnp.ones((4,), jnp.bfloat16)},
            "opt": {"m": jnp.zeros((3, 4)), "step": jnp.int32(7)},
        }
        with Checkpointer(str(tmp_path / "ck"), keep=2) as ck:
            ck.save(10, state)
            ck.wait()
            out = ck.restore()
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), state, out)
        assert out["params"]["b"].dtype == jnp.bfloat16

    def test_retention_and_step_selection(self, tmp_path):
        import jax.numpy as jnp

        from neuronika_tpu.utils.checkpoint import Checkpointer

        with Checkpointer(str(tmp_path / "ck"), keep=2,
                          async_save=False) as ck:
            for s in (1, 2, 3):
                ck.save(s, {"x": jnp.full((2,), float(s))})
            ck.wait()
            assert ck.latest_step() == 3
            assert ck.steps() == [2, 3]      # keep=2 dropped step 1
            two = ck.restore(step=2)
            assert float(two["x"][0]) == 2.0

    def test_training_resume_equivalence(self, tmp_path):
        """Train 3 steps, checkpoint, train 2 more; vs restore at 3 and
        train the same 2 — identical params (the resume contract)."""
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.models import transformer as T
        from neuronika_tpu.utils.checkpoint import (
            restore_train_state,
            save_train_state,
        )

        cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                          d_ff=64, max_seq=16, dtype=jnp.float32,
                          flash="off")
        step = T.make_train_step(cfg)
        params = T.init_params(jax.random.key(0), cfg)
        opt = T.adam_init(params)
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 32)
        tgts = jnp.roll(toks, -1, axis=1)
        for i in range(3):
            params, opt, _ = step(params, opt, toks, tgts,
                                  jnp.float32(1e-3), jax.random.key(i))
        save_train_state(str(tmp_path / "ck"), 3,
                         {"params": params, "opt": opt})
        cont_p, cont_o = params, opt
        for i in (3, 4):
            cont_p, cont_o, _ = step(cont_p, cont_o, toks, tgts,
                                     jnp.float32(1e-3), jax.random.key(i))

        st = restore_train_state(str(tmp_path / "ck"))
        res_p, res_o = st["params"], st["opt"]
        for i in (3, 4):
            res_p, res_o, _ = step(res_p, res_o, toks, tgts,
                                   jnp.float32(1e-3), jax.random.key(i))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), cont_p, res_p)


class TestModelBundle:
    """save_model/load_model: params + config + tokenizer round-trip."""

    def test_gpt_bundle_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.data.tokenizer import BpeTokenizer
        from neuronika_tpu.models import transformer as T
        from neuronika_tpu.utils.hub import load_model, save_model

        cfg = T.llama_config(vocab_size=300, n_layer=2, n_head=2,
                             d_model=32, d_ff=96, max_seq=16,
                             dtype=jnp.float32)
        params = T.init_params(jax.random.key(0), cfg)
        tok = BpeTokenizer.train(["the quick brown fox " * 30], 300)
        d = str(tmp_path / "model")
        save_model(d, params, cfg, tok)

        p2, cfg2, tok2 = load_model(d)
        assert cfg2 == cfg
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), params, p2)
        assert max(jax.tree.leaves(diffs)) == 0.0
        assert tok2.encode("the quick") == tok.encode("the quick")
        # loaded model runs
        toks = jax.random.randint(jax.random.key(1), (2, 16), 0, 300)
        out = T.forward(p2, toks, cfg2)
        assert out.shape == (2, 16, 300)

    def test_seq2seq_bundle_without_tokenizer(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.models import t5
        from neuronika_tpu.utils.hub import load_model, save_model

        cfg = t5.Seq2SeqConfig(vocab_size=40, n_layer=1, n_head=2,
                               d_model=32, d_ff=64, max_src=8,
                               max_tgt=8, dtype=jnp.float32)
        p = t5.init_params(jax.random.key(0), cfg)
        d = str(tmp_path / "s2s")
        save_model(d, p, cfg)
        p2, cfg2, tok = load_model(d)
        assert tok is None and cfg2 == cfg
        src = jax.random.randint(jax.random.key(1), (1, 8), 0, 40)
        tgt = jax.random.randint(jax.random.key(2), (1, 4), 0, 40)
        assert jnp.allclose(t5.forward(p2, src, tgt, cfg2),
                            t5.forward(p, src, tgt, cfg))


class TestAOTExport:
    """jax.export tier: serialize a compiled serving program, reload it
    WITHOUT model code, get identical outputs (utils/aot.py — the
    TPU-native analogue of the reference's ship-the-binary deployment,
    /root/reference/src/lib.rs:8-11)."""

    def test_roundtrip_bytes_and_file(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from neuronika_tpu.models import transformer as T

        cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                          d_ff=64, max_seq=16, dtype=jnp.float32,
                          flash="off", remat=False)
        params = T.init_params(jax.random.key(0), cfg)
        gen = T.make_generate(cfg, max_new=4)
        prompt = jnp.asarray(np.arange(6, dtype=np.int32)[None])
        key = jax.random.key(7)
        want = np.asarray(gen(params, prompt, key))

        blob = utils.export_fn(gen, params, prompt, key)
        assert isinstance(blob, bytes) and len(blob) > 100
        got = np.asarray(utils.load_exported(blob)(params, prompt, key))
        np.testing.assert_array_equal(got, want)

        p = tmp_path / "gpt.nkx"
        utils.save_exported(p, gen, params, prompt, key)
        got2 = np.asarray(utils.load_exported(p)(params, prompt, key))
        np.testing.assert_array_equal(got2, want)

    def test_shape_struct_export_and_mismatch_error(self):
        import jax
        import jax.numpy as jnp

        f = lambda x: x * 2.0 + 1.0
        blob = utils.export_fn(
            f, jax.ShapeDtypeStruct((4,), jnp.float32))
        call = utils.load_exported(blob)
        np.testing.assert_allclose(
            np.asarray(call(jnp.ones((4,), jnp.float32))), np.full(4, 3.0))
        with pytest.raises(Exception):
            call(jnp.ones((5,), jnp.float32))  # shapes are fixed at export


class TestMetricsLogger:
    """Scalar logging tier (SURVEY.md §5 observability: the reference
    has print_lr only — lr_scheduler/mod.rs:60-68)."""

    def test_jsonl_sink_ema_and_throughput(self, tmp_path):
        import jax.numpy as jnp

        p = tmp_path / "run.jsonl"
        with utils.MetricsLogger(str(p), ema=0.5,
                                 tokens_per_step=100) as m:
            r0 = m.log(0, loss=jnp.float32(4.0))      # device scalar ok
            r1 = m.log(1, loss=2.0, lr=0.1)
        assert r0["loss"] == 4.0 and r0["loss_ema"] == 4.0
        assert r1["loss_ema"] == pytest.approx(3.0)   # 0.5*4 + 0.5*2
        assert "step_ms" in r1 and "tokens_per_sec" in r1
        lines = [json.loads(l) for l in p.read_text().splitlines()]
        assert [l["step"] for l in lines] == [0, 1]
        assert m.summary()["n"] == 2

        # append-only resume: a second logger keeps the file
        with utils.MetricsLogger(str(p)) as m2:
            m2.log(2, loss=1.0)
        assert len(p.read_text().splitlines()) == 3

    def test_mfu_column(self):
        m = utils.MetricsLogger(flops_per_step=2.0e12, peak_flops=1.0e14)
        m.log(0, loss=1.0)
        rec = m.log(1, loss=1.0)
        assert 0.0 < rec["mfu"] < 1e4
        m.close()
