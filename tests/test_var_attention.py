"""The define-by-run tier's TPU-native perf ops (VERDICT r3 #1): batched
`matmul`, `astype`, and the fused `flash_attention` Var op that routes the
packed-layout Pallas kernel (ops/pallas/attention.py) into the tape.

The reference's training loop is define-by-run (src/lib.rs:149-188); these
ops are extensions that let that API reach the same kernels the functional
flagship runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import neuronika_tpu as nk
from neuronika_tpu.models import transformer as T
from neuronika_tpu.ops.functional import _attn_xla
from neuronika_tpu.variable import StatusCell

from .conftest import assert_close


def _packed(B, S, H, hd, kv=None):
    kv = kv or H
    W = (H + 2 * kv) * hd
    return (0.1 * np.random.randn(B, S, W)).astype("float32")


class TestMatmul:
    def test_forward_batched(self):
        a = np.random.randn(2, 5, 8).astype("float32")
        b = np.random.randn(8, 4).astype("float32")
        y = nk.from_ndarray(a).matmul(nk.from_ndarray(b))
        y.forward()
        assert_close(y.data(), a @ b)

    def test_forward_2d(self):
        a = np.random.randn(5, 8).astype("float32")
        b = np.random.randn(8, 4).astype("float32")
        y = nk.from_ndarray(a).matmul(nk.from_ndarray(b))
        y.forward()
        assert_close(y.data(), a @ b)

    def test_vjp_matches_jax(self):
        a = np.random.randn(3, 4, 6).astype("float32")
        b = np.random.randn(6, 5).astype("float32")
        va, vb = nk.from_ndarray(a).requires_grad(), nk.from_ndarray(b).requires_grad()
        loss = va.matmul(vb).pow(2).sum()
        loss.forward()
        loss.backward(1.0)
        ra, rb = jax.grad(
            lambda a, b: ((a @ b) ** 2).sum(), argnums=(0, 1)
        )(jnp.asarray(a), jnp.asarray(b))
        assert_close(va.grad(), ra, tol=1e-4)
        assert_close(vb.grad(), rb, tol=1e-4)

    def test_sticky_differentiability(self):
        a = nk.from_ndarray(np.zeros((2, 3, 4), "float32"))
        b = nk.from_ndarray(np.zeros((4, 2), "float32")).requires_grad()
        assert isinstance(a.matmul(b), nk.VarDiff)


class TestAstype:
    def test_roundtrip_and_grad_dtype(self):
        a = np.random.randn(4, 4).astype("float32")
        v = nk.from_ndarray(a).requires_grad()
        y = v.astype("bfloat16")
        assert y.dtype == jnp.bfloat16
        loss = y.astype("float32").sum()
        loss.forward()
        loss.backward(1.0)
        assert v.grad().dtype == jnp.float32
        assert_close(v.grad(), np.ones_like(a))


class TestFlashAttentionOp:
    def test_forward_matches_xla_math(self):
        B, S, H, hd = 2, 16, 2, 8
        x = _packed(B, S, H, hd)
        out = nk.from_ndarray(x).flash_attention(H)
        out.forward()
        ref = _attn_xla(jnp.asarray(x), H, 0, True, 0.0, None)
        assert out.shape == (B, S, H * hd)
        assert_close(out.data(), ref)

    def test_grad_matches_jax_ad(self):
        B, S, H, hd = 2, 16, 2, 8
        x = _packed(B, S, H, hd)
        v = nk.from_ndarray(x).requires_grad()
        loss = v.flash_attention(H).pow(2).sum()
        loss.forward()
        loss.backward(1.0)
        ref = jax.grad(
            lambda q: (_attn_xla(q, H, 0, True, 0.0, None) ** 2).sum()
        )(jnp.asarray(x))
        assert_close(v.grad(), ref, tol=1e-4)

    def test_gqa_forward(self):
        B, S, H, kv, hd = 2, 16, 4, 2, 8
        x = _packed(B, S, H, hd, kv)
        out = nk.from_ndarray(x).flash_attention(H, n_kv_head=kv)
        out.forward()
        ref = _attn_xla(jnp.asarray(x), H, kv, True, 0.0, None)
        assert_close(out.data(), ref)

    def test_non_causal(self):
        B, S, H, hd = 1, 8, 1, 4
        x = _packed(B, S, H, hd)
        out = nk.from_ndarray(x).flash_attention(H, causal=False)
        out.forward()
        ref = _attn_xla(jnp.asarray(x), H, 0, False, 0.0, None)
        assert_close(out.data(), ref)

    def test_interpret_kernel_matches_xla(self):
        # hd=128, S%128==0: the packed Pallas kernel runs (interpret mode on
        # the CPU mesh) and must match the XLA fallback math.
        B, S, H, hd = 1, 128, 2, 128
        x = _packed(B, S, H, hd)
        xla = nk.from_ndarray(x).flash_attention(H)
        xla.forward()
        nk.enable_pallas(True, interpret=True)
        try:
            v = nk.from_ndarray(x).requires_grad()
            out = v.flash_attention(H)
            out.forward()
            assert_close(out.data(), xla.data(), tol=1e-3)
            loss = out.sum()
            loss.forward()
            loss.backward(1.0)
            ref = jax.grad(
                lambda q: _attn_xla(q, H, 0, True, 0.0, None).sum()
            )(jnp.asarray(x))
            assert_close(v.grad(), ref, tol=1e-3)
        finally:
            nk.enable_pallas(False)

    def test_dropout_status_gated(self):
        B, S, H, hd = 1, 16, 2, 8
        x = _packed(B, S, H, hd)
        status = StatusCell(True)
        nodrop = nk.from_ndarray(x).flash_attention(H)
        nodrop.forward()
        out = nk.from_ndarray(x).flash_attention(H, dropout=0.5, status=status)
        out.forward()
        assert not np.allclose(np.asarray(out.data()), np.asarray(nodrop.data()))
        status.set(False)  # eval: dropout off -> identical to no-dropout
        out2 = nk.from_ndarray(x).flash_attention(H, dropout=0.5, status=status)
        out2.forward()
        assert_close(out2.data(), nodrop.data())

    def test_errors(self):
        x = nk.from_ndarray(np.zeros((2, 4, 24), "float32"))
        with pytest.raises(ValueError, match="StatusCell"):
            x.flash_attention(2, dropout=0.5)
        with pytest.raises(ValueError, match="does not factor"):
            x.flash_attention(5)
        with pytest.raises(ValueError, match="packed"):
            nk.from_ndarray(np.zeros((4, 24), "float32")).flash_attention(2)


class TestBatchedVarModel:
    def test_trains(self):
        from neuronika_tpu import optim

        cfg = T.GPTConfig(vocab_size=64, n_layer=2, n_head=2, d_model=32,
                          d_ff=64, max_seq=16, dtype=jnp.float32)
        B, S = 2, 16
        params, fwd = T.build_var_model_batched(cfg, B, S)
        opt = optim.Adam(1e-2)
        opt.register_all(params)
        ids = np.random.randint(0, 64, (B, S)).astype("float32")
        tgt = np.roll(ids, -1, axis=1).reshape(-1)
        xv, tv = nk.from_ndarray(ids), nk.from_ndarray(tgt)
        loss = fwd(xv).reshape((B * S, 64)).log_softmax(1).t().nll(
            tv, nk.Reduction.Mean
        )
        first = opt.train_step(loss, block=True)
        for _ in range(7):
            xv.node.value = jnp.asarray(ids)
            tv.node.value = jnp.asarray(tgt)
            last = opt.train_step(loss, block=True)
        assert last < first

    def test_bf16_params_f32_logits(self):
        cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=16,
                          d_ff=32, max_seq=8, dtype=jnp.bfloat16)
        params, fwd = T.build_var_model_batched(cfg, 2, 8)
        assert all(p.dtype == jnp.bfloat16 for p in params)
        ids = np.random.randint(0, 32, (2, 8)).astype("float32")
        logits = fwd(nk.from_ndarray(ids))
        logits.forward()
        assert logits.dtype == jnp.float32
        assert logits.shape == (2, 8, 32)
