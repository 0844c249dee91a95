"""HF checkpoint import (utils/hf.py): logit parity against the torch
`transformers` forward — the oracle that proves the whole model stack
(packed-qkv layout, RoPE convention, RMSNorm eps, SwiGLU, GQA) matches
published-model semantics, not just our own tests.

Models are built from random-init HF configs (no network); both sides
run f32.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from neuronika_tpu.models import transformer as T  # noqa: E402
from neuronika_tpu.utils.hf import (  # noqa: E402
    from_hf_gpt2, from_hf_llama, from_huggingface,
)


def _logits_ours(params, cfg, ids: np.ndarray) -> np.ndarray:
    out = T.forward(params, jnp.asarray(ids), cfg, train=False)
    return np.asarray(out, dtype=np.float32)


def _logits_torch(model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return model(torch.from_numpy(ids)).logits.float().numpy()


def _assert_close(a, b, atol=2e-4):
    scale = max(1.0, float(np.abs(b).max()))
    err = np.abs(a - b).max() / scale
    assert err < atol, f"max rel-to-scale err {err:.2e}"


@pytest.fixture(scope="module")
def gpt2():
    cfg = transformers.GPT2Config(
        vocab_size=97, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    return transformers.GPT2LMHeadModel(cfg).eval()


@pytest.fixture(scope="module")
def llama():
    cfg = transformers.LlamaConfig(
        vocab_size=97, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0,
    )
    torch.manual_seed(1)
    return transformers.LlamaForCausalLM(cfg).eval()


def test_gpt2_logit_parity(gpt2):
    params, cfg = from_hf_gpt2(gpt2, dtype=jnp.float32)
    assert cfg.norm == "layer" and cfg.tied_head and cfg.mlp == "gelu"
    assert cfg.d_ff == 4 * 64 and cfg.norm_eps == 1e-5
    ids = np.random.default_rng(0).integers(0, 97, (2, 16)).astype(np.int32)
    _assert_close(_logits_ours(params, cfg, ids),
                  _logits_torch(gpt2, ids))


def test_gpt2_dispatch_and_training_step(gpt2):
    """from_huggingface dispatches by model_type, and the imported tree
    drops straight into make_train_step (shape/dtype compatibility with
    opt_init + donation)."""
    params, cfg = from_huggingface(gpt2, dtype=jnp.float32)
    step = T.make_train_step(cfg)
    opt = T.opt_init(params, cfg)
    ids = np.random.default_rng(1).integers(0, 97, (2, 16))
    import jax

    p2, _, loss = step(params, opt, jnp.asarray(ids), jnp.asarray(ids),
                       jnp.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(loss))
    assert jax.tree.structure(p2) == jax.tree.structure(params)


def test_llama_gqa_logit_parity(llama):
    params, cfg = from_hf_llama(llama, dtype=jnp.float32)
    assert cfg.norm == "rms" and cfg.norm_eps == 1e-6
    assert cfg.n_kv_head == 2 and cfg.mlp == "swiglu" and not cfg.bias
    assert not cfg.tied_head and "lm_head" in params
    ids = np.random.default_rng(2).integers(0, 97, (2, 24)).astype(np.int32)
    _assert_close(_logits_ours(params, cfg, ids),
                  _logits_torch(llama, ids))


def test_mistral_window_maps_to_cfg():
    mcfg = transformers.MistralConfig(
        vocab_size=97, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        sliding_window=8, rms_norm_eps=1e-5,
    )
    torch.manual_seed(2)
    model = transformers.MistralForCausalLM(mcfg).eval()
    params, cfg = from_huggingface(model, dtype=jnp.float32)
    assert cfg.window == 8 and cfg.norm == "rms"
    # parity inside the window (S <= window: banded == full causal on
    # both sides regardless of the transformers version's mask policy)
    ids = np.random.default_rng(3).integers(0, 97, (1, 8)).astype(np.int32)
    _assert_close(_logits_ours(params, cfg, ids),
                  _logits_torch(model, ids))


def test_gpt2_greedy_generate_matches_hf(gpt2):
    """End-to-end: on-device greedy generation over the imported weights
    reproduces transformers' greedy decode token-for-token."""
    import jax

    params, cfg = from_hf_gpt2(gpt2, dtype=jnp.float32)
    prompt = np.random.default_rng(4).integers(0, 97, (2, 6)).astype(np.int32)
    gen = T.make_generate(cfg, max_new=8)
    ours = np.asarray(gen(params, jnp.asarray(prompt), jax.random.key(0)))
    with torch.no_grad():
        ref = gpt2.generate(
            torch.from_numpy(prompt.astype(np.int64)),
            max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# export (to_huggingface): the inverse mapping, proven by torch-side
# logit parity and an exact export->import round trip


from neuronika_tpu.utils.hf import (  # noqa: E402
    to_hf_gpt2, to_hf_llama, to_huggingface,
)


class TestHFExport:
    def _gpt2_cfg(self):
        return T.GPTConfig(vocab_size=97, n_layer=2, n_head=4,
                           d_model=64, d_ff=256, max_seq=64,
                           dtype=jnp.float32)

    def _llama_cfg(self, **kw):
        base = dict(vocab_size=97, n_layer=2, n_head=4, n_kv_head=2,
                    d_model=64, d_ff=128, max_seq=64,
                    dtype=jnp.float32)
        base.update(kw)
        return T.llama_config(**base)

    def test_gpt2_export_logit_parity(self):
        import jax

        cfg = self._gpt2_cfg()
        params = T.init_params(jax.random.key(0), cfg)
        model = to_huggingface(params, cfg)
        assert model.__class__.__name__ == "GPT2LMHeadModel"
        ids = np.random.default_rng(0).integers(0, 97, (2, 16)).astype(
            np.int32)
        _assert_close(_logits_torch(model, ids),
                      _logits_ours(params, cfg, ids))

    def test_llama_export_logit_parity_and_roundtrip(self):
        import jax

        cfg = self._llama_cfg()
        params = T.init_params(jax.random.key(0), cfg)
        model = to_huggingface(params, cfg)
        assert model.__class__.__name__ == "LlamaForCausalLM"
        ids = np.random.default_rng(1).integers(0, 97, (2, 16)).astype(
            np.int32)
        _assert_close(_logits_torch(model, ids),
                      _logits_ours(params, cfg, ids))
        # export -> import is the identity on every leaf
        params2, cfg2 = from_huggingface(model, dtype=jnp.float32)
        assert cfg2.n_kv_head == cfg.n_kv_head
        assert cfg2.norm_eps == cfg.norm_eps
        import jax as _jax

        for pa, pb in zip(_jax.tree.leaves(params),
                          _jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       atol=1e-6)

    def test_mistral_window_export(self):
        import jax

        cfg = self._llama_cfg(window=16)
        params = T.init_params(jax.random.key(0), cfg)
        model = to_huggingface(params, cfg)
        assert model.__class__.__name__ == "MistralForCausalLM"
        assert model.config.sliding_window == 16
        ids = np.random.default_rng(2).integers(0, 97, (1, 24)).astype(
            np.int32)
        _assert_close(_logits_torch(model, ids),
                      _logits_ours(params, cfg, ids))

    def test_export_rejects_unsupported(self):
        import jax

        cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                          d_ff=64, max_seq=16, dtype=jnp.float32,
                          n_experts=2)
        params = T.init_params(jax.random.key(0), cfg)
        with pytest.raises(ValueError, match="MoE"):
            to_hf_gpt2(params, cfg)
        cfg2 = self._llama_cfg()
        params2 = T.init_params(jax.random.key(0), cfg2)
        with pytest.raises(ValueError, match="GPT-2 export needs"):
            to_hf_gpt2(params2, cfg2)
        with pytest.raises(ValueError, match="llama export needs"):
            to_hf_llama(params, cfg)

    def test_save_pretrained_roundtrip(self, tmp_path):
        """The exported model survives save_pretrained/from_pretrained
        (safetensors on disk) with identical logits."""
        import jax
        import transformers

        cfg = self._llama_cfg()
        params = T.init_params(jax.random.key(0), cfg)
        model = to_huggingface(params, cfg)
        model.save_pretrained(tmp_path / "m")
        loaded = transformers.AutoModelForCausalLM.from_pretrained(
            tmp_path / "m").eval()
        ids = np.random.default_rng(3).integers(0, 97, (1, 12)).astype(
            np.int32)
        _assert_close(_logits_torch(loaded, ids),
                      _logits_torch(model, ids), atol=1e-6)
