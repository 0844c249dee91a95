"""HuggingFace checkpoint import AND export: torch `transformers`
models <-> this framework's param pytrees + `GPTConfig`.

`from_huggingface(model)` converts a loaded `GPT2LMHeadModel`,
`LlamaForCausalLM` or `MistralForCausalLM` (any size) into the stacked-
layer layout `models/transformer.py` trains and serves — so a user can
bring published weights to the TPU stack and keep the whole toolchain
(sharded training, LoRA, quantized serving, paged batching) without a
re-training step.

Numerical parity is exact by construction (tests compare logits against
the torch forward at f32):

* GPT-2's `Conv1D` already stores weights (in, out) — no transpose;
  Llama's `nn.Linear` stores (out, features) — transposed on import.
* The fused qkv tensor here is **kv-group-major** (`_unpack_qkv`):
  group g packs [q_{gG} .. q_{gG+G-1} | k_g | v_g]. HF keeps separate
  head-major q/k/v projections with kv head g serving q heads
  [gG, (g+1)G) (`repeat_kv`) — `_pack_qkv` is that permutation.
* RoPE: both sides use the GPT-NeoX half-split convention
  (`rotate_half` in HF, `_apply_rope` here), so no q/k row shuffle is
  needed; `rope_theta` and `rms_norm_eps` ride the config.
* GPT-2's `gelu_new` is the tanh approximation — `jax.nn.gelu`'s
  default.

This is an extension tier (the reference's only checkpoint format is
its own serde JSON, /root/reference/neuronika-variable/src/serde.rs);
it exists because "switch to this framework" must include existing
weights.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["from_huggingface", "from_hf_gpt2", "from_hf_llama",
           "to_huggingface", "to_hf_gpt2", "to_hf_llama"]


def _np(t) -> np.ndarray:
    # torch tensor -> float32 numpy (params live in f32 here)
    return np.asarray(t.detach().cpu().to(dtype=_torch().float32).numpy())


def _torch():
    import torch

    return torch


def _pack_qkv(q: np.ndarray, k: np.ndarray, v: np.ndarray,
              H: int, KV: int, hd: int) -> np.ndarray:
    """Head-major q (D, H*hd) / k, v (D, KV*hd) -> kv-group-major packed
    (D, W). Works for bias rows too (D=1)."""
    D = q.shape[0]
    G = H // KV
    q = q.reshape(D, KV, G, hd)
    k = k.reshape(D, KV, 1, hd)
    v = v.reshape(D, KV, 1, hd)
    return np.concatenate([q, k, v], axis=2).reshape(D, KV * (G + 2) * hd)


def _stack(rows) -> jnp.ndarray:
    return jnp.asarray(np.stack(rows, axis=0))


def from_hf_gpt2(model, *, dtype: Any = jnp.bfloat16) -> Tuple[Dict, Any]:
    """GPT2LMHeadModel -> (params, GPTConfig). `dtype` sets the compute
    dtype only; imported params stay f32 (the training convention)."""
    from ..models.transformer import GPTConfig

    c = model.config
    sd = model.state_dict()
    H = c.n_head
    hd = c.n_embd // H
    cfg = GPTConfig(
        vocab_size=c.vocab_size, n_layer=c.n_layer, n_head=H,
        d_model=c.n_embd, d_ff=c.n_inner or 4 * c.n_embd,
        max_seq=c.n_positions, pos_emb="learned", norm="layer",
        norm_eps=c.layer_norm_epsilon, mlp="gelu", bias=True,
        tied_head=True, dropout=0.0, dtype=dtype,
    )

    def g(name):
        return _np(sd[f"transformer.{name}"])

    ln1_w, ln1_b, ln2_w, ln2_b = [], [], [], []
    qkv, qkv_b, proj, proj_b = [], [], [], []
    fc_in, fc_in_b, fc_out, fc_out_b = [], [], [], []
    for i in range(c.n_layer):
        p = f"h.{i}"
        ln1_w.append(g(f"{p}.ln_1.weight"))
        ln1_b.append(g(f"{p}.ln_1.bias"))
        ln2_w.append(g(f"{p}.ln_2.weight"))
        ln2_b.append(g(f"{p}.ln_2.bias"))
        w = g(f"{p}.attn.c_attn.weight")              # (D, 3D), Conv1D
        b = g(f"{p}.attn.c_attn.bias")                # (3D,)
        qw, kw, vw = np.split(w, 3, axis=1)
        qb, kb, vb = np.split(b[None, :], 3, axis=1)
        qkv.append(_pack_qkv(qw, kw, vw, H, H, hd))
        qkv_b.append(_pack_qkv(qb, kb, vb, H, H, hd)[0])
        proj.append(g(f"{p}.attn.c_proj.weight"))
        proj_b.append(g(f"{p}.attn.c_proj.bias"))
        fc_in.append(g(f"{p}.mlp.c_fc.weight"))
        fc_in_b.append(g(f"{p}.mlp.c_fc.bias"))
        fc_out.append(g(f"{p}.mlp.c_proj.weight"))
        fc_out_b.append(g(f"{p}.mlp.c_proj.bias"))

    params = {
        "wte": jnp.asarray(g("wte.weight")),
        "wpe": jnp.asarray(g("wpe.weight")),
        "ln_f": {"scale": jnp.asarray(g("ln_f.weight")),
                 "bias": jnp.asarray(g("ln_f.bias"))},
        "blocks": {
            "ln1": {"scale": _stack(ln1_w), "bias": _stack(ln1_b)},
            "ln2": {"scale": _stack(ln2_w), "bias": _stack(ln2_b)},
            "qkv": _stack(qkv), "qkv_b": _stack(qkv_b),
            "proj": _stack(proj), "proj_b": _stack(proj_b),
            "fc_in": _stack(fc_in), "fc_in_b": _stack(fc_in_b),
            "fc_out": _stack(fc_out), "fc_out_b": _stack(fc_out_b),
        },
    }
    return params, cfg


def from_hf_llama(model, *, dtype: Any = jnp.bfloat16) -> Tuple[Dict, Any]:
    """LlamaForCausalLM / MistralForCausalLM -> (params, GPTConfig):
    RMSNorm + RoPE + SwiGLU + (optionally grouped) attention, no biases.
    Mistral's `sliding_window` maps to cfg.window."""
    from ..models.transformer import GPTConfig

    c = model.config
    sd = model.state_dict()
    H = c.num_attention_heads
    KV = getattr(c, "num_key_value_heads", None) or H
    hd = c.hidden_size // H
    tied = bool(getattr(c, "tie_word_embeddings", False))
    window = getattr(c, "sliding_window", None) or 0
    cfg = GPTConfig(
        vocab_size=c.vocab_size, n_layer=c.num_hidden_layers, n_head=H,
        n_kv_head=0 if KV == H else KV, d_model=c.hidden_size,
        d_ff=c.intermediate_size, max_seq=c.max_position_embeddings,
        pos_emb="rope", rope_theta=float(getattr(c, "rope_theta", 10000.0)),
        norm="rms", norm_eps=c.rms_norm_eps, mlp="swiglu", bias=False,
        tied_head=tied, window=int(window), dropout=0.0, dtype=dtype,
    )

    def g(name):
        # nn.Linear stores (out, in): transpose into this repo's (in, out)
        return _np(sd[name]).T

    ln1, ln2 = [], []
    qkv, proj = [], []
    fc_gate, fc_in, fc_out = [], [], []
    for i in range(cfg.n_layer):
        p = f"model.layers.{i}"
        ln1.append(_np(sd[f"{p}.input_layernorm.weight"]))
        ln2.append(_np(sd[f"{p}.post_attention_layernorm.weight"]))
        qkv.append(_pack_qkv(
            g(f"{p}.self_attn.q_proj.weight"),
            g(f"{p}.self_attn.k_proj.weight"),
            g(f"{p}.self_attn.v_proj.weight"), H, KV, hd))
        proj.append(g(f"{p}.self_attn.o_proj.weight"))
        fc_gate.append(g(f"{p}.mlp.gate_proj.weight"))
        fc_in.append(g(f"{p}.mlp.up_proj.weight"))
        fc_out.append(g(f"{p}.mlp.down_proj.weight"))

    params = {
        "wte": jnp.asarray(_np(sd["model.embed_tokens.weight"])),
        "ln_f": {"scale": jnp.asarray(_np(sd["model.norm.weight"]))},
        "blocks": {
            "ln1": {"scale": _stack(ln1)},
            "ln2": {"scale": _stack(ln2)},
            "qkv": _stack(qkv), "proj": _stack(proj),
            "fc_gate": _stack(fc_gate), "fc_in": _stack(fc_in),
            "fc_out": _stack(fc_out),
        },
    }
    if not tied:
        params["lm_head"] = jnp.asarray(_np(sd["lm_head.weight"]))
    return params, cfg


_IMPORTERS = {
    "gpt2": from_hf_gpt2,
    "llama": from_hf_llama,
    "mistral": from_hf_llama,
}


def from_huggingface(model, *, dtype: Any = jnp.bfloat16):
    """Convert a loaded `transformers` causal-LM to (params, cfg).
    Dispatches on `model.config.model_type` ("gpt2" | "llama" |
    "mistral"); the result drops straight into `forward`,
    `make_train_step`, `make_generate`, LoRA and the serving tiers."""
    mt = getattr(model.config, "model_type", None)
    fn = _IMPORTERS.get(mt)
    if fn is None:
        raise ValueError(
            f"unsupported HF model_type {mt!r}; supported: "
            f"{sorted(_IMPORTERS)}")
    return fn(model, dtype=dtype)


# ---------------------------------------------------------------------------
# export: this framework's param pytrees -> torch `transformers` models
# (the inverse of the importers above, so fine-tunes made here — full,
# LoRA-merged or QLoRA-merged — flow back into the HF ecosystem via
# `model.save_pretrained(...)`)


def _unpack_qkv_np(w: np.ndarray, H: int, KV: int,
                   hd: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """kv-group-major packed (D, W) -> head-major q (D, H*hd) /
    k, v (D, KV*hd): `_pack_qkv`'s exact inverse (bias rows too)."""
    D = w.shape[0]
    G = H // KV
    t = w.reshape(D, KV, G + 2, hd)
    q = np.ascontiguousarray(t[:, :, :G]).reshape(D, H * hd)
    k = np.ascontiguousarray(t[:, :, G]).reshape(D, KV * hd)
    v = np.ascontiguousarray(t[:, :, G + 1]).reshape(D, KV * hd)
    return q, k, v


def _tt(x) -> "Any":
    # copy: jax arrays expose a read-only buffer torch would warn about
    return _torch().from_numpy(np.array(x, np.float32))


def _require(cfg, cond: bool, what: str) -> None:
    if not cond:
        raise ValueError(f"cannot export this config to HF: {what} "
                         f"(cfg: {cfg})")


def to_hf_gpt2(params, cfg) -> "Any":
    """params + GPTConfig (GPT-2 family: learned positions, LayerNorm,
    gelu, biases, tied head) -> a `GPT2LMHeadModel` with identical
    logits (f32). Save with `model.save_pretrained(dir)`."""
    import transformers

    _require(cfg, cfg.pos_emb == "learned" and cfg.norm == "layer"
             and cfg.mlp == "gelu" and cfg.bias and cfg.tied_head,
             "GPT-2 export needs learned positions + LayerNorm + gelu + "
             "biases + tied head (use to_hf_llama for the llama family)")
    _require(cfg, not cfg.n_experts, "MoE blocks have no HF GPT-2 form")
    _require(cfg, not getattr(cfg, "n_kv_head", 0),
             "GPT-2 has no grouped-query attention")
    H = cfg.n_head
    hd = cfg.d_model // H
    hc = transformers.GPT2Config(
        vocab_size=cfg.vocab_size, n_positions=cfg.max_seq,
        n_embd=cfg.d_model, n_layer=cfg.n_layer, n_head=H,
        n_inner=cfg.d_ff, layer_norm_epsilon=cfg.norm_eps,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = transformers.GPT2LMHeadModel(hc).eval()
    sd = model.state_dict()
    b = params["blocks"]

    def put(name, val):
        sd[f"transformer.{name}"] = _tt(val)

    put("wte.weight", params["wte"])
    put("wpe.weight", params["wpe"])
    put("ln_f.weight", params["ln_f"]["scale"])
    put("ln_f.bias", params["ln_f"]["bias"])
    for i in range(cfg.n_layer):
        p = f"h.{i}"
        put(f"{p}.ln_1.weight", b["ln1"]["scale"][i])
        put(f"{p}.ln_1.bias", b["ln1"]["bias"][i])
        put(f"{p}.ln_2.weight", b["ln2"]["scale"][i])
        put(f"{p}.ln_2.bias", b["ln2"]["bias"][i])
        q, k, v = _unpack_qkv_np(np.asarray(b["qkv"][i], np.float32),
                                 H, H, hd)
        put(f"{p}.attn.c_attn.weight", np.concatenate([q, k, v], axis=1))
        qb, kb, vb = _unpack_qkv_np(
            np.asarray(b["qkv_b"][i], np.float32)[None], H, H, hd)
        put(f"{p}.attn.c_attn.bias",
            np.concatenate([qb, kb, vb], axis=1)[0])
        put(f"{p}.attn.c_proj.weight", b["proj"][i])
        put(f"{p}.attn.c_proj.bias", b["proj_b"][i])
        put(f"{p}.mlp.c_fc.weight", b["fc_in"][i])
        put(f"{p}.mlp.c_fc.bias", b["fc_in_b"][i])
        put(f"{p}.mlp.c_proj.weight", b["fc_out"][i])
        put(f"{p}.mlp.c_proj.bias", b["fc_out_b"][i])
    sd["lm_head.weight"] = _tt(params["wte"])       # tied
    model.load_state_dict(sd)
    return model


def to_hf_llama(params, cfg) -> "Any":
    """params + GPTConfig (llama family: RoPE, RMSNorm, SwiGLU, no
    biases) -> `LlamaForCausalLM`, or `MistralForCausalLM` when
    cfg.window is set (sliding-window attention). Identical logits
    (f32); save with `model.save_pretrained(dir)`."""
    import transformers

    _require(cfg, cfg.pos_emb == "rope" and cfg.norm == "rms"
             and cfg.mlp == "swiglu" and not cfg.bias,
             "llama export needs rope + RMSNorm + SwiGLU + no biases "
             "(use to_hf_gpt2 for the GPT-2 family)")
    _require(cfg, not cfg.n_experts, "MoE export is not supported")
    H = cfg.n_head
    KV = getattr(cfg, "n_kv_head", 0) or H
    hd = cfg.d_model // H
    common = dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
        intermediate_size=cfg.d_ff, num_hidden_layers=cfg.n_layer,
        num_attention_heads=H, num_key_value_heads=KV,
        max_position_embeddings=cfg.max_seq, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=cfg.tied_head,
        attention_dropout=0.0,
    )
    if cfg.window:
        hc = transformers.MistralConfig(sliding_window=cfg.window,
                                        **common)
        model = transformers.MistralForCausalLM(hc).eval()
    else:
        hc = transformers.LlamaConfig(attention_bias=False, **common)
        model = transformers.LlamaForCausalLM(hc).eval()
    sd = model.state_dict()
    b = params["blocks"]
    sd["model.embed_tokens.weight"] = _tt(params["wte"])
    sd["model.norm.weight"] = _tt(params["ln_f"]["scale"])
    for i in range(cfg.n_layer):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = _tt(b["ln1"]["scale"][i])
        sd[f"{p}.post_attention_layernorm.weight"] = _tt(
            b["ln2"]["scale"][i])
        q, k, v = _unpack_qkv_np(np.asarray(b["qkv"][i], np.float32),
                                 H, KV, hd)
        # nn.Linear stores (out, in): transpose back from (in, out)
        sd[f"{p}.self_attn.q_proj.weight"] = _tt(q.T)
        sd[f"{p}.self_attn.k_proj.weight"] = _tt(k.T)
        sd[f"{p}.self_attn.v_proj.weight"] = _tt(v.T)
        sd[f"{p}.self_attn.o_proj.weight"] = _tt(
            np.asarray(b["proj"][i], np.float32).T)
        sd[f"{p}.mlp.gate_proj.weight"] = _tt(
            np.asarray(b["fc_gate"][i], np.float32).T)
        sd[f"{p}.mlp.up_proj.weight"] = _tt(
            np.asarray(b["fc_in"][i], np.float32).T)
        sd[f"{p}.mlp.down_proj.weight"] = _tt(
            np.asarray(b["fc_out"][i], np.float32).T)
    if not cfg.tied_head:
        sd["lm_head.weight"] = _tt(params["lm_head"])
    model.load_state_dict(sd)
    return model


def to_huggingface(params, cfg) -> "Any":
    """Export a params tree to a torch `transformers` model — the
    inverse of `from_huggingface` (round-trip tested to exact logit
    parity). Dispatches on the config's family: RMSNorm+rope+SwiGLU ->
    llama/mistral (`window` picks mistral), learned+LayerNorm+gelu ->
    GPT-2. Merge adapters first for LoRA/QLoRA fine-tunes
    (`lora_merge` / `qlora_merge`); then
    `to_huggingface(params, cfg).save_pretrained(dir)` hands the model
    to the HF ecosystem (safetensors, hub, vLLM, ...)."""
    if cfg.norm == "rms" and cfg.pos_emb == "rope":
        return to_hf_llama(params, cfg)
    return to_hf_gpt2(params, cfg)
