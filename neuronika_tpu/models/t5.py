"""Encoder-decoder (seq2seq) transformer with cross-attention.

Completes the three transformer archetypes on the functional tier:
decoder-only (models/transformer.py), encoder-only (models/bert.py),
and this encoder-decoder. The ENCODER is literally the BERT body
(causal=False GPTConfig — flash/ring/sharding included); the decoder
adds per-layer cross-attention whose keys/values come from the encoder
output. The source embedding table is shared with the target embedding
and the LM head (the T5 convention).

Decoder layers run under one `lax.scan` over stacked params like the
GPT body. Attention routes through the flash kernels when shapes
qualify (cfg.flash, like the GPT tier): self-attention uses the causal
kernel; cross-attention uses the non-causal kernel with Sq != Skv
(the kernel wrappers support mismatched q/kv lengths natively). The
XLA composite remains the fallback and the test oracle.

No reference counterpart (the reference has no attention tier);
SURVEY.md §5 stretch scope.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import transformer as T


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int
    n_layer: int = 4          # per stack (encoder and decoder)
    n_head: int = 8
    d_model: int = 512
    d_ff: int = 2048
    max_src: int = 512
    max_tgt: int = 512
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    # "auto": flash kernels on TPU when shapes qualify; "on" forces them
    # (tests run them in interpret mode); "off" keeps the XLA composite.
    # Self-attention runs the causal kernel; CROSS-attention runs the
    # non-causal kernel with Sq != Skv (supported natively).
    flash: str = "auto"
    flash_block: int = 256

    def encoder_cfg(self) -> T.GPTConfig:
        return T.GPTConfig(
            vocab_size=self.vocab_size, n_layer=self.n_layer,
            n_head=self.n_head, d_model=self.d_model, d_ff=self.d_ff,
            max_seq=self.max_src, dropout=self.dropout, dtype=self.dtype,
            causal=False, flash=self.flash, flash_block=self.flash_block,
        )


def init_params(key, cfg: Seq2SeqConfig) -> Dict:
    """{"encoder": <GPT-body tree>, "decoder": {...}}. The decoder has
    no wte/wpe of its own for the vocabulary — target embedding and the
    LM head read the encoder's wte (T5 weight sharing)."""
    ecfg = cfg.encoder_cfg()
    k_enc, k_dec = jax.random.split(key)
    enc = T.init_params(k_enc, ecfg)

    D, F, L = cfg.d_model, cfg.d_ff, cfg.n_layer
    std = 0.02
    resid_std = std / math.sqrt(2.0 * L)
    keys = jax.random.split(k_dec, 8)

    def norm(k, shape, s=std):
        return (jax.random.normal(k, shape, jnp.float32) * s)

    ln = lambda: {"scale": jnp.ones((L, D), jnp.float32),  # noqa: E731
                  "bias": jnp.zeros((L, D), jnp.float32)}
    dec = {
        "wpe": norm(keys[0], (cfg.max_tgt, D)),
        "blocks": {
            "ln1": ln(), "ln2": ln(), "ln3": ln(),
            "qkv": norm(keys[1], (L, D, 3 * D)),
            "proj": norm(keys[2], (L, D, D), resid_std),
            "xq": norm(keys[3], (L, D, D)),
            "xkv": norm(keys[4], (L, D, 2 * D)),
            "xproj": norm(keys[5], (L, D, D), resid_std),
            "fc_in": norm(keys[6], (L, D, F)),
            "fc_out": norm(keys[7], (L, F, D), resid_std),
        },
        "ln_f": {"scale": jnp.ones((D,), jnp.float32),
                 "bias": jnp.zeros((D,), jnp.float32)},
    }
    return {"encoder": enc, "decoder": dec}


def encode(params, src, cfg: Seq2SeqConfig, *, train=False, key=None):
    """src (B, S) -> encoder memory (B, S, D), bidirectional."""
    h, _ = T.hidden_states(params["encoder"], src, cfg.encoder_cfg(),
                           train=train, key=key)
    return h


def _use_flash(cfg: Seq2SeqConfig, Sq: int, Skv: int) -> bool:
    if cfg.flash == "off":
        return False
    bq = min(cfg.flash_block, Sq)
    bk = min(cfg.flash_block, Skv)
    ok = Sq % bq == 0 and Skv % bk == 0 and Sq >= 8 and Skv >= 8
    if cfg.flash == "on":
        return ok
    import jax as _jax

    return ok and _jax.default_backend() == "tpu" and Sq * Skv >= 1 << 16


def _mha(q, k, v, n_head, *, causal, cfg: Seq2SeqConfig):
    dtype = cfg.dtype
    B, Sq, D = q.shape
    Skv = k.shape[1]
    hd = D // n_head
    q = q.reshape(B, Sq, n_head, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Skv, n_head, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Skv, n_head, hd).transpose(0, 2, 1, 3)
    if _use_flash(cfg, Sq, Skv):
        from ..config import config as _cfg
        from ..ops.pallas.attention import flash_attention

        out = flash_attention(
            q, k, v, causal, None, min(cfg.flash_block, Sq),
            min(cfg.flash_block, Skv), _cfg.pallas_interpret)
    else:
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32) / math.sqrt(hd)
        if causal:
            mask = jnp.tril(jnp.ones((Sq, Skv), bool))
            att = jnp.where(mask, att, -1e30)
        att = jax.nn.softmax(att, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32).astype(dtype)
    out = out.astype(dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, D)


def _res_drop(y, cfg: Seq2SeqConfig, train, key):
    """Residual dropout (decoder): applied to each sub-layer output
    before the residual add, matching the encoder's regularisation."""
    if not train or cfg.dropout == 0.0:
        return y
    keep = jax.random.bernoulli(key, 1.0 - cfg.dropout, y.shape)
    return jnp.where(keep, y / (1.0 - cfg.dropout), 0.0).astype(y.dtype)


def _decoder_block(x, memory, blk, cfg: Seq2SeqConfig, train, key):
    dt = cfg.dtype
    H = cfg.n_head
    k1, k2, k3 = jax.random.split(key, 3)
    # causal self-attention
    h = T._layer_norm(x, blk["ln1"])
    qkv = jnp.dot(h, blk["qkv"].astype(dt), preferred_element_type=dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    a = _mha(q, k, v, H, causal=True, cfg=cfg)
    a = jnp.dot(a, blk["proj"].astype(dt), preferred_element_type=dt)
    x = x + _res_drop(a, cfg, train, k1)
    # cross-attention: queries from the decoder, k/v from encoder memory
    h = T._layer_norm(x, blk["ln2"])
    q = jnp.dot(h, blk["xq"].astype(dt), preferred_element_type=dt)
    kv = jnp.dot(memory, blk["xkv"].astype(dt), preferred_element_type=dt)
    k, v = jnp.split(kv, 2, axis=-1)
    a = _mha(q, k, v, H, causal=False, cfg=cfg)
    a = jnp.dot(a, blk["xproj"].astype(dt), preferred_element_type=dt)
    x = x + _res_drop(a, cfg, train, k2)
    # MLP
    h = T._layer_norm(x, blk["ln3"])
    m = jnp.dot(h, blk["fc_in"].astype(dt), preferred_element_type=dt)
    m = jax.nn.gelu(m)
    m = jnp.dot(m, blk["fc_out"].astype(dt), preferred_element_type=dt)
    return x + _res_drop(m, cfg, train, k3)


def forward(params, src, tgt, cfg: Seq2SeqConfig, *, train=False,
            key=None, memory=None):
    """Teacher-forced decode: (src (B,Ss), tgt (B,St)) -> logits
    (B, St, V). Pass a precomputed `memory` to reuse the encoder pass
    (generation loop)."""
    if key is None:
        key = jax.random.key(0)
    k_enc, k_dec = jax.random.split(key)
    if memory is None:
        memory = encode(params, src, cfg, train=train, key=k_enc)
    dec = params["decoder"]
    B, St = tgt.shape
    wte = params["encoder"]["wte"]
    x = (wte[tgt] + dec["wpe"][:St]).astype(cfg.dtype)
    layer_keys = jax.random.split(k_dec, cfg.n_layer)

    def body(x, blk_key):
        blk, k = blk_key
        return _decoder_block(x, memory, blk, cfg, train, k), None

    x, _ = lax.scan(body, x, (dec["blocks"], layer_keys))
    x = T._layer_norm(x, dec["ln_f"])
    return jnp.dot(x, wte.T.astype(cfg.dtype),
                   preferred_element_type=jnp.float32).astype(jnp.float32)


def loss_fn(params, src, tgt_in, tgt_out, cfg: Seq2SeqConfig, *,
            pad_id: int | None = None, train=False, key=None):
    logits = forward(params, src, tgt_in, cfg, train=train, key=key)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, tgt_out[..., None], axis=-1)[..., 0]
    per = lse - tgt
    if pad_id is not None:
        w = (tgt_out != pad_id).astype(jnp.float32)
        return (per * w).sum() / jnp.maximum(w.sum(), 1.0)
    return per.mean()


def make_train_step(cfg: Seq2SeqConfig, *, pad_id: int | None = None,
                    grad_clip: float = 0.0):
    """Fused fwd+bwd+Adam. step(params, opt, src, tgt_in, tgt_out, lr,
    key) -> (params, opt, loss)."""
    from ..optim.functional import adam_update, clip_by_global_norm

    def step(params, opt_state, src, tgt_in, tgt_out, lr, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, src, tgt_in, tgt_out, cfg, pad_id=pad_id,
            train=True, key=key)
        if grad_clip > 0.0:
            grads, _ = clip_by_global_norm(grads, grad_clip)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def greedy_generate(params, src, cfg: Seq2SeqConfig, *, bos_id: int,
                    eos_id: int | None = None, max_new: int = 64):
    """Greedy decode with the encoder memory computed once. The decoder
    re-runs teacher-forced over the grown prefix each step (one compiled
    program per emitted length — fine at seq2seq output lengths; the
    KV-cached high-throughput path is the decoder-only tier)."""
    import numpy as np

    memory = encode(params, src, cfg)
    B = src.shape[0]
    out = np.full((B, 1), bos_id, np.int32)
    fwd = jax.jit(
        lambda p, m, t: forward(p, None, t, cfg, memory=m)[:, -1].argmax(-1)
    )
    done = np.zeros(B, bool)
    for _ in range(max_new):
        nxt = np.asarray(fwd(params, memory, jnp.asarray(out)))
        if eos_id is not None:
            nxt = np.where(done, eos_id, nxt)
            done |= nxt == eos_id
        out = np.concatenate([out, nxt[:, None].astype(np.int32)], axis=1)
        if eos_id is not None and done.all():
            break
    return out
