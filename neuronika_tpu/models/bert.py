"""BERT-family bidirectional encoder on the functional transformer tier.

Reuses the whole GPT body (models/transformer.py) with `causal=False`
— every attention path (flash split/packed kernels, ring, composite)
drops the causal mask, so encoder training gets the same Pallas/remat/
sharding machinery as the decoder for free. This module adds the
encoder-specific pieces: masked-LM corruption + loss, pooling, and a
sequence-classification head.

No reference counterpart (the reference has no attention/transformer
tier at all); scoped under SURVEY.md §5's long-context/attention
stretch row.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import transformer as T


def bert_config(**kw) -> T.GPTConfig:
    """Encoder preset: bidirectional attention, learned positions,
    post-LN-free (the body is pre-LN — the modern encoder layout),
    tied MLM head on wte."""
    base: Dict[str, Any] = dict(causal=False)
    base.update(kw)
    return T.GPTConfig(**base)


def encode(params, tokens, cfg: T.GPTConfig, *, train: bool = False,
           key=None, mesh=None):
    """tokens (B, S) -> final (LN'd) hidden states (B, S, D),
    bidirectional. MoE aux losses (if any) are dropped here; the train
    steps below use the aux-carrying internal path."""
    h, _ = T.hidden_states(params, tokens, cfg, train=train, key=key,
                           mesh=mesh)
    return h


def pool(hidden, mode: str = "mean"):
    """(B, S, D) -> (B, D). "mean" over positions or "cls" (position 0 —
    prepend your [CLS] token)."""
    if mode == "mean":
        return hidden.mean(axis=1)
    if mode == "cls":
        return hidden[:, 0]
    raise ValueError(f"unknown pooling mode {mode!r}")


def mask_tokens(key, tokens, mask_id: int, vocab_size: int,
                rate: float = 0.15) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """BERT 80/10/10 corruption: of the `rate` selected positions, 80%
    become `mask_id`, 10% a uniform random token, 10% stay. Returns
    (corrupted_tokens, labels, weights) where weights is 1.0 exactly at
    selected positions (the MLM loss runs only there)."""
    k_sel, k_kind, k_rand = jax.random.split(key, 3)
    selected = jax.random.bernoulli(k_sel, rate, tokens.shape)
    kind = jax.random.uniform(k_kind, tokens.shape)
    rand_tok = jax.random.randint(k_rand, tokens.shape, 0, vocab_size)
    corrupted = jnp.where(
        selected & (kind < 0.8), mask_id,
        jnp.where(selected & (kind >= 0.9), rand_tok, tokens),
    )
    return corrupted, tokens, selected.astype(jnp.float32)


def mlm_loss_fn(params, tokens, labels, weights, cfg: T.GPTConfig, *,
                train: bool = False, key=None, mesh=None):
    """Mean CE over the positions where weights == 1 (masked positions).
    Logits come from the tied wte head, like the decoder's loss_fn."""
    h, aux = T.hidden_states(params, tokens, cfg, train=train, key=key,
                             mesh=mesh)
    head = (params["wte"] if cfg.tied_head else params["lm_head"])
    logits = jnp.dot(h, head.T.astype(cfg.dtype),
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    per_pos = lse - tgt
    denom = jnp.maximum(weights.sum(), 1.0)
    return (per_pos * weights).sum() / denom + aux


def make_mlm_train_step(cfg: T.GPTConfig, *, mask_id: int | None = None,
                        mask_rate: float = 0.15):
    """Fused MLM pre-training step: corrupt inside the jitted program,
    fwd+bwd on masked positions, Adam update. Signature:
    step(params, opt_state, tokens, lr, key) -> (params, opt, loss)."""
    from ..optim.functional import adam_update

    mid = cfg.vocab_size - 1 if mask_id is None else mask_id

    def step(params, opt_state, tokens, lr, key):
        k_mask, k_drop = jax.random.split(key)
        corrupted, labels, weights = mask_tokens(
            k_mask, tokens, mid, cfg.vocab_size, mask_rate)
        loss, grads = jax.value_and_grad(mlm_loss_fn)(
            params, corrupted, labels, weights, cfg, train=True,
            key=k_drop)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


# ----------------------------------------------------------- classification


def init_classifier(key, cfg: T.GPTConfig, n_classes: int) -> Dict:
    """(D, C) head + bias for pooled sequence classification."""
    w = jax.random.normal(key, (cfg.d_model, n_classes), jnp.float32) * 0.02
    return {"w": w, "b": jnp.zeros((n_classes,), jnp.float32)}


def classify(params, head, tokens, cfg: T.GPTConfig, *,
             pooling: str = "mean", train: bool = False, key=None):
    h = encode(params, tokens, cfg, train=train, key=key)
    p = pool(h, pooling).astype(jnp.float32)
    return p @ head["w"] + head["b"]


def make_classifier_train_step(cfg: T.GPTConfig, n_classes: int, *,
                               pooling: str = "mean"):
    """Fine-tune encoder + head jointly with softmax CE. Signature:
    step(params, head, opt_state, tokens, labels, lr, key) ->
    (params, head, opt_state, loss), with opt_state initialised as
    adam_init((params, head)) — ONE optimizer state over the pair."""
    from ..optim.functional import adam_update

    def loss_fn(both, tokens, labels, key):
        params, head = both
        logits = classify(params, head, tokens, cfg, pooling=pooling,
                          train=True, key=key)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return (lse - tgt).mean()

    def step(params, head, opt_state, tokens, labels, lr, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            (params, head), tokens, labels, key)
        (params, head), opt_state = adam_update(
            (params, head), grads, opt_state, lr)
        return params, head, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))
