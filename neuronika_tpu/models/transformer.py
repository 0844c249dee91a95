"""Mini GPT-2-style transformer — the flagship model (BASELINE.md configs[4]).

Two tiers, same math:

* this module: the **pure-functional TPU perf path** — params as a pytree,
  one jitted (optionally pjit-sharded) train step, bf16 matmuls with f32
  accumulation, causal attention built from the same primitive formulas the
  define-by-run ops implement (softmax/matmul — the reference has no
  attention op, SURVEY.md §5; this is the stretch config built from
  primitives).
* `build_var_model()` below: the same block expressed through the
  define-by-run `Var`/`VarDiff` API for parity demonstration.

Sharding (see `neuronika_tpu.parallel`): batch over the `dp` mesh axis;
attention heads and MLP hidden over `tp` (Megatron-style column/row split:
QKV and MLP-in are column-parallel, attn-proj and MLP-out row-parallel, so
each block needs a single all-reduce per sub-layer which GSPMD inserts from
the param shardings).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 256
    n_layer: int = 4
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    max_seq: int = 256
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16  # compute dtype; params live in f32
    # "auto": use the Pallas flash-attention kernel on TPU when the shape
    # qualifies; "on"/"off" force it. Attention-dropout always uses the
    # composite path (the flash kernel does not sample a mask).
    flash: str = "auto"


# --------------------------------------------------------------------------
# params


def init_params(key, cfg: GPTConfig) -> Dict:
    """GPT-2 style init: N(0, 0.02), residual projections scaled by
    1/sqrt(2*n_layer)."""
    keys = jax.random.split(key, 4 + cfg.n_layer)
    std = 0.02
    resid_std = std / math.sqrt(2.0 * cfg.n_layer)

    def norm(k, shape, s=std):
        return (s * jax.random.normal(k, shape)).astype(jnp.float32)

    params = {
        "wte": norm(keys[0], (cfg.vocab_size, cfg.d_model)),
        "wpe": norm(keys[1], (cfg.max_seq, cfg.d_model)),
        "ln_f": {"scale": jnp.ones(cfg.d_model), "bias": jnp.zeros(cfg.d_model)},
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        k = jax.random.split(keys[4 + i], 4)
        params["blocks"].append(
            {
                "ln1": {"scale": jnp.ones(cfg.d_model), "bias": jnp.zeros(cfg.d_model)},
                "ln2": {"scale": jnp.ones(cfg.d_model), "bias": jnp.zeros(cfg.d_model)},
                "qkv": norm(k[0], (cfg.d_model, 3 * cfg.d_model)),
                "qkv_b": jnp.zeros(3 * cfg.d_model),
                "proj": norm(k[1], (cfg.d_model, cfg.d_model), resid_std),
                "proj_b": jnp.zeros(cfg.d_model),
                "fc_in": norm(k[2], (cfg.d_model, cfg.d_ff)),
                "fc_in_b": jnp.zeros(cfg.d_ff),
                "fc_out": norm(k[3], (cfg.d_ff, cfg.d_model), resid_std),
                "fc_out_b": jnp.zeros(cfg.d_model),
            }
        )
    return params


def param_shardings(mesh, cfg: GPTConfig) -> Dict:
    """Megatron-style tp layout + replicated small params."""

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    rep = ns()
    block = {
        "ln1": {"scale": rep, "bias": rep},
        "ln2": {"scale": rep, "bias": rep},
        "qkv": ns(None, "tp"),
        "qkv_b": ns("tp"),
        "proj": ns("tp", None),
        "proj_b": rep,
        "fc_in": ns(None, "tp"),
        "fc_in_b": ns("tp"),
        "fc_out": ns("tp", None),
        "fc_out_b": rep,
    }
    return {
        "wte": ns(None, "tp"),
        "wpe": rep,
        "ln_f": {"scale": rep, "bias": rep},
        "blocks": [block for _ in range(cfg.n_layer)],
    }


# --------------------------------------------------------------------------
# forward


def _layer_norm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def _use_flash(cfg: GPTConfig, S: int, train: bool) -> bool:
    if cfg.flash == "off":
        return False
    if train and cfg.dropout > 0.0:
        return False  # attention-dropout only on the composite path
    if cfg.flash == "on":
        return True
    from ..config import on_tpu

    return on_tpu() and S >= 128 and S % 128 == 0


def _attention(x, blk, cfg: GPTConfig, dropout_key, train):
    B, S, D = x.shape
    H = cfg.n_head
    hd = D // H
    qkv = jnp.dot(x, blk["qkv"].astype(cfg.dtype), preferred_element_type=jnp.float32)
    qkv = (qkv + blk["qkv_b"]).astype(cfg.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    if _use_flash(cfg, S, train):
        from ..ops.pallas.attention import flash_attention

        bq = bk = min(256, S)
        out = flash_attention(q, k, v, True, None, bq, bk, False)
    else:
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        att = att / math.sqrt(hd)
        mask = jnp.tril(jnp.ones((S, S), bool))
        att = jnp.where(mask, att, -1e30)
        att = jax.nn.softmax(att, axis=-1).astype(cfg.dtype)
        if train and cfg.dropout > 0.0:
            keep = jax.random.bernoulli(dropout_key, 1.0 - cfg.dropout, att.shape)
            att = jnp.where(keep, att / (1.0 - cfg.dropout), 0.0)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
    out = out.astype(cfg.dtype).transpose(0, 2, 1, 3).reshape(B, S, D)
    out = jnp.dot(out, blk["proj"].astype(cfg.dtype), preferred_element_type=jnp.float32)
    return (out + blk["proj_b"]).astype(cfg.dtype)


def _mlp(x, blk, cfg: GPTConfig):
    h = jnp.dot(x, blk["fc_in"].astype(cfg.dtype), preferred_element_type=jnp.float32)
    h = jax.nn.gelu((h + blk["fc_in_b"]).astype(cfg.dtype))
    o = jnp.dot(h, blk["fc_out"].astype(cfg.dtype), preferred_element_type=jnp.float32)
    return (o + blk["fc_out_b"]).astype(cfg.dtype)


def forward(params, tokens, cfg: GPTConfig, *, train: bool = False, key=None):
    """tokens (B, S) int32 -> logits (B, S, V)."""
    B, S = tokens.shape
    x = params["wte"][tokens] + params["wpe"][:S]
    x = x.astype(cfg.dtype)
    if key is None:
        key = jax.random.key(0)
    for i, blk in enumerate(params["blocks"]):
        k1 = jax.random.fold_in(key, i)
        x = x + _attention(_layer_norm(x, **blk["ln1"]), blk, cfg, k1, train)
        x = x + _mlp(_layer_norm(x, **blk["ln2"]), blk, cfg)
    x = _layer_norm(x, **params["ln_f"])
    logits = jnp.dot(
        x, params["wte"].T.astype(cfg.dtype), preferred_element_type=jnp.float32
    )
    return logits


def loss_fn(params, tokens, targets, cfg: GPTConfig, *, train=False, key=None):
    logits = forward(params, tokens, cfg, train=train, key=key)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, cfg.vocab_size, dtype=jnp.float32)
    return -(onehot * logp).sum(-1).mean()


# --------------------------------------------------------------------------
# training step (pure Adam, reference update rule — adam/mod.rs:117-160)


def adam_init(params):
    # m and v must be distinct buffers (donation forbids aliased arguments)
    return {
        "m": jax.tree.map(jnp.zeros_like, params),
        "v": jax.tree.map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.float32),
    }


def adam_update(params, grads, state, lr, b1=0.9, b2=0.999, eps=1e-8):
    step = state["step"] + 1.0
    bc1 = 1.0 - b1**step
    bc2 = 1.0 - b2**step
    m = jax.tree.map(lambda m_, g: m_ * b1 + g * (1 - b1), state["m"], grads)
    v = jax.tree.map(lambda v_, g: v_ * b2 + g * g * (1 - b2), state["v"], grads)
    new = jax.tree.map(
        lambda p, m_, v_: p - m_ / (jnp.sqrt(v_) / jnp.sqrt(bc2) + eps) * (lr / bc1),
        params, m, v,
    )
    return new, {"m": m, "v": v, "step": step}


def make_train_step(cfg: GPTConfig):
    """One fused jitted program: fwd + bwd + Adam update."""

    def step(params, opt_state, tokens, targets, lr, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, targets, cfg, train=True, key=key
        )
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_sharded_train_step(mesh, cfg: GPTConfig):
    """pjit variant: dp-sharded batch, tp-sharded weights; XLA inserts the
    psum/all-gather collectives over ICI from the shardings."""
    shard = param_shardings(mesh, cfg)
    opt_shard = {"m": shard, "v": shard, "step": NamedSharding(mesh, P())}
    data_shard = NamedSharding(mesh, P("dp", None))
    rep = NamedSharding(mesh, P())

    def step(params, opt_state, tokens, targets, lr, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, targets, cfg, train=True, key=key
        )
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(shard, opt_shard, data_shard, data_shard, rep, rep),
        out_shardings=(shard, opt_shard, rep),
        donate_argnums=(0, 1),
    )


def flops_per_token(cfg: GPTConfig, seq: int) -> float:
    """Training FLOPs/token (fwd+bwd ≈ 3x fwd; fwd ≈ 2·params + attention)."""
    p_block = 3 * cfg.d_model**2 + cfg.d_model**2 + 2 * cfg.d_model * cfg.d_ff
    p_matmul = cfg.n_layer * p_block + cfg.vocab_size * cfg.d_model
    attn = cfg.n_layer * 2 * seq * cfg.d_model  # qk^T + att*v per token
    return 3.0 * (2.0 * p_matmul + 2.0 * attn)


# --------------------------------------------------------------------------
# define-by-run parity tier


def build_var_model(cfg: GPTConfig, batch: int, seq: int):
    """The same transformer block expressed with the `Var`/`VarDiff` API —
    attention built from the primitive softmax/matmul ops, demonstrating the
    stretch config of BASELINE.md with the reference's own API surface.

    Returns (params, forward_fn) where forward_fn maps one-hot token
    variables (B·S, V) to logits. Kept small: the Var API is 2-d oriented
    (like the reference's Ix2-heavy nn layer kit), so this flattens batch
    and sequence and uses a single head."""
    import neuronika_tpu as nk

    d = cfg.d_model
    wte = nk.rand((cfg.vocab_size, d)).requires_grad()
    wq = nk.rand((d, d)).requires_grad()
    wk = nk.rand((d, d)).requires_grad()
    wv = nk.rand((d, d)).requires_grad()
    wo = nk.rand((d, cfg.vocab_size)).requires_grad()
    params = [wte, wq, wk, wv, wo]

    def fwd(onehot_tokens):
        x = onehot_tokens.mm(wte)          # (S, d) embeddings via matmul
        q = x.mm(wq)
        k = x.mm(wk)
        v = x.mm(wv)
        att = q.mm(k.t()) * (1.0 / math.sqrt(d))
        att = att.softmax(1)
        ctx = att.mm(v)
        return ctx.mm(wo)

    return params, fwd
