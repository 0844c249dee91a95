"""LoRA fine-tuning for the functional transformer tier.

Low-rank adapters (Hu et al. 2021) on the stacked per-layer weight
leaves: each targeted (L, in, out) tensor gets A (L, in, r) and
B (L, r, out), with the effective weight W + (alpha/r)·A·B.

TPU-first design choice — **merge-on-the-fly** instead of use-site
injection: the adapter product is folded into the (frozen) base weights
once per step as a pair of small stacked matmuls, and the merged tree
then flows through the UNCHANGED forward / flash / remat / sharded
paths. The merge costs L·in·out·r MACs per step (r/S_tokens of one
forward pass — noise at fine-tuning batch sizes), buys zero model
surgery, and keeps the hot path identical to full training, so every
kernel-level optimisation applies to LoRA runs automatically.

No reference counterpart (the reference has no adapter tier); cited
against SURVEY.md §5's training-workflow scope.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import transformer as T

DEFAULT_TARGETS = ("qkv", "proj")


def lora_init(key, params, rank: int,
              targets: Tuple[str, ...] = DEFAULT_TARGETS) -> Dict:
    """A ~ N(0, 1/r), B = 0 — the adapted model starts exactly equal to
    the base model. `targets` name stacked (L, in, out) leaves of
    params["blocks"] ("qkv", "proj", "fc_in", "fc_out", "fc_gate")."""
    lora = {}
    keys = jax.random.split(key, len(targets))
    for k, name in zip(keys, targets):
        if name not in params["blocks"]:
            raise ValueError(f"unknown LoRA target {name!r}; have "
                             f"{sorted(params['blocks'])}")
        w = params["blocks"][name]
        if w.ndim != 3:
            raise ValueError(
                f"LoRA target {name!r} has shape {w.shape}; only stacked "
                "(n_layer, in, out) leaves can carry adapters (MoE expert "
                "tensors are not supported)")
        L, d_in, d_out = w.shape
        lora[name] = {
            "A": (jax.random.normal(k, (L, d_in, rank), jnp.float32)
                  / jnp.sqrt(rank)),
            "B": jnp.zeros((L, rank, d_out), jnp.float32),
        }
    return lora


def lora_apply(params, lora, alpha: float = 8.0):
    """Merged tree: base + (alpha/r)·A·B on every adapted leaf. The base
    leaves stay untouched (a new tree is returned)."""
    blocks = dict(params["blocks"])
    for name, ab in lora.items():
        rank = ab["A"].shape[-1]
        delta = jnp.einsum("lir,lro->lio", ab["A"], ab["B"],
                           preferred_element_type=jnp.float32)
        w = blocks[name]
        blocks[name] = (w.astype(jnp.float32)
                        + delta * (alpha / rank)).astype(w.dtype)
    out = dict(params)
    out["blocks"] = blocks
    return out


def lora_merge(params, lora, alpha: float = 8.0):
    """Fold the adapters into the base weights for export/serving —
    identical numbers to `lora_apply`, returned as a plain params tree
    with no LoRA state."""
    return lora_apply(params, lora, alpha)


def lora_param_count(lora) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))


def make_lora_train_step(cfg: T.GPTConfig, *, alpha: float = 8.0,
                         grad_clip: float = 0.0):
    """Fused fine-tuning step: fwd+bwd through the merged weights with
    the BASE TREE FROZEN (stop_gradient) — gradients and Adam state
    exist only for the adapters. Signature:
    step(params, lora, opt_state, tokens, targets, lr, key)
    -> (lora, opt_state, loss). Init opt_state with adam_init(lora)."""
    from ..optim.functional import adam_update, clip_by_global_norm

    def loss_of(lora, params, tokens, targets, key):
        merged = lora_apply(jax.lax.stop_gradient(params), lora, alpha)
        return T.loss_fn(merged, tokens, targets, cfg, train=True, key=key)

    def step(params, lora, opt_state, tokens, targets, lr, key):
        loss, grads = jax.value_and_grad(loss_of)(
            lora, params, tokens, targets, key)
        if grad_clip > 0.0:
            grads, _ = clip_by_global_norm(grads, grad_clip)
        lora, opt_state = adam_update(lora, grads, opt_state, lr)
        return lora, opt_state, loss

    return jax.jit(step, donate_argnums=(1, 2))


# --------------------------------------------------------------------------
# QLoRA: adapters over an int4-quantized frozen base (Dettmers et al.
# 2023, mapped onto this repo's serving quantizer instead of NF4)

QLORA_QUANT_LEAVES = ("qkv", "proj", "fc_in", "fc_out", "fc_gate")


def qlora_quantize_base(params) -> Dict:
    """Freeze the base for QLoRA fine-tuning: every stacked (L, in, out)
    matmul leaf is stored group-wise int4 (`transformer._quant_w4` —
    packed nibbles + per-128-group f32 scales, ~4.25 bits/weight = 7.5x
    smaller than f32), embeddings / norms / biases / untied head stay
    f32. The PERSISTENT training state then is: int4 base + f32
    adapters + adapter Adam moments — the f32 master weights and their
    optimizer state, the dominant fine-tuning memory, are gone. (The
    transient bf16 merged tree during a step is unchanged vs LoRA.)"""
    blocks = dict(params["blocks"])
    for name in QLORA_QUANT_LEAVES:
        w = blocks.get(name)
        if w is not None and not isinstance(w, dict) and w.ndim == 3:
            blocks[name] = T._quant_w4(w)
    out = dict(params)
    out["blocks"] = blocks
    return out


def qlora_apply(qparams, lora, alpha: float = 8.0,
                dtype=jnp.bfloat16):
    """Merged compute tree from a quantized base: dequantize each int4
    leaf to `dtype` (`transformer.dequant_w4`) and add the adapter
    delta — the QLoRA forward is the plain forward over this tree, so
    flash/remat/sharding apply unchanged (the same merge-on-the-fly
    stance as `lora_apply`)."""
    blocks = dict(qparams["blocks"])
    for name, w in list(blocks.items()):
        if isinstance(w, dict) and "q4p" in w:
            blocks[name] = T.dequant_w4(w, dtype)
    for name, ab in lora.items():
        rank = ab["A"].shape[-1]
        delta = jnp.einsum("lir,lro->lio", ab["A"], ab["B"],
                           preferred_element_type=jnp.float32)
        w = blocks[name]
        blocks[name] = (w.astype(jnp.float32)
                        + delta * (alpha / rank)).astype(w.dtype)
    out = dict(qparams)
    out["blocks"] = blocks
    return out


def make_qlora_train_step(cfg: T.GPTConfig, *, alpha: float = 8.0,
                          grad_clip: float = 0.0):
    """QLoRA fine-tuning step — `make_lora_train_step` over a
    `qlora_quantize_base` tree: step(qparams, lora, opt_state, tokens,
    targets, lr, key) -> (lora, opt_state, loss). Gradients flow
    through the dequantize (a linear rescale) into the adapters only;
    the int4 base is frozen by construction (integer leaves carry no
    tangents) and never materialises in f32."""
    from ..optim.functional import adam_update, clip_by_global_norm

    def loss_of(lora, qparams, tokens, targets, key):
        merged = qlora_apply(jax.lax.stop_gradient(qparams), lora, alpha,
                             dtype=cfg.dtype)
        return T.loss_fn(merged, tokens, targets, cfg, train=True, key=key)

    def step(qparams, lora, opt_state, tokens, targets, lr, key):
        loss, grads = jax.value_and_grad(loss_of)(
            lora, qparams, tokens, targets, key)
        if grad_clip > 0.0:
            grads, _ = clip_by_global_norm(grads, grad_clip)
        lora, opt_state = adam_update(lora, grads, opt_state, lr)
        return lora, opt_state, loss

    return jax.jit(step, donate_argnums=(1, 2))


def qlora_merge(qparams, lora, alpha: float = 8.0, dtype=jnp.bfloat16):
    """Export: dequantized base + adapters as a plain params tree
    (identical numbers to the training-time merged tree)."""
    return qlora_apply(qparams, lora, alpha, dtype=dtype)
