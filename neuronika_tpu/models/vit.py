"""Vision Transformer (functional/jit tier).

Patch-embed -> [CLS] + learned positions -> pre-LN encoder blocks
(bidirectional attention) -> CLS head. TPU notes:

* Patch embedding is a single reshape + matmul (the unfold is free: a
  (B, H/p, p, W/p, p, C) transpose feeding one (N, p*p*C) x (p*p*C, D)
  dot on the MXU) — never a gather.
* Attention uses the XLA composite deliberately: ViT sequences are tiny
  (e.g. 65 tokens at 32px/4px patches), far below the S>=1024 regime
  where the Pallas flash kernels pay off (docs/PERF.md) — and the
  composite is exactly fused by XLA at these shapes.
* Same dtype policy as models.transformer: bf16 storage/matmuls, f32
  LN stats and logits.

Reference has no ViT (capability extension, like models.resnet).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image: int = 32
    patch: int = 4
    d_model: int = 192
    n_layer: int = 6
    n_head: int = 3
    d_ff: int = 768
    num_classes: int = 10
    dtype: object = jnp.float32

    @property
    def n_patches(self) -> int:
        return (self.image // self.patch) ** 2


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_params(key, cfg: ViTConfig):
    D, F = cfg.d_model, cfg.d_ff
    pdim = cfg.patch * cfg.patch * 3
    ks = iter(jax.random.split(key, 4 + 6 * cfg.n_layer))

    def dense(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.float32)
                * (1.0 / i) ** 0.5).astype(cfg.dtype)

    p = {
        "embed": dense(next(ks), pdim, D),
        "cls": jnp.zeros((1, 1, D), cfg.dtype),
        "pos": (jax.random.normal(next(ks), (cfg.n_patches + 1, D),
                                  jnp.float32) * 0.02).astype(cfg.dtype),
        "ln_f": _ln_init(D),
        "head": {"w": dense(next(ks), D, cfg.num_classes),
                 "b": jnp.zeros((cfg.num_classes,), jnp.float32)},
        "blocks": [],
    }
    for _ in range(cfg.n_layer):
        p["blocks"].append({
            "ln1": _ln_init(D), "ln2": _ln_init(D),
            "qkv": dense(next(ks), D, 3 * D),
            "proj": dense(next(ks), D, D),
            "fc_in": dense(next(ks), D, F),
            "fc_out": dense(next(ks), F, D),
        })
    return p


def _patchify(x, cfg: ViTConfig):
    """(B, H, W, 3) -> (B, n_patches, p*p*3) via transpose only."""
    B, H, W, C = x.shape
    pn = cfg.patch
    x = x.reshape(B, H // pn, pn, W // pn, pn, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // pn) * (W // pn), pn * pn * C)


def _attn(x, blk, cfg: ViTConfig):
    B, S, D = x.shape
    hd = D // cfg.n_head
    qkv = jnp.dot(x, blk["qkv"], preferred_element_type=cfg.dtype)
    q, k, v = jnp.split(qkv.reshape(B, S, 3, cfg.n_head, hd), 3, axis=2)
    q = q[:, :, 0].transpose(0, 2, 1, 3)  # (B, H, S, hd)
    k = k[:, :, 0].transpose(0, 2, 1, 3)
    v = v[:, :, 0].transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) / hd ** 0.5
    att = jax.nn.softmax(att, axis=-1).astype(cfg.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                     preferred_element_type=cfg.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return jnp.dot(out, blk["proj"], preferred_element_type=cfg.dtype)


def forward(params, images, cfg: ViTConfig):
    """images (B, H, W, 3) in [0,1] -> logits (B, num_classes) f32."""
    x = jnp.dot(_patchify(images.astype(cfg.dtype), cfg), params["embed"],
                preferred_element_type=cfg.dtype)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls"], (B, 1, cfg.d_model))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][None]
    for blk in params["blocks"]:
        x = x + _attn(_ln(x, blk["ln1"]), blk, cfg)
        h = jax.nn.gelu(jnp.dot(_ln(x, blk["ln2"]), blk["fc_in"],
                                preferred_element_type=cfg.dtype))
        x = x + jnp.dot(h, blk["fc_out"], preferred_element_type=cfg.dtype)
    cls_out = _ln(x, params["ln_f"])[:, 0].astype(jnp.float32)
    return cls_out @ params["head"]["w"].astype(jnp.float32) \
        + params["head"]["b"]


def loss_fn(params, images, labels, cfg: ViTConfig):
    logits = forward(params, images, cfg)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return (lse - tgt).mean()


def make_train_step(cfg: ViTConfig):
    """Fused fwd+bwd+Adam program (optim.functional rule)."""
    from ..optim.functional import adam_update

    def step(params, opt_state, images, labels, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels,
                                                  cfg)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
