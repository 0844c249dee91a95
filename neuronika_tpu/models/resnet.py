"""ResNet (functional/jit tier) — NHWC, GroupNorm, TPU-first.

A conv model family built the same way as models.transformer: pure
functions over a param pytree + a fused train step. Design choices for
TPU (not in the reference, which ships no conv models beyond the MNIST
example — BASELINE.md configs[1]):

* NHWC layout + HWIO kernels: the channel dim lands on the 128-wide lane
  axis of the MXU conv tiling (NCHW forces a relayout on TPU).
* GroupNorm instead of BatchNorm: no running stats to thread through jit
  or shard; identical math train/eval; batch-size independent — the
  standard choice when the define-by-run tier isn't in play.
* bf16 storage with f32 GN stats and f32 logits, mirroring the
  transformer's dtype policy.

Reference counterpart for the conv stack: the Conv2d layer kit
(neuronika/src/nn/mod.rs:472-520) exercised by examples; this module is
a capability extension, cited in PARITY.md as such.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stages: Tuple[int, ...] = (2, 2, 2, 2)   # blocks per stage (resnet18)
    width: int = 64                           # stem channels
    num_classes: int = 10
    groups: int = 8                           # GroupNorm groups
    stem: str = "cifar"                       # "cifar" 3x3/s1 | "imagenet" 7x7/s2
    dtype: object = jnp.float32
    conv_impl: str = "xla"                    # "xla" | "pallas" (direct kernel)


def _conv(x, w, stride=1, impl="xla"):
    if impl == "pallas":
        # direct Pallas kernel, NHWC end-to-end — no boundary transposes
        # (strided convs phase-decompose onto the same stride-1 kernel;
        # backward runs the Pallas dx/dw kernels for stride 1)
        from ..config import config as _cfg
        from ..ops.pallas.conv import conv2d_pallas_nhwc

        return conv2d_pallas_nhwc(x, w, (stride, stride), "SAME",
                                  _cfg.pallas_interpret)
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _gn(x, p, groups, eps=1e-5):
    B, H, W, C = x.shape
    g = min(groups, C)
    x32 = x.astype(jnp.float32).reshape(B, H, W, g, C // g)
    mu = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = ((x32 - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mu) * lax.rsqrt(var + eps)
    return (x32.reshape(B, H, W, C) * p["scale"] + p["bias"]).astype(x.dtype)


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _he(key, shape, dtype):
    fan_in = shape[0] * shape[1] * shape[2]
    return (jax.random.normal(key, shape, jnp.float32)
            * (2.0 / fan_in) ** 0.5).astype(dtype)


def init_params(key, cfg: ResNetConfig):
    keys = iter(jax.random.split(key, 4 + 2 * sum(cfg.stages) * 3))
    dt = cfg.dtype
    p = {}
    kstem = (3, 3) if cfg.stem == "cifar" else (7, 7)
    p["stem"] = {"w": _he(next(keys), (*kstem, 3, cfg.width), dt),
                 "gn": _gn_init(cfg.width)}
    c_in = cfg.width
    stages = []
    for si, n_blocks in enumerate(cfg.stages):
        c_out = cfg.width * (2 ** si)
        blocks = []
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            blk = {
                "w1": _he(next(keys), (3, 3, c_in, c_out), dt),
                "gn1": _gn_init(c_out),
                "w2": _he(next(keys), (3, 3, c_out, c_out), dt),
                "gn2": _gn_init(c_out),
            }
            if stride != 1 or c_in != c_out:
                blk["proj"] = _he(next(keys), (1, 1, c_in, c_out), dt)
            blocks.append(blk)
            c_in = c_out
        stages.append(blocks)
    p["stages"] = stages
    p["head"] = {
        "w": (jax.random.normal(next(keys), (c_in, cfg.num_classes),
                                jnp.float32) / c_in ** 0.5).astype(dt),
        "b": jnp.zeros((cfg.num_classes,), jnp.float32),
    }
    return p


def _block(x, blk, cfg, stride):
    h = _conv(x, blk["w1"], stride, cfg.conv_impl)
    h = jax.nn.relu(_gn(h, blk["gn1"], cfg.groups))
    h = _conv(h, blk["w2"], 1, cfg.conv_impl)
    h = _gn(h, blk["gn2"], cfg.groups)
    if "proj" in blk:
        x = _conv(x, blk["proj"], stride, cfg.conv_impl)
    return jax.nn.relu(x + h)


def forward(params, x, cfg: ResNetConfig):
    """x (B, H, W, 3) float in [0,1] -> logits (B, num_classes) f32."""
    x = x.astype(cfg.dtype)
    stride = 1 if cfg.stem == "cifar" else 2
    x = jax.nn.relu(_gn(_conv(x, params["stem"]["w"], stride, cfg.conv_impl),
                        params["stem"]["gn"], cfg.groups))
    if cfg.stem == "imagenet":
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for si, blocks in enumerate(params["stages"]):
        for bi, blk in enumerate(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            x = _block(x, blk, cfg, stride)
    x = x.mean(axis=(1, 2)).astype(jnp.float32)  # global average pool
    return x @ params["head"]["w"].astype(jnp.float32) + params["head"]["b"]


def loss_fn(params, x, labels, cfg: ResNetConfig):
    logits = forward(params, x, cfg)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return (lse - tgt).mean()


def make_train_step(cfg: ResNetConfig, momentum: float = 0.9,
                    weight_decay: float = 0.0):
    """Fused fwd+bwd+SGD(momentum, decoupled weight decay) program."""

    def step(params, buf, x, labels, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, labels, cfg)
        buf = jax.tree.map(lambda b, g: b * momentum + g.astype(b.dtype),
                           buf, grads)
        params = jax.tree.map(
            lambda p, b: p - (lr * (b + weight_decay * p.astype(b.dtype))
                              ).astype(p.dtype),
            params, buf)
        return params, buf, loss

    return jax.jit(step, donate_argnums=(0, 1))


def momentum_init(params):
    return jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
