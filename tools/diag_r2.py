"""Round-2 diagnostic: where does the train step's time go?

Ablations at the flagship config (d768 L8 H6 S1024 B64 bf16 flash512):
fwd-only vs fwd+bwd vs full step; body-only vs with-head; flash vs
composite. Plus the (fixed) kernel rooflines. ONE process, never killed.

Run: nohup env PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_r2.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp

from tools.sweep_r2 import PEAK, kernel_rooflines, report, timed


def train_ablations():
    from neuronika_tpu.models import transformer as T

    base = dict(
        vocab_size=16384, n_layer=8, n_head=6, d_model=768, d_ff=3072,
        max_seq=1024, dropout=0.0, dtype=jnp.bfloat16, flash="auto",
        remat=True, flash_block=512,
    )
    B, S = 64, 1024
    cfg = T.GPTConfig(**base)
    params = T.init_params(jax.random.key(0), cfg)
    tok = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.key(2), (B, S), 0, cfg.vocab_size)
    fwd_fl = T.flops_per_token(cfg, S) / 3 * B * S  # fwd-only model flops
    step_fl = T.flops_per_token(cfg, S) * B * S

    # body-only forward flops (no head matmul)
    p_block = 3 * cfg.d_model**2 + cfg.d_model**2 + 2 * cfg.d_model * cfg.d_ff
    body_fl = (2 * cfg.n_layer * p_block
               + cfg.n_layer * 2 * S * cfg.d_model) * B * S
    head_fl = 2 * cfg.vocab_size * cfg.d_model * B * S

    def run(name, fn, flops, *args):
        try:
            dt = timed(jax.jit(fn), *args)
            report(name, flops, dt)
            return dt
        except Exception:
            traceback.print_exc()
            return None

    key = jax.random.key(3)

    # 1. fwd-only, full loss (train=False -> no remat wrapper)
    run("fwd loss (eval mode, flash)", lambda p: T.loss_fn(
        p, tok, tgt, cfg, train=False, key=key), fwd_fl, params)

    # 2. fwd-only, body only (no head/CE)
    run("fwd body-only (eval, flash)", lambda p: T.hidden_states(
        p, tok, cfg, train=False, key=key)[0].astype(jnp.float32).mean(),
        body_fl, params)

    # 3. fwd+bwd, full loss, remat full (no Adam)
    gfull = jax.grad(lambda p: T.loss_fn(p, tok, tgt, cfg, train=True,
                                         key=key))
    run("fwd+bwd full-remat (no opt)", lambda p: sum(
        l.astype(jnp.float32).sum() for l in jax.tree.leaves(gfull(p))),
        step_fl, params)

    # 4. fwd+bwd body-only
    gbody = jax.grad(lambda p: T.hidden_states(
        p, tok, cfg, train=True, key=key)[0].astype(jnp.float32).mean())
    run("fwd+bwd body-only full-remat", lambda p: sum(
        l.astype(jnp.float32).sum() for l in jax.tree.leaves(gbody(p))),
        3 * body_fl, params)

    # 5. fwd+bwd body-only, flash policy (no flash recompute)
    import dataclasses
    cfgf = dataclasses.replace(cfg, remat_policy="flash")
    gbodyf = jax.grad(lambda p: T.hidden_states(
        p, tok, cfgf, train=True, key=key)[0].astype(jnp.float32).mean())
    run("fwd+bwd body-only flash-policy", lambda p: sum(
        l.astype(jnp.float32).sum() for l in jax.tree.leaves(gbodyf(p))),
        3 * body_fl, params)

    # 6. fwd+bwd body-only composite attention
    cfgc = dataclasses.replace(cfg, flash="off")
    gbodyc = jax.grad(lambda p: T.hidden_states(
        p, tok, cfgc, train=True, key=key)[0].astype(jnp.float32).mean())
    run("fwd+bwd body-only xla-attn", lambda p: sum(
        l.astype(jnp.float32).sum() for l in jax.tree.leaves(gbodyc(p))),
        3 * body_fl, params)

    # 7. head+CE only: fwd+bwd of the LM head on a fixed hidden state
    x = jax.random.normal(jax.random.key(4), (B, S, cfg.d_model),
                          jnp.bfloat16)

    def head_loss(wte, x):
        logits = jnp.dot(x, wte.T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        t = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
        return (lse - t).mean()

    ghead = jax.grad(head_loss, argnums=(0, 1))
    run("head+CE fwd+bwd", lambda w, x: sum(
        l.astype(jnp.float32).sum() for l in ghead(w, x)),
        3 * head_fl, params["wte"], x)

    # 8. full train step (fwd+bwd+Adam) — the bench number
    step = T.make_train_step(cfg)
    opt = T.adam_init(params)
    state = {"p": params, "o": opt}

    def one(tok, tgt):
        state["p"], state["o"], loss = step(
            state["p"], state["o"], tok, tgt, jnp.float32(3e-4), key)
        return loss

    try:
        dt = timed(one, tok, tgt)
        report("FULL train step B64 flash512 remat", step_fl, dt)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    kernel_rooflines()
    train_ablations()
