"""Body micro-ablation at the champion shape (B48 S1024 d768 dff3072 H6).

Times each piece of a transformer block fwd+bwd in isolation so the body's
0.668 MFU (vs matmul 0.94) can be attributed: raw XLA matmuls, MLP with and
without GELU, LayerNorm, attention, and the assembled block. ONE process.

Run: timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/diag_body.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12
B, S, D, F, H = 48, 1024, 768, 3072, 6
N = B * S


def chain_time(step_fn, x0, iters=24, reps=5):
    def loop(n):
        return jax.jit(
            lambda x: lax.fori_loop(0, n, lambda i, x: step_fn(x), x))
    f1, f4 = loop(iters), loop(4 * iters)

    def run(f, x):
        leaf = jax.tree.leaves(f(x))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(f1, x0); run(f4, x0)
    t1s, t4s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(f1, x0); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(f4, x0); t4s.append(time.perf_counter() - t0)
    return max(sorted(t4s)[len(t4s)//2] - sorted(t1s)[len(t1s)//2], 1e-9) / (3 * iters)


def report(name, flops, dt):
    mfu = flops / dt / PEAK if flops else 0.0
    print(f"{name:44s} {dt*1e3:8.3f} ms  MFU={mfu:.4f}", flush=True)


def main():
    k = jax.random.key(0)
    x = jax.random.normal(k, (N, D), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.key(1), (D, F), jnp.bfloat16) / D**0.5
    w2 = jax.random.normal(jax.random.key(2), (F, D), jnp.bfloat16) / F**0.5
    print(f"device: {jax.devices()[0]}", flush=True)

    def norm(y):
        return (y * jax.lax.rsqrt(
            (y.astype(jnp.float32) ** 2).mean() + 1.0).astype(y.dtype))

    # 1. raw matmul chain: x@w1 -> h@w2 (fwd shapes, bf16 out)
    def mm(x):
        h = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        return norm(jnp.dot(h, w2, preferred_element_type=jnp.bfloat16))
    try:
        dt = chain_time(mm, x)
        report("raw mm pair (49152x768@768x3072 + back)", 2 * 2 * N * D * F, dt)
    except Exception:
        traceback.print_exc()

    # 2. MLP fwd+bwd with GELU
    def mlp(x, w1, w2, act=True):
        h = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        if act:
            h = jax.nn.gelu(h)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    for act, label in ((True, "MLP fwd+bwd (gelu)"), (False, "MLP fwd+bwd (no act)")):
        g = jax.grad(lambda x, act=act: mlp(x, w1, w2, act)
                     .astype(jnp.float32).sum())
        def fb(x, g=g):
            return norm(g(x)).astype(jnp.bfloat16)
        try:
            dt = chain_time(fb, x, iters=16)
            report(label, 3 * 2 * 2 * N * D * F, dt)
        except Exception:
            traceback.print_exc()

    # 3. LayerNorm fwd+bwd alone (f32 stats, like _layer_norm)
    sc = jnp.ones((D,), jnp.float32)
    bi = jnp.zeros((D,), jnp.float32)

    def ln(x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * sc + bi).astype(x.dtype)

    gln = jax.grad(lambda x: ln(x).astype(jnp.float32).sum())
    try:
        dt = chain_time(lambda x: norm(gln(x)).astype(jnp.bfloat16), x, iters=16)
        report("LayerNorm fwd+bwd (1 of 16 in body)", 0, dt)
    except Exception:
        traceback.print_exc()

    # 4. full block fwd+bwd via the real model code, 1 layer
    from neuronika_tpu.models import transformer as T
    import dataclasses
    cfg = T.GPTConfig(
        vocab_size=16384, n_layer=1, n_head=H, d_model=D, d_ff=F,
        max_seq=S, dropout=0.0, dtype=jnp.bfloat16,
        flash="auto", remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
    )
    params = T.init_params(jax.random.key(0), cfg)
    blk = jax.tree.map(lambda l: l[0], params["blocks"])
    xb = jax.random.normal(k, (B, S, D), jnp.bfloat16)
    key = jax.random.key(3)

    gblk = jax.grad(lambda xb: T._block(xb, blk, cfg, key, True)[0]
                    .astype(jnp.float32).sum())
    p_blk = 3 * D * D + D * D + 2 * D * F
    attn_fl = 2 * B * H * S * S * (D // H)
    blk_fl = 3 * (2 * p_blk * N + attn_fl * 2)  # qkv+proj+mlp + qk/av
    try:
        dt = chain_time(lambda xb: norm(gblk(xb)).astype(jnp.bfloat16),
                        xb, iters=16)
        report("full block fwd+bwd (real _block)", blk_fl, dt)
    except Exception:
        traceback.print_exc()

    # 5. attention-only fwd+bwd (real _attention incl. qkv+proj matmuls)
    gat = jax.grad(lambda xb: T._attention(xb, blk, cfg, key, True, None)
                   .astype(jnp.float32).sum())
    at_fl = 3 * (2 * 4 * D * D * N + attn_fl * 2)
    try:
        dt = chain_time(lambda xb: norm(gat(xb)).astype(jnp.bfloat16),
                        xb, iters=16)
        report("attention sublayer fwd+bwd", at_fl, dt)
    except Exception:
        traceback.print_exc()

    # 6. body at B64 and B96 (does MFU rise with batch?)
    for B2 in (64, 96):
        cfg8 = dataclasses.replace(cfg, n_layer=8)
        p8 = T.init_params(jax.random.key(0), cfg8)
        tok = jax.random.randint(jax.random.key(1), (B2, S), 0, 16384)
        gb = jax.grad(lambda p: T.hidden_states(
            p, tok, cfg8, train=True, key=key)[0].astype(jnp.float32).mean())
        body_fl = (2 * 8 * p_blk + 8 * 2 * S * D) * B2 * S * 3

        def fbb(p, gb=gb):
            gr = gb(p)
            return jax.tree.map(lambda a, d: a - 0e0 * d.astype(a.dtype), p, gr)
        try:
            dt = chain_time(fbb, p8, iters=6)
            report(f"body-only fwd+bwd B{B2}", body_fl, dt)
        except Exception:
            traceback.print_exc()

    print("done", flush=True)


if __name__ == "__main__":
    main()
