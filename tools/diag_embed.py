"""Embedding-scatter + DCE-proof block ablations at the champion shape.

The body ablation (141 ms) exceeds 8x the single-block time (~84 ms) —
suspect: the wte gather's backward scatter-add (49152 rows -> 16384x768).
Measures scatter vs one-hot-matmul dwte, and re-times MLP/block with a
squared-sum loss (non-constant cotangent; .sum() lets XLA fold the top
matmuls' backward, inflating earlier numbers). ONE process.

Run: timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/diag_embed.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12
B, S, D, F, H, V = 48, 1024, 768, 3072, 6, 16384
N = B * S


def chain_time(step_fn, x0, iters=16, reps=5):
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
    print(f"{name:48s} {dt*1e3:8.3f} ms  MFU={mfu:.4f}", flush=True)


def sq(y):
    return (y.astype(jnp.float32) ** 2).sum()


def norm(y):
    return y * jax.lax.rsqrt((y.astype(jnp.float32) ** 2).mean()
                             + 1.0).astype(y.dtype)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    tok = jax.random.randint(jax.random.key(1), (N,), 0, V)
    wte = jax.random.normal(jax.random.key(0), (V, D), jnp.float32) * 0.02

    # 1. embedding gather fwd+bwd — REAL scatter-add path
    def emb_loss(wte):
        return sq(norm(wte[tok].astype(jnp.bfloat16)))
    ge = jax.grad(emb_loss)
    try:
        dt = chain_time(lambda w: w - 1e-12 * ge(w), wte, iters=8)
        report("wte gather fwd+bwd (scatter-add dwte)", 0, dt)
    except Exception:
        traceback.print_exc()

    # 2. one-hot matmul dwte on a given cotangent (the replacement)
    dx = jax.random.normal(jax.random.key(2), (N, D), jnp.bfloat16)

    # simpler: chain dx -> dx via a reduction of dw
    def onehot_chain(dx):
        oh = (tok[:, None] == lax.broadcasted_iota(jnp.int32, (N, V), 1))
        dw = jnp.dot(oh.astype(jnp.bfloat16).T, dx,
                     preferred_element_type=jnp.float32)
        s = jax.lax.rsqrt((dw ** 2).mean() + 1.0)
        return (dx * s).astype(jnp.bfloat16)
    try:
        dt = chain_time(onehot_chain, dx, iters=8)
        report("one-hot matmul dwte", 2.0 * N * V * D, dt)
    except Exception:
        traceback.print_exc()

    # 3. sort-based segment-sum dwte
    def sort_chain(dx):
        order = jnp.argsort(tok)
        st = tok[order]
        sdx = dx[order].astype(jnp.float32)
        seg = jax.ops.segment_sum(sdx, st, num_segments=V)
        s = jax.lax.rsqrt((seg ** 2).mean() + 1.0)
        return (dx * s).astype(jnp.bfloat16)
    try:
        dt = chain_time(sort_chain, dx, iters=8)
        report("sort+segment_sum dwte", 0, dt)
    except Exception:
        traceback.print_exc()

    # 4. MLP fwd+bwd, squared loss (no DCE)
    x = jax.random.normal(jax.random.key(3), (N, D), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.key(4), (D, F), jnp.bfloat16) / D**0.5
    w2 = jax.random.normal(jax.random.key(5), (F, D), jnp.bfloat16) / F**0.5

    gm = jax.grad(lambda x: sq(jnp.dot(jax.nn.gelu(
        jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)), w2,
        preferred_element_type=jnp.bfloat16)))
    try:
        dt = chain_time(lambda x: norm(gm(x)).astype(jnp.bfloat16), x,
                        iters=16)
        report("MLP fwd+bwd sq-loss (dx only)", (2 + 4) * 2 * N * D * F, dt)
    except Exception:
        traceback.print_exc()

    gm2 = jax.grad(lambda x, w1, w2: sq(jnp.dot(jax.nn.gelu(
        jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)), w2,
        preferred_element_type=jnp.bfloat16)), argnums=(0, 1, 2))

    def fb2(st):
        xx, a, b = st
        dx, d1, d2 = gm2(xx, a, b)
        return (norm(dx).astype(jnp.bfloat16), a - 1e-12 * d1.astype(a.dtype),
                b - 1e-12 * d2.astype(b.dtype))
    try:
        dt = chain_time(fb2, (x, w1, w2), iters=16)
        report("MLP fwd+bwd sq-loss (dx+dw)", 3 * 2 * 2 * N * D * F, dt)
    except Exception:
        traceback.print_exc()

    # 5. real _block fwd+bwd sq-loss, dx+dparams
    from neuronika_tpu.models import transformer as T
    cfg = T.GPTConfig(
        vocab_size=V, n_layer=1, n_head=H, d_model=D, d_ff=F,
        max_seq=S, dropout=0.0, dtype=jnp.bfloat16,
        flash="auto", remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
    )
    params = T.init_params(jax.random.key(0), cfg)
    blk = jax.tree.map(lambda l: l[0], params["blocks"])
    xb = jax.random.normal(jax.random.key(6), (B, S, D), jnp.bfloat16)
    key = jax.random.key(7)

    gb = jax.grad(lambda xb, blk: sq(T._block(xb, blk, cfg, key, True)[0]),
                  argnums=(0, 1))

    def fbb(st):
        xx, bb = st
        dx, db = gb(xx, bb)
        return (norm(dx).astype(jnp.bfloat16),
                jax.tree.map(lambda p, d: p - 1e-12 * d.astype(p.dtype),
                             bb, db))
    p_blk = 3 * D * D + D * D + 2 * D * F
    attn_fl = 2 * B * H * S * S * (D // H)
    blk_fl = 3 * (2 * p_blk * N + attn_fl * 2)
    try:
        dt = chain_time(fbb, (xb, blk), iters=8)
        report("full block fwd+bwd sq-loss (dx+dp)", blk_fl, dt)
    except Exception:
        traceback.print_exc()

    print("done", flush=True)


if __name__ == "__main__":
    main()
