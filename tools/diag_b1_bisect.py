"""Bisect which decode construct triggers the B=1 re-execution stall.

Stages (all scan 64 steps, d1536-ish shapes, sync via value fetch):
  A  plain dots (control)
  B  + KV-cache carry with dynamic_update_slice/dynamic_index at pos
  C  + attention einsums over the cache slice
  D  + int32 token carry: argmax -> embedding gather -> wpe dyn-slice

Run: timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/diag_b1_bisect.py [stages]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

D, L, H, S, HD = 1536, 8, 12, 1024, 128
V = 16384


def run(tag, f, args, reps=2):
    t0 = time.perf_counter()
    out = f(*args)
    s = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(
        jnp.float32))
    print(f"{tag} call0 (compile): {time.perf_counter()-t0:6.1f}s "
          f"(v={s:.3g})", flush=True)
    for r in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(
            jnp.float32))
        print(f"{tag} call{r+1}: {time.perf_counter()-t0:8.3f}s", flush=True)


def stage_a(B):
    w = jax.random.normal(jax.random.key(0), (L, D, D), jnp.bfloat16)

    @jax.jit
    def f(x, w):
        def tok(x, _):
            def layer(x, wl):
                return jnp.tanh(x @ wl), None
            return lax.scan(layer, x, w)[0], None
        return lax.scan(tok, x, None, length=64)[0]

    run(f"A B={B}", f, (jnp.ones((B, D), jnp.bfloat16), w))


def stage_b(B):
    w = jax.random.normal(jax.random.key(0), (L, D, D), jnp.bfloat16)
    ck = jnp.zeros((L, B, H, S, HD), jnp.bfloat16)

    @jax.jit
    def f(x, ck, w):
        def tok(carry, pos):
            x, ck = carry
            def layer(c, inp):
                x, ck = c
                wl, l = inp
                x = jnp.tanh(x @ wl)
                k = x.reshape(B, H, 1, HD)
                ck = lax.dynamic_update_slice(ck, k[None],
                                              (l, 0, 0, pos, 0))
                lk = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
                x = x + lk[:, :, 0, :].reshape(B, D) * 1e-3
                return (x, ck), None
            (x, ck), _ = lax.scan(layer, (x, ck), (w, jnp.arange(L)))
            return (x, ck), None
        return lax.scan(tok, (x, ck), jnp.arange(64))[0]

    run(f"B B={B}", f, (jnp.ones((B, D), jnp.bfloat16), ck, w))


def stage_c(B):
    w = jax.random.normal(jax.random.key(0), (L, D, D), jnp.bfloat16)
    ck = jnp.zeros((L, B, H, S, HD), jnp.bfloat16)

    @jax.jit
    def f(x, ck, w):
        def tok(carry, pos):
            x, ck = carry
            def layer(c, inp):
                x, ck = c
                wl, l = inp
                h = jnp.tanh(x @ wl)
                k = h.reshape(B, H, 1, HD)
                ck = lax.dynamic_update_slice(ck, k[None],
                                              (l, 0, 0, pos, 0))
                lk = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
                q = h.reshape(B, H, 1, 1, HD)
                att = jnp.einsum("bkgqd,bksd->bkgqs", q, lk,
                                 preferred_element_type=jnp.float32)
                idx = lax.broadcasted_iota(jnp.int32, att.shape, 4)
                att = jnp.where(idx <= pos, att, -1e30)
                att = jax.nn.softmax(att, -1).astype(jnp.bfloat16)
                ctx = jnp.einsum("bkgqs,bksd->bkgqd", att, lk)
                x = x + ctx.reshape(B, D)
                return (x, ck), None
            (x, ck), _ = lax.scan(layer, (x, ck), (w, jnp.arange(L)))
            return (x, ck), None
        return lax.scan(tok, (x, ck), jnp.arange(64))[0]

    run(f"C B={B}", f, (jnp.ones((B, D), jnp.bfloat16), ck, w))


def stage_d(B):
    w = jax.random.normal(jax.random.key(0), (L, D, D), jnp.bfloat16)
    wte = jax.random.normal(jax.random.key(1), (V, D), jnp.bfloat16)
    wpe = jax.random.normal(jax.random.key(2), (S, D), jnp.bfloat16)

    @jax.jit
    def f(tok0, w, wte, wpe):
        def tok(carry, pos):
            t = carry
            pe = lax.dynamic_slice_in_dim(wpe, pos, 1)
            x = wte[t] + pe
            def layer(x, wl):
                return jnp.tanh(x @ wl), None
            x, _ = lax.scan(layer, x, w)
            logits = jnp.dot(x[:, 0] if x.ndim == 3 else x, wte.T,
                             preferred_element_type=jnp.float32)
            return logits.argmax(-1).astype(jnp.int32), None
        return lax.scan(tok, tok0, jnp.arange(64))[0]

    run(f"D B={B}", f, (jnp.zeros((B,), jnp.int32), w, wte, wpe))


def main():
    print("device:", jax.devices()[0], flush=True)
    stages = sys.argv[1:] or ["a", "b", "c", "d"]
    for s in stages:
        for B in (1, 4):
            globals()[f"stage_{s}"](B)
    print("done", flush=True)


if __name__ == "__main__":
    main()
