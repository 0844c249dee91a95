"""Paged-attention kernel regime probe: windowed decode, kernel on vs
off, as cache CAPACITY grows.

The r4 serving matrix measured the kernel losing inside decode windows
at small caches (prompts <= 128; the XLA gather's 3 passes over a tiny
cache cost less than the kernel's per-step fixed overhead: a
(B, KV, MB) grid of (G, hd)-row programs). The kernel's design claim —
ONE HBM pass over the cache vs 3 — scales with cache size, so there
must be a capacity crossover. This probe measures it so `kernel="auto"`
can route windowed programs by capacity instead of always off.

Run alone on the TPU: python tools/probe_paged_regime.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _measure_rtt
from neuronika_tpu.models.transformer import (
    GPTConfig, init_params, init_paged_cache, make_paged_decode_many,
)

rtt = _measure_rtt()
cfg = GPTConfig(n_layer=8, d_model=768, n_head=6, max_seq=8192,
                vocab_size=16384)
params = init_params(jax.random.key(0), cfg)
B, BS, K = 8, 64, 8

for cap_tokens in [256, 1024, 4096, 8192]:
    MB = cap_tokens // BS
    NB = 1 + B * MB  # scratch block 0 + dense tables
    row = []
    for kern in ("on", "off"):
        print(f"compiling cap={cap_tokens} kernel={kern} ...", flush=True)
        many = make_paged_decode_many(cfg, BS, K, quant="int8",
                                      kernel=kern)
        cache = init_paged_cache(cfg, NB, BS, B)
        # positions near capacity: the whole table is live
        cache["pos"] = jnp.full((B,), cap_tokens - K - 2, jnp.int32)
        table = jnp.arange(1, NB, dtype=jnp.int32).reshape(B, MB)
        tokens = jnp.full((B,), 5, jnp.int32)
        active = jnp.ones((B,), bool)
        seeds = jnp.zeros((B,), jnp.uint32)
        args = lambda c: (params, c, tokens, active, table, seeds,
                          jnp.zeros((B,), jnp.int32),       # steps0
                          jnp.zeros((B,), jnp.float32),     # temperature
                          jnp.zeros((B,), jnp.int32),       # top_k
                          jnp.zeros((B,), jnp.float32),     # top_p
                          jnp.zeros((B,), jnp.float32))     # min_p
        toks, cache = many(*args(cache))       # compile + warm
        cache["pos"] = jnp.full((B,), cap_tokens - K - 2, jnp.int32)
        toks, cache = many(*args(cache))
        jax.block_until_ready(toks)
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            cache["pos"] = jnp.full((B,), cap_tokens - K - 2, jnp.int32)
            toks, cache = many(*args(cache))
        float(jnp.asarray(toks)[0, 0])         # value-fetch sync
        dt = (time.time() - t0 - rtt) / iters / K
        row.append(dt * 1e3)
    on_ms, off_ms = row
    print(f"cap={cap_tokens:5d} tok: kernel ON {on_ms:7.3f} ms/step  "
          f"OFF {off_ms:7.3f} ms/step  ratio off/on {off_ms / on_ms:.2f}",
          flush=True)
print("DONE", flush=True)
