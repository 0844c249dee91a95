"""Diagnose the B=1 decode pathology (B=4 hits 2 ms/step; B=1 measured
475-1125 ms/step before the tunnel wedged). One process, sequential
probes, always exits cleanly — run with a GENEROUS outer timeout and do
not kill it mid-RPC (that wedges the tunnel for ~10 min).

Run: timeout 1500 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/diag_b1.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp


def probe(tag, fn):
    try:
        t0 = time.perf_counter()
        fn()
        print(f"{tag}: {time.perf_counter() - t0:8.1f} s", flush=True)
    except Exception:
        print(f"{tag}: FAILED", flush=True)
        traceback.print_exc()


def main():
    from neuronika_tpu.models import transformer as T

    print("device:", jax.devices()[0], flush=True)
    base = dict(vocab_size=16384, n_layer=8, n_head=12, d_model=1536,
                d_ff=6144, dtype=jnp.bfloat16, flash="auto")

    def gen_probe(tag, cfg, B, P=4, N=16, reps=2):
        params = T.init_params(jax.random.key(0), cfg)
        prompt = jax.random.randint(jax.random.key(1), (B, P), 0,
                                    cfg.vocab_size)
        gen = T.make_generate(cfg, max_new=N)
        t0 = time.perf_counter()
        out = gen(params, prompt, jax.random.key(2))
        out.block_until_ready()
        print(f"{tag} warm(compile+{P + N} steps): "
              f"{time.perf_counter() - t0:6.1f} s", flush=True)
        for r in range(reps):
            t0 = time.perf_counter()
            out = gen(params, prompt, jax.random.key(2))
            _ = jax.device_get(out[0, -1])
            dt = time.perf_counter() - t0
            print(f"{tag} rep{r}: {dt*1e3:8.1f} ms "
                  f"({dt*1e3/(P+N):7.2f} ms/step)", flush=True)

    gen_probe("B=1 S256 ", T.GPTConfig(max_seq=256, **base), 1)
    gen_probe("B=1 S1024", T.GPTConfig(max_seq=1024, **base), 1)
    gen_probe("B=2 S1024", T.GPTConfig(max_seq=1024, **base), 2)
    gen_probe("B=1 S1024 f32", T.GPTConfig(
        max_seq=1024, **{**base, "dtype": jnp.float32}), 1)

    # per-token jitted step (no generate scan), B=1 S1024
    cfg = T.GPTConfig(max_seq=1024, **base)
    params = T.init_params(jax.random.key(0), cfg)
    step = T.make_decode_step(cfg)
    cache = T.init_kv_cache(cfg, 1)
    tok = jnp.zeros((1,), jnp.int32)
    logits, cache = step(params, cache, tok)  # compile
    float(logits[0, 0])
    t0 = time.perf_counter()
    for _ in range(8):
        logits, cache = step(params, cache, tok)
    float(logits[0, 0])
    print(f"B=1 S1024 decode_step x8 (incl RTT): "
          f"{(time.perf_counter()-t0)*1e3/8:7.2f} ms/step", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
