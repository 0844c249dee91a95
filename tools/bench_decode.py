"""Serving decode throughput: on-device `make_generate` (one program for
prefill + N decode steps) vs the host-loop `generate` (one RTT per token
through the axon tunnel).

Run: timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/bench_decode.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def main():
    from neuronika_tpu.models import transformer as T

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = T.GPTConfig(
        vocab_size=16384, n_layer=8, n_head=12, d_model=1536, d_ff=6144,
        max_seq=1024, dropout=0.0, dtype=jnp.bfloat16, flash="auto",
    )
    params = T.init_params(jax.random.key(0), cfg)
    P, N = 128, 256

    import sys
    import numpy as np

    args = sys.argv[1:]
    quant = None
    if args and not args[0].isdigit():
        quant, args = args[0], args[1:]
    batches = [int(a) for a in args] or [1, 8, 32]
    for B in batches:
        prompt = jax.random.randint(jax.random.key(1), (B, P), 0,
                                    cfg.vocab_size)
        gen = T.make_generate(cfg, max_new=N, quant=quant)
        # NB block_until_ready does NOT sync through the axon tunnel —
        # fetch a value to force the warm execution to actually finish
        # (otherwise rep0 absorbs the warm run + stalled compiles and
        # reads 100-1000x too high)
        out = gen(params, prompt, jax.random.key(2))
        np.asarray(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = gen(params, prompt, jax.random.key(2))
            np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        # decode-only rate: subtract nothing (prefill is scanned single-token
        # too) — report sequence-level and per-token figures
        tps = B * N / dt
        q = quant or "bf16"
        print(f"{q} B={B:<3d} prefill {P} + decode {N}: {dt*1e3:8.1f} ms "
              f"-> {tps:9.1f} new tok/s  ({dt*1e3/N:6.2f} ms/step)",
              flush=True)

    # host-loop comparison at B=1 for a handful of tokens (each token pays
    # a tunnel RTT; do few to keep runtime sane)
    prompt = jax.random.randint(jax.random.key(1), (1, P), 0, cfg.vocab_size)
    t0 = time.perf_counter()
    T.generate(params, cfg, prompt, max_new=32)
    dt = time.perf_counter() - t0
    print(f"host-loop B=1 decode 32 (incl per-token RTT): "
          f"{dt*1e3:8.1f} ms -> {32/dt:7.1f} new tok/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
