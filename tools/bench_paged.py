"""Paged decode: fused Pallas kernel vs XLA gather — serving-scale timing.

One TPU process. Times `make_paged_decode_step(kernel="on")` against
`kernel="off"` at the d1536 serving shape (B=16 slots, 1024-token
context, block_size 16 → 64 pages/sequence) with the two-length chain
method (tunnel-RTT-immune; see bench.py::_timed_chain).

The gather path materialises each layer's (B, MB·BS) K/V copy
(~100 MB/layer at this shape) before attention reads it; the kernel
DMAs pages straight from the pool — the delta is pure HBM traffic.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neuronika_tpu.models import transformer as T


def timed_chain(step, cache0, iters=8, reps=3):
    f = jax.jit(lambda c, n: lax.fori_loop(0, n, lambda i, c: step(c), c))

    def run(n):
        out = f(cache0, jnp.int32(n))
        return float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))

    print("  compiling...", flush=True)
    run(iters)
    print("  compiled; warming", flush=True)
    run(4 * iters)
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(iters)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(4 * iters)
        t4 = time.perf_counter() - t0
        diffs.append(max(t4 - t1, 1e-9))
    return sorted(diffs)[len(diffs) // 2] / (3 * iters)


def main():
    cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=12,
                      d_model=1536, d_ff=6144, max_seq=512,
                      dtype=jnp.bfloat16, flash="auto")
    B, BS = 8, 16
    MB = cfg.max_seq // BS
    NB = B * MB + 1
    params = T.init_params(jax.random.key(0), cfg)
    cache = T.init_paged_cache(cfg, NB, BS, B)
    rng = np.random.default_rng(0)
    # dense per-slot tables over a shuffled pool; mid-range positions
    table = jnp.asarray(
        rng.permutation(np.arange(1, NB)).reshape(B, MB).astype(np.int32))
    cache["pos"] = jnp.full((B,), cfg.max_seq - 2, jnp.int32)
    # fill pool with noise so softmax paths are realistic
    cache["pk"] = jax.random.normal(jax.random.key(1), cache["pk"].shape,
                                    cfg.dtype)
    cache["pv"] = jax.random.normal(jax.random.key(2), cache["pv"].shape,
                                    cfg.dtype)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, B).astype(np.int32))
    active = jnp.ones((B,), bool)

    # kernel parity is covered by tests + a direct TPU check; here we
    # time ONLY the two chain programs (each d1536 compile through the
    # remote-compile tunnel is minutes — keep the program count at 2)
    results = {}
    for kernel in ("off", "on"):
        print(f"--- kernel={kernel}", flush=True)
        step_fn = T.make_paged_decode_step(cfg, BS, kernel=kernel)
        # bare-step compile + one synced call first (diagnostic: if THIS
        # is slow, it is the base program, not the fori_loop wrapper)
        t0 = time.perf_counter()
        # deep-copy: the step donates its cache argument, and dict() is
        # a shallow copy sharing the pristine cache's buffers
        logits, c2 = step_fn(params, jax.tree.map(jnp.copy, cache),
                             tokens, active, table)
        _ = float(logits.ravel()[0])
        print(f"  bare step compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        del c2

        def one(c, step_fn=step_fn):
            logits, c2 = step_fn(params, c, tokens, active, table)
            # keep pos static so per-iteration work is constant
            c2["pos"] = c["pos"]
            return c2

        dt = timed_chain(one, dict(cache))
        results[kernel] = dt
        print(f"kernel={kernel}: {dt * 1e3:.3f} ms/step "
              f"({B / dt:.0f} tok/s at B={B})", flush=True)

    print(f"speedup: {results['off'] / results['on']:.2f}x")


if __name__ == "__main__":
    main()
