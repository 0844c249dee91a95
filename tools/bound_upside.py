"""Upper-bound remaining kernel wins at the d1536 flagship shape.

Times body fwd+bwd with (a) stock code, (b) LayerNorm -> identity
(bounds any LN-fusion win), (c) flash causal=False (bounds the mask/VPU
win). Monkeypatches module internals — measurement only, never shipped.

Run: timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/bound_upside.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12
B, S = 24, 1024


def chain_time(step_fn, x0, iters=6, reps=3):
    f = jax.jit(lambda x, n: lax.fori_loop(
        0, n, lambda i, x: step_fn(x), x))

    def run(x, n):
        leaf = jax.tree.leaves(f(x, jnp.int32(n)))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(x0, iters); run(x0, 4 * iters)
    t1s, t4s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(x0, iters); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(x0, 4 * iters); t4s.append(time.perf_counter() - t0)
    return max(sorted(t4s)[len(t4s)//2] - sorted(t1s)[len(t1s)//2], 1e-9) / (3 * iters)


def main():
    from neuronika_tpu.models import transformer as T

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = T.GPTConfig(
        vocab_size=16384, n_layer=8, n_head=12, d_model=1536, d_ff=6144,
        max_seq=S, dropout=0.0, dtype=jnp.bfloat16, flash="auto",
        remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
        opt_state_dtype="bf16",
    )
    params = T.init_params(jax.random.key(0), cfg)
    tok = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    key = jax.random.key(2)

    def body_fb():
        gb = jax.grad(lambda p: (T.hidden_states(
            p, tok, cfg, train=True, key=key)[0].astype(jnp.float32) ** 2
        ).mean())

        def fb(p):
            gr = gb(p)
            s = sum((l.astype(jnp.float32) ** 2).sum()
                    for l in jax.tree.leaves(gr))
            sc = jax.lax.rsqrt(s + 1.0)
            return jax.tree.map(
                lambda x: (x * (1.0 + 0e0 * sc)).astype(x.dtype), p)
        return fb

    def run(name):
        try:
            dt = chain_time(body_fb(), params)
            print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
            return dt
        except Exception:
            traceback.print_exc()
            return None

    base = run("body stock")

    real_ln = T._layer_norm
    T._layer_norm = lambda x, p, eps=1e-5: x
    noln = run("body LN->identity")
    T._layer_norm = real_ln
    if base and noln:
        print(f"  -> LN total cost: {(base-noln)*1e3:.2f} ms "
              f"(fusion upside is a fraction of this)", flush=True)

    import neuronika_tpu.ops.pallas.attention as A
    real_fq = A.flash_attention_qkv
    A.flash_attention_qkv = (
        lambda qkv, seed, H, KV, causal, scale, bq, bk, *a:
        real_fq(qkv, seed, H, KV, False, scale, bq, bk, *a))
    nomask = run("body flash causal=False")
    A.flash_attention_qkv = real_fq
    if base and nomask:
        print(f"  -> mask/VPU + skipped-tile bound: {(base-nomask)*1e3:.2f}"
              " ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
