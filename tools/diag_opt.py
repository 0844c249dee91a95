"""Optimizer-overhead ablation: full champion step with different updates.

full step (adam) 173.3 ms vs fwd+bwd-only 166.4 ms => 6.9 ms for the
update, but a standalone chained adam pass is 2.3 ms (its traffic floor).
This times the full step with: adam (baseline), plain SGD, bf16 m/v adam,
and no-update, to locate the extra ~4.6 ms. ONE process.

Run: timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/diag_opt.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12
B, S = 48, 1024


def chain_time(step_fn, x0, iters=8, reps=5):
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


def main():
    from neuronika_tpu.models import transformer as T

    cfg = T.GPTConfig(
        vocab_size=16384, n_layer=8, n_head=6, d_model=768, d_ff=3072,
        max_seq=S, dropout=0.0, dtype=jnp.bfloat16,
        flash="auto", remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
    )
    params = T.init_params(jax.random.key(0), cfg)
    tok = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.key(2), (B, S), 0, cfg.vocab_size)
    key = jax.random.key(3)
    lr = jnp.float32(3e-4)
    step_fl = T.flops_per_token(cfg, S) * B * S
    kinds = {k: str(v.dtype) for k, v in params.items() if hasattr(v, "dtype")}
    print(f"device: {jax.devices()[0]}  param dtypes: {kinds}", flush=True)

    vg = jax.value_and_grad(
        lambda p: T.loss_fn(p, tok, tgt, cfg, train=True, key=key))

    def report(name, dt):
        print(f"{name:44s} {dt*1e3:8.2f} ms  MFU={step_fl/dt/PEAK:.4f}",
              flush=True)

    # a. adam (the bench step)
    from neuronika_tpu.optim.functional import adam_init, adam_update
    opt = adam_init(params)

    def astep(st):
        p, o = st
        _, g = vg(p)
        p, o = adam_update(p, g, o, lr)
        return (p, o)
    try:
        report("full step adam", chain_time(astep, (params, opt)))
    except Exception:
        traceback.print_exc()

    # b. plain SGD
    def sstep(p):
        _, g = vg(p)
        return jax.tree.map(lambda a, d: a - lr * d.astype(a.dtype), p, g)
    try:
        report("full step sgd", chain_time(sstep, params))
    except Exception:
        traceback.print_exc()

    # c. adam with bf16 m/v state
    opt16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim else x, adam_init(params))

    def a16step(st):
        p, o = st
        _, g = vg(p)
        m = jax.tree.map(lambda m, d: (0.9 * m.astype(jnp.float32)
                                       + 0.1 * d).astype(jnp.bfloat16),
                         o["m"], g)
        v = jax.tree.map(lambda v, d: (0.999 * v.astype(jnp.float32)
                                       + 1e-3 * d * d).astype(jnp.bfloat16),
                         o["v"], g)
        stp = o["step"] + 1
        p = jax.tree.map(
            lambda p, m, v: (p - lr * m.astype(jnp.float32)
                             / (jnp.sqrt(v.astype(jnp.float32)) + 1e-8)
                             ).astype(p.dtype), p, m, v)
        return (p, {"m": m, "v": v, "step": stp})
    try:
        report("full step adam bf16-state", chain_time(a16step, (params, opt16)))
    except Exception:
        traceback.print_exc()

    # d. no update at all (grads -> tiny axpy into params, minimal traffic)
    def nstep(p):
        l, g = vg(p)
        return jax.tree.map(lambda a, d: a * (1.0 + 0.0 * l).astype(a.dtype),
                            p)
    try:
        report("full step no-update (grads dropped)", chain_time(nstep, params))
    except Exception:
        traceback.print_exc()

    print("done", flush=True)


if __name__ == "__main__":
    main()
