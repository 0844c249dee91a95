"""Champion-config ablation: where do the remaining ms go?

Usage: python tools/diag_r2b.py [d_model n_head d_ff B]  (default 768 6 3072 48)

Config: d768 L8 H6 S1024 B48 bf16, unroll+noremat+fastsm+fusedbwd
(bench.py's current champion, 0.703 MFU). Times full step, fwd-only,
fwd+bwd (no opt), body-only fwd+bwd, head+CE fwd+bwd, Adam-only — so the
gap to 0.80 can be attributed. ONE process, sequential, never killed.

Run: nohup python tools/diag_r2b.py > /tmp/diag_r2b.log 2>&1 &
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12


def chain_time(step_fn, x0, iters=24, reps=5):
    """Two-length fori_loop difference timing (RTT cancels)."""
    def loop(n):
        return jax.jit(lambda x: lax.fori_loop(0, n, lambda i, x: step_fn(x), x))
    f1, f4 = loop(iters), loop(4 * iters)

    def run(f, x):
        leaf = jax.tree.leaves(f(x))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(f1, x0); run(f4, x0)
    t1s, t4s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(f1, x0); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(f4, x0); t4s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[len(t1s) // 2]
    t4 = sorted(t4s)[len(t4s) // 2]
    return max(t4 - t1, 1e-9) / (3 * iters)


def report(name, flops, dt):
    print(f"{name:46s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.1f} TF/s "
          f"MFU={flops/dt/PEAK:.4f}", flush=True)


def main():
    from neuronika_tpu.models import transformer as T
    import dataclasses

    import sys
    dm, nh, dff, B = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 \
        else (768, 6, 3072, 48)
    S = 1024
    cfg = T.GPTConfig(
        vocab_size=16384, n_layer=8, n_head=nh, d_model=dm, d_ff=dff,
        max_seq=1024, dropout=0.0, dtype=jnp.bfloat16,
        flash="auto", remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
        opt_state_dtype="bf16",
    )
    params = T.init_params(jax.random.key(0), cfg)
    tok = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.key(2), (B, S), 0, cfg.vocab_size)
    key = jax.random.key(3)

    step_fl = T.flops_per_token(cfg, S) * B * S
    fwd_fl = step_fl / 3
    p_block = 3 * cfg.d_model**2 + cfg.d_model**2 + 2 * cfg.d_model * cfg.d_ff
    body_fl = (2 * cfg.n_layer * p_block
               + cfg.n_layer * 2 * S * cfg.d_model) * B * S
    head_fl = 2 * cfg.vocab_size * cfg.d_model * B * S
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"device: {jax.devices()[0]}  params={n_params/1e6:.1f}M", flush=True)
    print(f"step_fl={step_fl/1e12:.2f} TF  body3={3*body_fl/1e12:.2f} "
          f"head3={3*head_fl/1e12:.2f}", flush=True)

    # 1. FULL train step (bench number) — self-chaining state
    step = T.make_train_step(cfg)
    opt = T.opt_init(params, cfg)

    def full(st):
        p, o = st
        p, o, loss = step(p, o, tok, tgt, jnp.float32(3e-4), key)
        return (p, o)
    try:
        dt = chain_time(full, (params, opt), iters=8)
        report("FULL step (fwd+bwd+adam)", step_fl, dt)
        full_dt = dt
    except Exception:
        traceback.print_exc(); full_dt = None

    # 2. fwd-only full loss — chain via param perturbation to defeat CSE
    def fwd(p):
        l = T.loss_fn(p, tok, tgt, cfg, train=True, key=key)
        return jax.tree.map(lambda x: x * (1.0 + 0.0 * l).astype(x.dtype), p)
    try:
        dt = chain_time(fwd, params, iters=16)
        report("fwd loss only", fwd_fl, dt)
    except Exception:
        traceback.print_exc()

    # 3. fwd+bwd (no optimizer)
    g = jax.grad(lambda p: T.loss_fn(p, tok, tgt, cfg, train=True, key=key))

    def fb(p):
        gr = g(p)
        return jax.tree.map(lambda x, d: x - 0e0 * d.astype(x.dtype), p, gr)
    try:
        dt = chain_time(fb, params, iters=8)
        report("fwd+bwd (no opt)", step_fl, dt)
        fb_dt = dt
    except Exception:
        traceback.print_exc(); fb_dt = None

    if full_dt and fb_dt:
        print(f"  -> adam+clip overhead: {(full_dt-fb_dt)*1e3:.2f} ms", flush=True)

    # 4. body-only fwd+bwd
    gb = jax.grad(lambda p: T.hidden_states(
        p, tok, cfg, train=True, key=key)[0].astype(jnp.float32).mean())

    def fbb(p):
        gr = gb(p)
        return jax.tree.map(lambda x, d: x - 0e0 * d.astype(x.dtype), p, gr)
    try:
        dt = chain_time(fbb, params, iters=8)
        report("body-only fwd+bwd", 3 * body_fl, dt)
        body_dt = dt
    except Exception:
        traceback.print_exc(); body_dt = None

    # 5. head+CE fwd+bwd on fixed hidden state
    x = jax.random.normal(jax.random.key(4), (B, S, cfg.d_model), jnp.bfloat16)

    def head_loss(wte, x):
        logits = jnp.dot(x, wte.T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        t = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
        return (lse - t).mean()

    gh = jax.grad(head_loss, argnums=(0, 1))

    def fbh(st):
        w, xx = st
        dw, dx = gh(w, xx)
        return (w - 0e0 * dw.astype(w.dtype), xx - 0e0 * dx.astype(xx.dtype))
    try:
        dt = chain_time(fbh, (params["wte"], x), iters=16)
        report("head+CE fwd+bwd (f32 logits)", 3 * head_fl, dt)
    except Exception:
        traceback.print_exc()

    # 5b. head+CE with bf16 logits + manual stable CE
    def head_loss16(wte, x):
        logits = jnp.dot(x, wte.T.astype(jnp.bfloat16))  # bf16 out
        lf = logits.astype(jnp.float32)
        m = lf.max(axis=-1, keepdims=True)
        lse = jnp.log(jnp.exp(lf - m).sum(-1)) + m[..., 0]
        t = jnp.take_along_axis(lf, tgt[..., None], axis=-1)[..., 0]
        return (lse - t).mean()

    gh16 = jax.grad(head_loss16, argnums=(0, 1))

    def fbh16(st):
        w, xx = st
        dw, dx = gh16(w, xx)
        return (w - 0e0 * dw.astype(w.dtype), xx - 0e0 * dx.astype(xx.dtype))
    try:
        dt = chain_time(fbh16, (params["wte"], x), iters=16)
        report("head+CE fwd+bwd (bf16 logits)", 3 * head_fl, dt)
    except Exception:
        traceback.print_exc()

    # 6. Adam-only update on the full param tree
    from neuronika_tpu.models.transformer import adam_update  # noqa
    lr = jnp.float32(3e-4)

    def adamonly(st):
        p, o = st
        gr = jax.tree.map(lambda x: (x * 1e-6).astype(jnp.float32), p)
        p2, o2 = adam_update(p, gr, o, lr)
        return (p2, o2)
    try:
        dt = chain_time(adamonly, (params, opt), iters=16)
        report("adam update only", 0.0 + 1.0, dt)  # report ms only
    except Exception:
        traceback.print_exc()

    # 7. single flash layer fwd+bwd at this exact shape, packed path
    import neuronika_tpu.models.transformer as TT
    lp = {k: v for k, v in params.items()}
    print("done", flush=True)


if __name__ == "__main__":
    main()
