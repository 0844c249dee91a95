"""Round-2 TPU sweep: kernel rooflines + remat-policy / batch / fused-CE
matrix for the flagship train step. ONE process, sequential, never killed
(axon tunnel rules). Prints one line per experiment; failures are caught so
the sweep always completes.

Run: python tools/sweep_r2.py [--quick]
"""

from __future__ import annotations

import sys
import time
import traceback

import jax
import jax.numpy as jnp

PEAK = 197e12  # v5e bf16


def _rtt():
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(tiny(z))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(tiny(z))
        rtts.append(time.perf_counter() - t0)
    return sorted(rtts)[len(rtts) // 2]


RTT = None


def timed(fn, *args, reps=8):
    """Median synced step time minus tunnel RTT. fn(*args) must return a
    scalar jax array (the float() fetch is the sync). Args MUST be passed
    explicitly — a zero-arg jitted closure is constant-folded by XLA and
    times the cache, not the kernel."""
    global RTT
    if RTT is None:
        RTT = _rtt()
    float(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(sorted(ts)[len(ts) // 2] - RTT, 1e-7)


def report(name, flops, dt, extra=""):
    mfu = flops / dt / PEAK
    print(f"{name:44s} {dt*1e3:8.2f} ms  MFU {mfu:.3f} {extra}", flush=True)
    return mfu


def kernel_rooflines():
    from neuronika_tpu.ops.pallas.attention import flash_attention
    from neuronika_tpu.ops.pallas.matmul import matmul as pallas_matmul

    # ---- pallas matmul (blocks tuned in r1: bm512 bn1024 bk512)
    M = N = K = 4096
    a = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (K, N), jnp.bfloat16)
    try:
        f = jax.jit(lambda a, b: pallas_matmul(
            a, b, bm=512, bn=1024, bk=512).astype(jnp.float32).sum())
        report("pallas_matmul 4096^3 bf16", 2 * M * N * K, timed(f, a, b))
    except Exception:
        traceback.print_exc()

    # ---- XLA dot for comparison
    try:
        f = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).sum())
        report("xla_dot 4096^3 bf16", 2 * M * N * K, timed(f, a, b))
    except Exception:
        traceback.print_exc()

    # ---- flash attention fwd and fwd+bwd (bf16-MXU kernels)
    for S, blk in ((1024, 512), (2048, 512), (2048, 1024)):
        B, H, D = 4, 8, 128
        q = jax.random.normal(jax.random.key(0), (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)
        fl_fwd = 2 * B * H * S * S * D  # causal: 4*S^2/2
        try:
            f = jax.jit(lambda q, k, v, blk=blk: flash_attention(
                q, k, v, True, None, blk, blk).astype(jnp.float32).sum())
            report(f"flash_fwd S{S} hd128 blk{blk}", fl_fwd, timed(f, q, k, v))
        except Exception:
            traceback.print_exc()
        try:
            g = jax.grad(lambda q, k, v: flash_attention(
                q, k, v, True, None, blk, blk).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))
            f = jax.jit(lambda q, k, v: sum(
                x.astype(jnp.float32).sum() for x in g(q, k, v)))
            report(f"flash_fwd+bwd S{S} hd128 blk{blk}", fl_fwd * 9 // 2,
                   timed(f, q, k, v))
        except Exception:
            traceback.print_exc()

    # ---- conv2d fwd / fwd+bwd (XLA production path; bf16 throughout)
    try:
        B, C, HW = 64, 256, 56
        x = jax.random.normal(jax.random.key(0), (B, C, HW, HW), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (C, C, 3, 3), jnp.bfloat16)
        from jax import lax

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        fl = 2 * B * C * C * 9 * HW * HW
        f = jax.jit(lambda x, w: conv(x, w).astype(jnp.float32).sum())
        report("conv2d_fwd 3x3 C256 56^2 B64", fl, timed(f, x, w))
        g = jax.grad(lambda x, w: conv(x, w).astype(jnp.float32).sum(),
                     argnums=(0, 1))
        f = jax.jit(lambda x, w: sum(
            t.astype(jnp.float32).sum() for t in g(x, w)))
        report("conv2d_fwd+bwd 3x3 C256 56^2 B64", 3 * fl, timed(f, x, w))
    except Exception:
        traceback.print_exc()


def train_sweep(quick=False):
    from neuronika_tpu.models import transformer as T

    base = dict(
        vocab_size=16384, n_layer=8, n_head=6, d_model=768, d_ff=3072,
        max_seq=1024, dropout=0.0, dtype=jnp.bfloat16, flash="auto",
        remat=True, flash_block=512,
    )
    S = 1024
    grid = [
        ("B64 full", dict(), 64),
        ("B64 flash", dict(remat_policy="flash"), 64),
        ("B64 names", dict(remat_policy="names"), 64),
        ("B64 flash_dots", dict(remat_policy="flash_dots"), 64),
        ("B32 names", dict(remat_policy="names"), 32),
        ("B32 noremat", dict(remat=False), 32),
        ("B64 names fusedce", dict(remat_policy="names", fused_ce="on"), 64),
        ("B128 flash", dict(remat_policy="flash"), 128),
        ("B128 names", dict(remat_policy="names"), 128),
    ]
    if quick:
        grid = grid[:3]
    best = (None, 0.0)
    for label, over, B in grid:
        try:
            cfg = T.GPTConfig(**{**base, **over})
            params = T.init_params(jax.random.key(0), cfg)
            opt = T.adam_init(params)
            step = T.make_train_step(cfg)
            tok = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
            tgt = jax.random.randint(jax.random.key(2), (B, S), 0, cfg.vocab_size)
            lr = jnp.float32(3e-4)
            state = {"p": params, "o": opt}

            def one(state=state, tok=tok, tgt=tgt, step=step, lr=lr):
                state["p"], state["o"], loss = step(
                    state["p"], state["o"], tok, tgt, lr, jax.random.key(3))
                return loss

            dt = timed(one, reps=6)
            fl = T.flops_per_token(cfg, S) * B * S
            mfu = report(f"train {label}", fl, dt,
                         extra=f"tok/s {B*S/dt:,.0f}")
            if mfu > best[1]:
                best = (label, mfu)
        except Exception as e:  # noqa: BLE001
            print(f"train {label:38s} FAILED {type(e).__name__}: {e}",
                  flush=True)
    print(f"\nBEST: {best[0]} MFU {best[1]:.3f}")


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    print(f"device: {jax.devices()[0]}", flush=True)
    kernel_rooflines()
    train_sweep(quick)
