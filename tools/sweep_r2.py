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


def timed_chain(step_fn, x0, iters=32, reps=5):
    """Per-iteration time of a self-chaining kernel: y = step_fn(x) with
    y.shape == x.shape (pytrees ok), run inside ONE jitted fori_loop (the
    sequential dependency defeats both constant folding and overlap).

    Uses the TWO-LENGTH difference method: time loops of n and 4n
    iterations and divide the difference by 3n — the tunnel RTT and all
    per-call constants cancel exactly, unlike subtracting a separately
    measured RTT (whose ±10 ms jitter corrupts sub-ms kernels)."""
    from jax import lax

    def loop(n):
        return jax.jit(lambda x: lax.fori_loop(
            0, n, lambda i, x: step_fn(x), x))

    f1, f4 = loop(iters), loop(4 * iters)

    def run(f, x):
        leaf = jax.tree.leaves(f(x))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(f1, x0)
    run(f4, x0)  # compile both
    t1s, t4s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(f1, x0)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(f4, x0)
        t4s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[len(t1s) // 2]
    t4 = sorted(t4s)[len(t4s) // 2]
    return max(t4 - t1, 1e-9) / (3 * iters)


def kernel_rooflines():
    from neuronika_tpu.ops.pallas.attention import (
        flash_attention,
        flash_attention_qkv,
    )
    from neuronika_tpu.ops.pallas.matmul import matmul as pallas_matmul

    # ---- pallas matmul (blocks tuned in r1: bm512 bn1024 bk512)
    M = N = K = 4096
    a = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (K, N), jnp.bfloat16) / (K ** 0.5)
    try:
        dt = timed_chain(lambda x: pallas_matmul(
            x, b, bm=512, bn=1024, bk=512).astype(jnp.bfloat16), a)
        report("pallas_matmul 4096^3 bf16", 2 * M * N * K, dt)
    except Exception:
        traceback.print_exc()
    try:
        dt = timed_chain(lambda x: jnp.dot(
            x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), a)
        report("xla_dot 4096^3 bf16", 2 * M * N * K, dt)
    except Exception:
        traceback.print_exc()

    # ---- flash attention fwd and fwd+bwd (bf16-MXU kernels, BHSD + packed)
    for S, blk in ((1024, 512), (2048, 512), (2048, 1024)):
        B, H, D = 4, 8, 128
        q = jax.random.normal(jax.random.key(0), (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)
        fl_fwd = 2 * B * H * S * S * D  # causal: 4*S^2/2
        try:
            dt = timed_chain(lambda x, blk=blk: flash_attention(
                x, k, v, True, None, blk, blk), q)
            report(f"flash_fwd S{S} hd128 blk{blk}", fl_fwd, dt)
        except Exception:
            traceback.print_exc()
        try:
            g = jax.grad(lambda q, k, v: flash_attention(
                q, k, v, True, None, blk, blk).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))

            def chain(x, g=g):
                dq, dk, dv = g(x, k, v)  # consume ALL grads (else DCE)
                return jnp.tanh(dq + dk + dv).astype(jnp.bfloat16)

            report(f"flash_fwd+bwd S{S} hd128 blk{blk}", fl_fwd * 9 // 2,
                   timed_chain(chain, q, iters=16))
        except Exception:
            traceback.print_exc()
    # packed-qkv layout kernel at the flagship geometry
    try:
        B, S, H, hd = 4, 1024, 8, 128
        W = 3 * H * hd
        qkv = jax.random.normal(jax.random.key(3), (B, S, W), jnp.bfloat16)
        fl_fwd = 2 * B * H * S * S * hd
        dt = timed_chain(lambda x: jnp.concatenate(
            [flash_attention_qkv(x, None, H, 0, True, None, 512, 512),
             x[..., H * hd:]], axis=-1), qkv)
        report("flash_qkv_fwd S1024 hd128 blk512", fl_fwd, dt)
    except Exception:
        traceback.print_exc()

    # ---- conv2d fwd / fwd+bwd (XLA production path; bf16 throughout)
    try:
        B, C, HW = 64, 256, 56
        x = jax.random.normal(jax.random.key(0), (B, C, HW, HW), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (C, C, 3, 3),
                              jnp.bfloat16) / (C * 9) ** 0.5
        from jax import lax

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        fl = 2 * B * C * C * 9 * HW * HW
        report("conv2d_fwd 3x3 C256 56^2 B64", fl,
               timed_chain(lambda x: conv(x, w), x))
        g = jax.grad(lambda x, w: conv(x, w).astype(jnp.float32).sum(),
                     argnums=(0, 1))

        def chain(state, g=g):
            # carry BOTH grads in the loop state: consuming dw through a
            # scalar lets XLA's algebraic simplifier collapse the whole
            # weight-grad conv (measured MFU > 1 — impossible)
            x_, wa = state
            dx, dw = g(x_, w)
            return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw

        report("conv2d_fwd+bwd 3x3 C256 56^2 B64", 3 * fl,
               timed_chain(chain, (x, jnp.zeros_like(w, jnp.float32)),
                           iters=16))
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
    best = dict(remat_policy="names", flash_block=1024,
                matmul_out="compute")
    un = {**best, "scan_layers": False, "remat": False,
          "flash_softmax": "fast"}
    grid = [
        ("d768 B48 base (fastsm f32head)", un, 48),
        ("d768 B48 fusedbwd", {**un, "flash_bwd": "fused"}, 48),
        ("d768 B48 fusedbwd blk512", {**un, "flash_bwd": "fused",
                                      "flash_block": 512}, 48),
        ("d1536 B24 fusedbwd", {**un, "flash_bwd": "fused",
                                "d_model": 1536, "n_head": 12,
                                "d_ff": 6144}, 24),
        ("d768 B48 fusedbwd drop0.1", {**un, "flash_bwd": "fused",
                                       "dropout": 0.1,
                                       "flash_block": 512}, 48),
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
    if "--train-only" not in sys.argv:
        kernel_rooflines()
    train_sweep(quick)
