"""Fused linear+CE block sweep at the champion head shape.

N=49152 (B48 S1024), V=16384, D=768, bf16 weights/activations. Times the
XLA composite and the Pallas fused kernels at several block configs, fwd
and fwd+bwd, so the fused path's defaults can be retuned (r1 defaults
bm=256/bv=1024 re-stream W 192x -> lost to the composite).

Run: timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/sweep_ce.py
"""

from __future__ import annotations

import functools
import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12
N, V, D = 49152, 16384, 768
HEAD_FL = 2 * N * V * D


def chain_time(step_fn, x0, iters=16, reps=5):
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


def report(name, flops, dt):
    print(f"{name:52s} {dt*1e3:8.3f} ms  MFU={flops/dt/PEAK:.4f}", flush=True)


def main():
    from neuronika_tpu.ops.pallas import cross_entropy as CE

    x = jax.random.normal(jax.random.key(0), (N, D), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (V, D), jnp.bfloat16) / D**0.5
    t = jax.random.randint(jax.random.key(2), (N,), 0, V)
    print(f"device: {jax.devices()[0]}", flush=True)

    def norm(y):
        return y * jax.lax.rsqrt((y.astype(jnp.float32) ** 2).mean()
                                 + 1.0).astype(y.dtype)

    # composite oracle, fwd and fwd+bwd
    def comp(x):
        l = CE.reference_linear_cross_entropy(x, w, t)
        return x * (1.0 + 0.0 * l).astype(x.dtype)
    try:
        report("composite fwd", HEAD_FL, chain_time(comp, x))
    except Exception:
        traceback.print_exc()

    gc = jax.grad(lambda x, w: CE.reference_linear_cross_entropy(x, w, t),
                  argnums=(0, 1))

    def compb(st):
        xx, ww = st
        dx, dw = gc(xx, ww)
        return (norm(dx * 1e4).astype(xx.dtype), norm(dw * 1e4).astype(ww.dtype))
    try:
        report("composite fwd+bwd", 3 * HEAD_FL, chain_time(compb, (x, w), iters=8))
    except Exception:
        traceback.print_exc()

    # fused fwd at several blocks
    for bm, bv in ((None, 1024),):
        def ff(x, bm=bm, bv=bv):
            l = CE.fused_linear_cross_entropy(x, w, t, bm, bv)
            return x * (1.0 + 0.0 * l).astype(x.dtype)
        try:
            report(f"fused fwd bm{bm} bv{bv}", HEAD_FL, chain_time(ff, x))
        except Exception as e:  # noqa: BLE001
            print(f"fused fwd bm{bm} bv{bv}: {type(e).__name__} {e}",
                  flush=True)

    # fused fwd+bwd at several blocks
    for bm, bv in ((None, 1024),):
        gf = jax.grad(lambda x, w, bm=bm, bv=bv:
                      CE.fused_linear_cross_entropy(x, w, t, bm, bv),
                      argnums=(0, 1))

        def fb(st, gf=gf):
            xx, ww = st
            dx, dw = gf(xx, ww)
            return (norm(dx * 1e4).astype(xx.dtype),
                    norm(dw * 1e4).astype(ww.dtype))
        try:
            report(f"fused fwd+bwd bm{bm} bv{bv}", 3 * HEAD_FL,
                   chain_time(fb, (x, w), iters=8))
        except Exception as e:  # noqa: BLE001
            print(f"fused fwd+bwd bm{bm} bv{bv}: {type(e).__name__} {e}",
                  flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
