"""Flash kernel block sweep at the in-step shape (B48 H6 S1024 hd128).

At flash_block=1024 with S=1024 the causal path computes the full S^2 tile
and masks half — no causal saving. Smaller blocks skip fully-masked tiles
(512: 3/4 of full, 256: 5/8). This times the packed-qkv fwd and fused bwd
at blocks {256, 512, 1024} plus the split (dq + dkv) bwd, and the real
_attention sublayer through each. ONE process.

Run: timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/sweep_flash.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12
B, S, D, H = 48, 1024, 768, 6
HD = D // H
N = B * S


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


def sq(y):
    return (y.astype(jnp.float32) ** 2).sum()


def norm(y):
    return y * jax.lax.rsqrt((y.astype(jnp.float32) ** 2).mean()
                             + 1.0).astype(y.dtype)


def main():
    from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

    print(f"device: {jax.devices()[0]}", flush=True)
    W = 3 * H * HD
    qkv = jax.random.normal(jax.random.key(0), (B, S, W), jnp.bfloat16)
    fwd_fl = 2 * B * H * S * S * HD  # causal-credited
    bwd_fl = fwd_fl * 5 // 2

    for blk in (256, 512, 1024):
        def fwd(x, blk=blk):
            o = flash_attention_qkv(x, 0.0, H, 0, True, None, blk, blk,
                                    False, 0.0, True)
            return jnp.concatenate([norm(o), x[..., H * HD:]], axis=-1)
        try:
            dt = chain_time(fwd, qkv)
            print(f"qkv fwd   blk{blk:5d}  {dt*1e3:7.3f} ms  "
                  f"MFU={fwd_fl/dt/PEAK:.4f}", flush=True)
        except Exception:
            traceback.print_exc()

        for mode in ("fused", "split"):
            fb = mode == "fused"
            g = jax.grad(lambda x, blk=blk, fb=fb: sq(
                flash_attention_qkv(x, 0.0, H, 0, True, None, blk, blk,
                                    False, 0.0, True, fb)))
            try:
                dt = chain_time(lambda x, g=g: norm(g(x)).astype(jnp.bfloat16),
                                qkv, iters=8)
                print(f"qkv f+b   blk{blk:5d} {mode:5s} {dt*1e3:7.3f} ms  "
                      f"MFU={(fwd_fl+bwd_fl)/dt/PEAK:.4f}", flush=True)
            except Exception:
                traceback.print_exc()

    print("done", flush=True)


if __name__ == "__main__":
    main()
