"""Flagship shape sweep with bf16 Adam state + r2 kernel winners.

MFU attribution showed every d768/S1024 component near its floor (body
matmuls 0.93, flash bandwidth-bound 0.28, LN at HBM speed, composite CE
0.74, adam state traffic halved by bf16). The remaining MFU lever is the
SHAPE: larger d_model raises matmul arithmetic intensity; S=2048 doubles
flash's credited flops at better kernel MFU. All runs: 49152 tokens/step.

Run: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/sweep_shapes.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax import lax

PEAK = 197e12


def chain_time(step_fn, x0, iters=6, reps=3):
    # dynamic trip count: ONE compile serves both chain lengths
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
    common = dict(
        vocab_size=16384, dropout=0.0, dtype=jnp.bfloat16, flash="auto",
        scan_layers=False, flash_block=1024, matmul_out="compute",
        flash_softmax="fast", flash_bwd="fused", opt_state_dtype="bf16",
    )
    runs = [
        ("d1536 L8 S1024 B32", dict(n_layer=8, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False), 32, 1024),
        ("d1536 L8 S1024 B40", dict(n_layer=8, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False), 40, 1024),
        ("d1536 L8 S2048 B16 fb512", dict(n_layer=8, n_head=12, d_model=1536,
         d_ff=6144, max_seq=2048, remat=False, flash_block=512), 16, 2048),
        ("d2048 L8 S1024 B24", dict(n_layer=8, n_head=16, d_model=2048,
         d_ff=8192, max_seq=1024, remat=False), 24, 1024),
        ("d1792 L8 S1024 B28", dict(n_layer=8, n_head=14, d_model=1792,
         d_ff=7168, max_seq=1024, remat=False), 28, 1024),
        ("d1536 L12 S1024 B24", dict(n_layer=12, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False), 24, 1024),
        # champion micro-variants (idx 6-8)
        ("d1536 B24 logits=compute", dict(n_layer=8, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False, logits_dtype="compute"),
         24, 1024),
        ("d1536 B24 fb512", dict(n_layer=8, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False, flash_block=512), 24, 1024),
        ("d1536 B28", dict(n_layer=8, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False), 28, 1024),
        # depth/sequence variants (idx 9-12): amortise head+embed over a
        # deeper body; S2048 runs flash at its efficient regime (0.63 f+b
        # standalone vs 0.28 at S1024)
        ("d1536 L12 S1024 B16", dict(n_layer=12, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False), 16, 1024),
        ("d1536 L16 S1024 B12", dict(n_layer=16, n_head=12, d_model=1536,
         d_ff=6144, max_seq=1024, remat=False), 12, 1024),
        ("d1536 L12 S2048 B8 fb512", dict(n_layer=12, n_head=12,
         d_model=1536, d_ff=6144, max_seq=2048, remat=False,
         flash_block=512), 8, 2048),
        ("d1536 L8 S2048 B12 fb512", dict(n_layer=8, n_head=12,
         d_model=1536, d_ff=6144, max_seq=2048, remat=False,
         flash_block=512), 12, 2048),
        ("d1536 L8 S2048 B20 fb512", dict(n_layer=8, n_head=12,
         d_model=1536, d_ff=6144, max_seq=2048, remat=False,
         flash_block=512), 20, 2048),
        ("d1536 L8 S2048 B24 fb512", dict(n_layer=8, n_head=12,
         d_model=1536, d_ff=6144, max_seq=2048, remat=False,
         flash_block=512), 24, 2048),
        ("d1536 L8 S4096 B8 fb512", dict(n_layer=8, n_head=12,
         d_model=1536, d_ff=6144, max_seq=4096, remat=False,
         flash_block=512), 8, 4096),
        ("d1536 L8 S2048 B18 fb512", dict(n_layer=8, n_head=12,
         d_model=1536, d_ff=6144, max_seq=2048, remat=False,
         flash_block=512), 18, 2048),
        ("d1536 L8 S2048 B16 fb768", dict(n_layer=8, n_head=12,
         d_model=1536, d_ff=6144, max_seq=2048, remat=False,
         flash_block=768), 16, 2048),
    ]
    import sys
    sel = [int(a) for a in sys.argv[1:]] or range(len(runs))
    runs = [runs[i] for i in sel]
    for name, over, B, S in runs:
        try:
            cfg = T.GPTConfig(**{**common, **over})
            params = T.init_params(jax.random.key(0), cfg)
            opt = T.opt_init(params, cfg)
            step = T.make_train_step(cfg)
            tok = jax.random.randint(jax.random.key(1), (B, S), 0,
                                     cfg.vocab_size)
            tgt = jnp.roll(tok, -1, axis=1)
            lr = jnp.float32(3e-4)
            key = jax.random.key(2)

            def one(st, step=step, tok=tok, tgt=tgt, lr=lr, key=key):
                p, o = st
                p, o, loss = step(p, o, tok, tgt, lr, key)
                return (p, o)

            dt = chain_time(one, (params, opt))
            fl = T.flops_per_token(cfg, S) * B * S
            print(f"{name}  {dt*1e3:8.2f} ms  {B*S/dt/1e3:7.1f} ktok/s  "
                  f"MFU={fl/dt/PEAK:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()

    print("done", flush=True)


if __name__ == "__main__":
    main()
