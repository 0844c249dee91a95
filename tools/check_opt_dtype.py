"""Loss-curve equivalence: Adam f32 state vs bf16 state.

Trains the d768 flagship at B8 for 200 steps with both state dtypes on
identical data/keys and prints the loss trajectories + max divergence.
Gate for making opt_state_dtype="bf16" the flagship bench default.

Run: timeout 580 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/check_opt_dtype.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def run(state_dtype, steps=200):
    from neuronika_tpu.models import transformer as T

    cfg = T.GPTConfig(
        vocab_size=16384, n_layer=8, n_head=6, d_model=768, d_ff=3072,
        max_seq=1024, dropout=0.0, dtype=jnp.bfloat16,
        flash="auto", remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
        opt_state_dtype=state_dtype,
    )
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.opt_init(params, cfg)
    step = T.make_train_step(cfg)
    B, S = 8, 1024
    lr = jnp.float32(3e-4)
    losses = []
    for i in range(steps):
        k = jax.random.fold_in(jax.random.key(42), i)
        tok = jax.random.randint(jax.random.fold_in(k, 1), (B, S), 0,
                                 cfg.vocab_size)
        # next-token-ish targets: shifted tokens (structured, learnable)
        tgt = jnp.roll(tok, -1, axis=1)
        params, opt, loss = step(params, opt, tok, tgt, lr, k)
        if i % 20 == 0 or i == steps - 1:
            losses.append((i, float(loss)))
    return losses


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    lf = run("f32")
    print("f32 :", " ".join(f"{i}:{l:.4f}" for i, l in lf), flush=True)
    lb = run("bf16")
    print("bf16:", " ".join(f"{i}:{l:.4f}" for i, l in lb), flush=True)
    div = max(abs(a[1] - b[1]) for a, b in zip(lf, lb))
    rel = div / abs(lf[-1][1])
    print(f"max abs divergence {div:.4f}  (rel to final loss {rel:.4%})",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
