"""End-to-end training demo: char-GPT on this repository's own source.

Real data (every .py/.md file under the repo, byte-level vocab 256), the
flagship train step (bf16, flash, bf16-adam), a real loss curve, and
sampled code at the end — evidence the framework trains, not just that
the step is fast. Runs in one TPU process; ~7k steps in a few minutes.

Run: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/train_demo.py [steps]
"""

from __future__ import annotations

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def load_corpus(root="/root/repo"):
    parts = []
    for pat in ("**/*.py", "**/*.md"):
        for f in sorted(pathlib.Path(root).glob(pat)):
            if ".git" in f.parts:
                continue
            try:
                parts.append(f.read_bytes())
            except OSError:
                pass
    data = b"\n\n".join(parts)
    return np.frombuffer(data, np.uint8).astype(np.int32)


def main(steps=7000):
    from neuronika_tpu.models import transformer as T

    corpus = load_corpus()
    n_val = len(corpus) // 20
    train, val = corpus[:-n_val], corpus[-n_val:]
    print(f"corpus: {len(corpus)/1e6:.2f}M bytes "
          f"({len(train)/1e6:.2f} train / {n_val/1e3:.0f}k val)", flush=True)

    B, S = 32, 512
    cfg = T.GPTConfig(
        vocab_size=256, n_layer=8, n_head=8, d_model=512, d_ff=2048,
        max_seq=S, dropout=0.0, dtype=jnp.bfloat16, flash="auto",
        remat=False, scan_layers=False, flash_block=512,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
        opt_state_dtype="bf16",
    )
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.opt_init(params, cfg)
    step = T.make_train_step(cfg, grad_clip=1.0)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model: d512 L8 H8 S512 — {n_params/1e6:.1f}M params", flush=True)

    rng = np.random.default_rng(0)

    def batch(src):
        ix = rng.integers(0, len(src) - S - 1, B)
        x = np.stack([src[i:i + S] for i in ix])
        y = np.stack([src[i + 1:i + S + 1] for i in ix])
        return jnp.asarray(x), jnp.asarray(y)

    # per-call dispatch through the axon tunnel costs ~100+ ms, so the
    # host loop scans K steps per compiled call (data shipped as one
    # (K, B, S) block) — 0.07 -> ~0.5+ MFU for the same model.
    K = 100
    warm = 200
    from jax import lax

    @jax.jit
    def multi(params, opt, toks, tgts, lrs, keys):
        def body(carry, mb):
            p, o = carry
            p, o, l = step(p, o, mb[0], mb[1], mb[2], mb[3])
            return (p, o), l

        (params, opt), losses = lax.scan(
            body, (params, opt), (toks, tgts, lrs, keys))
        return params, opt, losses

    vloss = jax.jit(lambda p, x, y: T.loss_fn(p, x, y, cfg, train=False))
    t0 = time.perf_counter()
    done_steps = 0
    while done_steps < steps:
        idx = done_steps + np.arange(K)
        lrs = jnp.asarray(3e-4 * np.minimum(1.0, (idx + 1) / warm)
                          * 0.5 * (1 + np.cos(np.pi * idx / steps)),
                          jnp.float32)
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(1), i)
                        )(jnp.asarray(idx))
        toks, tgts = zip(*(batch(train) for _ in range(K)))
        params, opt, losses = multi(params, opt, jnp.stack(toks),
                                    jnp.stack(tgts), lrs, keys)
        done_steps += K
        if done_steps % 500 == 0 or done_steps >= steps:
            vx, vy = batch(val)
            vl = float(vloss(params, vx, vy))
            print(f"step {done_steps:5d}  train {float(losses[-1]):.4f}  "
                  f"val {vl:.4f}  "
                  f"({done_steps*B*S/(time.perf_counter()-t0)/1e3:.0f}"
                  f" ktok/s)", flush=True)

    prompt = b"def forward(self"
    out = T.generate(params, cfg,
                     np.frombuffer(prompt, np.uint8).astype(np.int32)[None],
                     200, key=jax.random.key(7), temperature=0.8, top_k=40)
    txt = bytes(int(c) for c in out[0]).decode("utf-8", "replace")
    print("--- sample ---", flush=True)
    print(txt, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 7000)
