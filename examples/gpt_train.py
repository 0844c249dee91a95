"""Mini GPT-2 end-to-end: train on synthetic text, checkpoint, generate.

The flagship functional tier (BASELINE.md configs[4]): fused jitted train
step (fwd+bwd+Adam), bf16 matmuls on TPU (f32 on CPU), flash attention when
on TPU, KV-cache incremental decoding for sampling."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from neuronika_tpu import utils
from neuronika_tpu.models import transformer as T

TEXT = (
    "the quick brown fox jumps over the lazy dog. "
    "she sells sea shells by the sea shore. "
) * 40


def main():
    chars = sorted(set(TEXT))
    stoi = {c: i for i, c in enumerate(chars)}
    data = np.array([stoi[c] for c in TEXT], dtype=np.int32)

    S = 64
    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = T.GPTConfig(
        vocab_size=len(chars), n_layer=2, n_head=2, d_model=128, d_ff=256,
        max_seq=S, dropout=0.0,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    params = T.init_params(jax.random.key(0), cfg)
    opt_state = T.adam_init(params)
    step = T.make_train_step(cfg)

    rng = np.random.default_rng(0)
    B = 16
    for it in range(200):
        starts = rng.integers(0, len(data) - S - 1, B)
        toks = jnp.asarray(np.stack([data[s:s + S] for s in starts]))
        tgts = jnp.asarray(np.stack([data[s + 1:s + S + 1] for s in starts]))
        params, opt_state, loss = step(
            params, opt_state, toks, tgts, jnp.float32(3e-3),
            jax.random.key(it),
        )
        if it % 50 == 0:
            print(f"step {it}: loss {float(loss):.3f}")

    # checkpoint round-trip
    utils.save_pytree("/tmp/gpt_params.npz", params)
    params = utils.load_pytree("/tmp/gpt_params.npz", params)

    prompt = "the quick "
    ids = np.array([[stoi[c] for c in prompt]], np.int32)
    out = T.generate(params, cfg, ids, max_new=40)
    print("sample:", "".join(chars[i] for i in out[0]))

    # same thing as ONE compiled program (prefill + all decode steps on
    # device — the serving path; no per-token host round trips)
    gen = T.make_generate(cfg, max_new=40, temperature=0.8, top_k=8)
    out = np.asarray(gen(params, jnp.asarray(ids), jax.random.key(7)))
    print("sample (on-device):", "".join(chars[i] for i in out[0]))

    # beam search: the K most probable continuations, sorted best-first
    toks, scores = T.make_beam_search(cfg, max_new=40, n_beams=3)(
        params, jnp.asarray(ids))
    for k in range(3):
        print(f"beam {k} ({float(scores[0, k]):7.2f}):",
              "".join(chars[i] for i in np.asarray(toks)[0, k]))


if __name__ == "__main__":
    main()
