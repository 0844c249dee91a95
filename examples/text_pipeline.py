"""End-to-end text pipeline: tokenizer -> GPT training -> generation.

Trains a byte-level BPE tokenizer on a small corpus, pre-trains a tiny
llama-style model on the token stream, evaluates perplexity, and
generates a continuation — the full loop a language-model user runs,
on the framework's own pieces (data.BpeTokenizer, models.transformer,
make_train_step, evaluate, generate).

Runs anywhere (CPU ok):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/text_pipeline.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuronika_tpu.data import BpeTokenizer
from neuronika_tpu.models import transformer as T

CORPUS = (
    "the sun rose over the quiet valley and the river kept moving. "
    "a traveler walked the long road toward the distant town. "
    "the town slept while the river sang its old song. "
    "every morning the valley filled with light and the road woke up. "
) * 40

SEQ = 64


def main():
    # 1. tokenizer
    tok = BpeTokenizer.train([CORPUS], vocab_size=512,
                             special_tokens=["<|end|>"])
    ids = np.array(tok.encode(CORPUS), np.int32)
    print(f"tokenizer: vocab {tok.vocab_size}, corpus {len(ids)} tokens "
          f"({len(CORPUS) / len(ids):.2f} bytes/token)")

    # 2. batching: contiguous SEQ+1 windows
    from neuronika_tpu.data import lm_windows

    toks, tgts = lm_windows(ids, SEQ)
    n_win = len(toks)
    split = max(1, int(n_win * 0.9))
    print(f"dataset: {split} train / {n_win - split} eval windows of {SEQ}")

    # 3. model + fused train step
    cfg = T.llama_config(vocab_size=tok.vocab_size, n_layer=2, n_head=4,
                         d_model=128, d_ff=256, max_seq=SEQ,
                         dtype=jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    step = T.make_train_step(cfg, grad_clip=1.0)
    opt = T.adam_init(params)
    B = min(16, split)
    rng = np.random.default_rng(0)
    for it in range(60):
        sel = rng.integers(0, split, B)
        params, opt, loss = step(
            params, opt, jnp.asarray(toks[sel]), jnp.asarray(tgts[sel]),
            jnp.float32(3e-3), jax.random.key(it))
        if it % 20 == 0 or it == 59:
            print(f"step {it:3d} loss {float(loss):.3f}")

    # 4. held-out perplexity
    ev = T.evaluate(params, cfg,
                    [(toks[split:], tgts[split:])] if n_win > split else
                    [(toks[:1], tgts[:1])])
    print(f"eval: loss {ev['loss']:.3f}, perplexity {ev['perplexity']:.2f} "
          f"over {ev['tokens']} tokens")

    # 5. generate a continuation
    prompt = "the sun rose over"
    pids = jnp.asarray([tok.encode(prompt)], jnp.int32)
    out = T.generate(params, cfg, pids, max_new=24)
    print("prompt:      ", prompt)
    print("continuation:", tok.decode(np.asarray(out)[0].tolist()))


if __name__ == "__main__":
    main()
