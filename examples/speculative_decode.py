"""Speculative decoding end-to-end: draft proposes, target verifies.

A small draft model proposes `gamma` tokens with cheap scanned decode
steps; the target model scores all of them in ONE chunked verify pass
(decode is weight-bandwidth-bound, so verifying gamma+1 tokens costs
about one target step) and emits the longest matching prefix plus its
own correction. The output is EXACTLY the target's greedy continuation
for ANY draft — the draft only changes speed.

Reference pitch: models/transformer.py::make_speculative_generate;
measured envelope (2.0x at full acceptance on a v5e) in docs/PERF.md
"Speculative decoding".

Run (CPU demo):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/speculative_decode.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from neuronika_tpu.models import transformer as T

# a "real" target and a 4x-smaller draft (shared vocabulary)
cfg_t = T.GPTConfig(vocab_size=512, n_layer=4, n_head=4, d_model=256,
                    d_ff=1024, max_seq=160, dtype=jnp.float32)
cfg_d = T.GPTConfig(vocab_size=512, n_layer=2, n_head=2, d_model=64,
                    d_ff=256, max_seq=160, dtype=jnp.float32)
params_t = T.init_params(jax.random.key(0), cfg_t)
params_d = T.init_params(jax.random.key(1), cfg_d)

P, N, GAMMA = 16, 64, 4
prompt = jax.random.randint(jax.random.key(2), (1, P), 1, cfg_t.vocab_size)

# plain greedy baseline — the output speculative decoding must reproduce
gen = T.make_generate(cfg_t, max_new=N)
ref = np.asarray(gen(params_t, prompt, jax.random.key(3)))

spec = T.make_speculative_generate(cfg_t, cfg_d, max_new=N, gamma=GAMMA)
toks, n_verify = spec(params_t, params_d, prompt)
toks = np.asarray(toks)

np.testing.assert_array_equal(toks, ref)   # exactness, not similarity
accepted = N / int(n_verify)
print(f"greedy-identical output over {N} tokens")
print(f"verify passes: {int(n_verify)} (vs {N} sequential steps for "
      f"plain greedy) -> {accepted:.2f} tokens per verify pass")

# untrained random models rarely agree, so acceptance hovers near 1
# token/round; with a distilled draft the same plumbing reaches ~2x —
# see docs/PERF.md. Timing here is only illustrative on CPU:
t0 = time.perf_counter()
np.asarray(gen(params_t, prompt, jax.random.key(3)))
t_plain = time.perf_counter() - t0
t0 = time.perf_counter()
jax.block_until_ready(spec(params_t, params_d, prompt)[0])
t_spec = time.perf_counter() - t0
print(f"plain {t_plain * 1e3:.0f} ms vs speculative {t_spec * 1e3:.0f} ms "
      f"(speedup needs a draft that matches the target)")
