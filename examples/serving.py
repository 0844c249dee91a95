"""Serving walkthrough: one-shot generation, quantization, continuous
batching, and tensor-parallel serving.

Runs on CPU (tiny model) or a TPU; see docs/SERVING.md for the design
and measured numbers.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from neuronika_tpu import parallel
from neuronika_tpu.models import transformer as T
from neuronika_tpu.serving import ContinuousBatcher

cfg = T.GPTConfig(vocab_size=256, n_layer=2, n_head=4, d_model=128,
                  d_ff=512, max_seq=128, dtype=jnp.float32, flash="off")
params = T.init_params(jax.random.key(0), cfg)

# --- one-shot: ONE compiled program (batched prefill + scanned decode)
gen = T.make_generate(cfg, max_new=16, temperature=0.8, top_k=40,
                      quant="int8")
prompt = jnp.asarray([[10, 11, 12, 13]], jnp.int32)
out = gen(params, prompt, jax.random.key(1))
print("one-shot int8 sample:", np.asarray(out)[0].tolist())

# --- continuous batching: requests of different lengths share a slot
# pool; a finished slot is reassigned immediately
cb = ContinuousBatcher(params, cfg, n_slots=2, eos_id=None)
r1 = cb.submit(np.array([1, 2, 3], np.int32), max_new=8)
r2 = cb.submit(np.array([4, 5], np.int32), max_new=12)
r3 = cb.submit(np.array([6], np.int32), max_new=4)   # queued behind 2 slots
done = cb.run()
for rid in (r1, r2, r3):
    print(f"request {rid}: {done[rid].tolist()}")

# --- throughput mode: a deferred burst admits same-bucket prompts in
# ONE multi-row prefill, and multi-step windows decode k tokens per
# host round trip — outputs identical to the per-step path above
cb2 = ContinuousBatcher(params, cfg, n_slots=4, eos_id=None,
                        prefill_bucket="pow2")
with cb2.defer_admission():
    rids = [cb2.submit(np.arange(1, 4 + i, dtype=np.int32), max_new=8)
            for i in range(6)]
done2 = cb2.run(multi_step=8)
print("burst of 6 over 4 slots:",
      {r: done2[r].tolist()[:4] for r in rids[:2]}, "...")

# --- tensor-parallel serving (works on any mesh; here CPU devices)
if jax.device_count() >= 2:
    mesh = parallel.make_mesh([("dp", 1), ("tp", 2)],
                              devices=jax.devices()[:2])
    gen_tp = T.make_generate(cfg, max_new=16, mesh=mesh)
    out_tp = gen_tp(params, prompt, jax.random.key(1))
    print("tp serving greedy:", np.asarray(out_tp)[0].tolist())
