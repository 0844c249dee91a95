"""Attribution of the var-API GPT gap vs the functional tier (VERDICT r2
#7): run the FUNCTIONAL tier under the same handicaps the Var tier has
(B=1, f32, no flash, materialised S^2 attention) and compare."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import _run_config, _device_peak, _bench_var_api_gpt
from neuronika_tpu.models import transformer as T

peak = _device_peak()
# functional tier, same handicaps as Var tier
cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6, d_model=768,
                  d_ff=3072, max_seq=1024, dropout=0.0, dtype=jnp.float32,
                  flash="off", remat=False)
dt, rtt, lv, _ = _run_config(T, cfg, 1, 1024, 8)
tok = 1024 / dt
print(f"functional B=1 f32 no-flash: {tok:.1f} tok/s, "
      f"mfu {T.flops_per_token(cfg, 1024)*1024/dt/peak:.4f}", flush=True)
# functional same but bf16 (isolates dtype)
cfg2 = T.GPTConfig(**{**cfg.__dict__, "dtype": jnp.bfloat16})
dt2, _, _, _ = _run_config(T, cfg2, 1, 1024, 8)
print(f"functional B=1 bf16 no-flash: {1024/dt2:.1f} tok/s", flush=True)
# var tier (same as bench)
va = _bench_var_api_gpt(peak)
print("var api:", va, flush=True)
print(f"ratio var/functional-same-handicaps: {va['tokens_per_sec']/tok:.3f}",
      flush=True)
print("DONE", flush=True)
