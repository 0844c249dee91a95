"""Sweep the batched bf16 define-by-run GPT (build_var_model_batched) on the
real TPU: tokens/s + MFU across batch sizes, vs the functional tier at the
identical shape (VERDICT r3 #1's done-bar is mfu >= 0.40 or >= 50% of the
functional tier at the same shape)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import neuronika_tpu as nk
from neuronika_tpu import optim
from neuronika_tpu.models import transformer as T
from bench import _device_peak, _run_config

peak = _device_peak()
S = 1024
cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6, d_model=768,
                  d_ff=3072, max_seq=S, dtype=jnp.bfloat16, dropout=0.0,
                  flash="auto", flash_block=512)

for B in (8, 16, 32):
    nk.seed(0)
    np.random.seed(0)
    params, fwd = T.build_var_model_batched(cfg, B, S)
    opt = optim.Adam(1e-4)
    opt.register_all(params)
    ids = np.random.randint(0, cfg.vocab_size, (B, S)).astype("float32")
    tgt = np.roll(ids, -1, axis=1).reshape(-1)
    xv, tv = nk.from_ndarray(ids), nk.from_ndarray(tgt)
    loss = fwd(xv).reshape((B * S, cfg.vocab_size)).log_softmax(1).t().nll(
        tv, nk.Reduction.Mean)

    def step(block=False):
        xv.node.value = jnp.asarray(ids)
        tv.node.value = jnp.asarray(tgt)
        opt.train_step(loss, block=block)

    t0 = time.perf_counter()
    step(block=True)
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        step()
    float(loss.item())
    steps = 8
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    lv = float(loss.item())
    dt = (time.perf_counter() - t0) / steps
    tok = B * S / dt
    mfu = T.flops_per_token(cfg, S) * tok / peak
    print(f"B={B}: {tok:,.0f} tok/s  mfu={mfu:.4f}  step={dt*1e3:.1f}ms "
          f"compile={compile_s:.0f}s loss={lv:.4f}", flush=True)

# functional tier at the identical shape (B matching the best var B)
for B in (8, 16, 32):
    try:
        dt, rtt, lv, _ = _run_config(T, cfg, B, S, 8)
        tok = B * S / dt
        print(f"functional B={B}: {tok:,.0f} tok/s  "
              f"mfu={T.flops_per_token(cfg, S) * tok / peak:.4f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"functional B={B}: {type(e).__name__} {e}", flush=True)
