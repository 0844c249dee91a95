"""Time the S4096 packed-qkv split backward at different block_q
(block_k is clamped to 256 by the scoped-VMEM guard; bq is
footprint-neutral there). Run alone on the TPU:
python tools/probe_s4096_bq.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _timed_chain, _measure_rtt, _device_peak
from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

peak = _device_peak()
rtt = _measure_rtt()
S, hd, B, H = 4096, 128, 2, 12
W = 3 * H * hd
qkv = jax.random.normal(jax.random.key(9), (B, S, W),
                        jnp.bfloat16) / (hd ** 0.25)
fl = 2 * B * H * S * S * hd

for bq in [256, 512, 1024]:
    g = jax.grad(lambda x, bq=bq: flash_attention_qkv(
        x, None, H, H, True, None, bq, 512, False, 0.0, True, True,
    ).astype(jnp.float32).sum())

    def fb(x, g=g):
        d = g(x)
        return x.at[0, 0, 0].set(d[0, 0, 0].astype(x.dtype))

    try:
        t0 = time.time()
        dt = _timed_chain(fb, qkv, rtt, iters=4)
        print(f"bq={bq} f+b: {(fl * 7 // 2) / dt / peak:.4f} MFU "
              f"({dt * 1e3:.3f} ms; {time.time() - t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bq={bq}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
print("DONE", flush=True)
