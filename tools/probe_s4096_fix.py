"""Verify the split-bwd kv-block clamp: compile + measure the S4096
packed-qkv flash fwd/fwd+bwd at both the tool shape (B2 H8) and the
bench shape (B2 H12). Run alone on the TPU:
python tools/probe_s4096_fix.py
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
S, hd = 4096, 128

for B, H in [(2, 8), (2, 12)]:
    W = 3 * H * hd
    qkv = jax.random.normal(jax.random.key(9), (B, S, W),
                            jnp.bfloat16) / (hd ** 0.25)
    fl = 2 * B * H * S * S * hd

    def fwd(x, H=H):
        o = flash_attention_qkv(x, None, H, H, True, None, 512, 512,
                                False, 0.0, True, True)
        return x.at[0, 0, 0].set(o[0, 0, 0].astype(x.dtype))

    g = jax.grad(lambda x, H=H: flash_attention_qkv(
        x, None, H, H, True, None, 512, 512, False, 0.0, True, True,
    ).astype(jnp.float32).sum())

    def fb(x, g=g):
        d = g(x)
        return x.at[0, 0, 0].set(d[0, 0, 0].astype(x.dtype))

    try:
        t0 = time.time()
        dt = _timed_chain(fwd, qkv, rtt, iters=8)
        print(f"B={B} H={H} fwd:  {fl / dt / peak:.4f} MFU "
              f"({dt * 1e3:.3f} ms; {time.time() - t0:.0f}s)", flush=True)
        t0 = time.time()
        dt = _timed_chain(fb, qkv, rtt, iters=4)
        print(f"B={B} H={H} f+b:  {(fl * 7 // 2) / dt / peak:.4f} MFU "
              f"({dt * 1e3:.3f} ms; {time.time() - t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"B={B} H={H}: FAIL {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
print("DONE", flush=True)
