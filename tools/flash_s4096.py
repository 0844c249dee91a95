"""Flash attention at S=4096 (VERDICT r3 #5 / PERF.md's open item): the
regime where flash MFU should rise past its S2048 figures. r3 never
measured it — big programs were failing remote-compile through the
tunnel. Strategy here: smallest batch that keeps the chain method
honest (B2 H8), flash_block 512, direct first and AOT-exported
(utils/aot) as the fallback compile route.

Run alone on the TPU: python tools/flash_s4096.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _timed_chain, _measure_rtt, _device_peak

peak = _device_peak()
rtt = _measure_rtt()
print(f"rtt {rtt * 1e3:.2f} ms", flush=True)

from neuronika_tpu.ops.pallas.attention import flash_attention_qkv  # noqa

B, H, S, hd = 2, 8, 4096, 128
W = 3 * H * hd
qkv = jax.random.normal(jax.random.key(7), (B, S, W),
                        jnp.bfloat16) / (hd ** 0.25)
fl = 2 * B * H * S * S * hd  # true causal flops


def fwd_chain(x):
    o = flash_attention_qkv(x, None, H, H, True, None, 512, 512,
                            False, 0.0, True, True)
    return x.at[0, 0, 0].set(o[0, 0, 0].astype(x.dtype))


try:
    t0 = time.time()
    dt = _timed_chain(fwd_chain, qkv, rtt, iters=8)
    print(f"flash_qkv fwd S4096: {fl / dt / peak:.4f} MFU "
          f"({dt * 1e3:.3f} ms; compile+run {time.time() - t0:.0f}s)",
          flush=True)
except Exception as e:  # noqa: BLE001
    print(f"flash_qkv fwd S4096 direct: FAIL {type(e).__name__}: {e}",
          flush=True)

g = jax.grad(lambda x: flash_attention_qkv(
    x, None, H, H, True, None, 512, 512, False, 0.0, True, True,
).astype(jnp.float32).sum())


def fb_chain(x):
    d = g(x)
    return x.at[0, 0, 0].set(d[0, 0, 0].astype(x.dtype))


try:
    t0 = time.time()
    dt = _timed_chain(fb_chain, qkv, rtt, iters=4)
    print(f"flash_qkv fwd+bwd S4096: {(fl * 7 // 2) / dt / peak:.4f} MFU "
          f"({dt * 1e3:.3f} ms; compile+run {time.time() - t0:.0f}s)",
          flush=True)
except Exception as e:  # noqa: BLE001
    print(f"flash_qkv f+b S4096 direct: FAIL {type(e).__name__}: {e}",
          flush=True)

# B4 (the r3 shape's batch at doubled sequence) — HBM pressure check
try:
    qkv4 = jax.random.normal(jax.random.key(8), (4, S, W),
                             jnp.bfloat16) / (hd ** 0.25)
    fl4 = 2 * 4 * H * S * S * hd
    dt = _timed_chain(fwd_chain, qkv4, rtt, iters=4)
    print(f"flash_qkv fwd S4096 B4: {fl4 / dt / peak:.4f} MFU "
          f"({dt * 1e3:.3f} ms)", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"flash_qkv fwd S4096 B4: FAIL {type(e).__name__}: {e}",
          flush=True)
print("DONE", flush=True)
