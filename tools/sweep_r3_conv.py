"""R3 TPU sweep: new pallas conv variants + flash chain-glue validation."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import _timed_chain, _measure_rtt, _device_peak

peak = _device_peak()
rtt = _measure_rtt()
print(f"rtt {rtt*1e3:.2f} ms", flush=True)

from neuronika_tpu.ops.pallas.conv import (
    conv2d_pallas_nhwc, _conv2d_s1_nhwc, conv2d_dw_nhwc)

B, C, HW = 64, 256, 56
xh = jax.random.normal(jax.random.key(0), (B, HW, HW, C), jnp.bfloat16)
wh = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) / 48.0
flv = 2 * B * C * C * 9 * HW * HW

# fwd block_h sweep (VALID kernel directly, SAME adds pad copy)
for bh in (0,):
    try:
        dt = _timed_chain(lambda x: conv2d_pallas_nhwc(x, wh).astype(jnp.bfloat16)
                          if False else
                          jnp.pad(_conv2d_s1_nhwc(jnp.pad(x, ((0,0),(1,1),(1,1),(0,0))), wh, block_h=bh),
                                  ((0,0),(0,0),(0,0),(0,0))).astype(jnp.bfloat16), xh, rtt)
        print(f"pallas s1 SAME bh={bh}: {flv/dt/peak:.4f} MFU ({dt*1e3:.3f} ms)", flush=True)
    except Exception as e:
        print(f"bh={bh} FAIL {type(e).__name__}: {e}", flush=True)

# dw kernel standalone
g0 = jax.random.normal(jax.random.key(2), (B, HW, HW, C), jnp.bfloat16)
def dw_chain(x):
    d = conv2d_dw_nhwc(jnp.pad(x, ((0,0),(1,1),(1,1),(0,0))), g0, 3, 3)
    return x.at[0,0,0,0].set(d[0,0,0,0].astype(x.dtype))
try:
    dt = _timed_chain(dw_chain, xh, rtt)
    print(f"pallas dw kernel: {flv/dt/peak:.4f} MFU ({dt*1e3:.3f} ms)", flush=True)
except Exception as e:
    print(f"dw FAIL {type(e).__name__}: {e}", flush=True)

# full fwd+bwd via custom vjp
g = jax.grad(lambda x, w: jnp.tanh(conv2d_pallas_nhwc(x, w).astype(jnp.float32)).sum(), argnums=(0, 1))
def fb_chain(state):
    x_, wa = state
    dx, dw = g(x_, wh)
    return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw
try:
    dt = _timed_chain(fb_chain, (xh, jnp.zeros_like(wh, jnp.float32)), rtt, iters=16)
    print(f"pallas fwd+bwd: {3*flv/dt/peak:.4f} MFU ({dt*1e3:.3f} ms)", flush=True)
except Exception as e:
    print(f"fwdbwd FAIL {type(e).__name__}: {e}", flush=True)

# stride-2
w2 = jax.random.normal(jax.random.key(3), (3, 3, C, 2*C), jnp.bfloat16) / 48.0
fl2 = 2 * B * 28 * 28 * C * 2*C * 9
def s2_chain(x):
    y = conv2d_pallas_nhwc(x, w2, (2, 2))
    return x.at[0,0,0,0].set(y[0,0,0,0].astype(x.dtype))
try:
    dt = _timed_chain(s2_chain, xh, rtt)
    print(f"pallas s2 fwd: {fl2/dt/peak:.4f} MFU ({dt*1e3:.3f} ms)", flush=True)
except Exception as e:
    print(f"s2 FAIL {type(e).__name__}: {e}", flush=True)

# second shape: C=512 HW=28 (deep-stage resnet conv)
C2, HW2 = 512, 28
x2 = jax.random.normal(jax.random.key(5), (B, HW2, HW2, C2), jnp.bfloat16)
wv = jax.random.normal(jax.random.key(6), (3, 3, C2, C2), jnp.bfloat16) / 68.0
flv2 = 2 * B * C2 * C2 * 9 * HW2 * HW2
try:
    dt = _timed_chain(lambda x: conv2d_pallas_nhwc(x, wv).astype(jnp.bfloat16), x2, rtt)
    print(f"pallas s1 C512 HW28: {flv2/dt/peak:.4f} MFU", flush=True)
    def xla2(x):
        return lax.conv_general_dilated(x, wv, (1,1), "SAME",
            dimension_numbers=("NHWC","HWIO","NHWC")).astype(jnp.bfloat16)
    from jax import lax
    dt = _timed_chain(xla2, x2, rtt)
    print(f"XLA    s1 C512 HW28: {flv2/dt/peak:.4f} MFU", flush=True)
except Exception as e:
    print(f"C512 FAIL {type(e).__name__}: {e}", flush=True)

# XLA reference at same shape (SAME, NHWC)
from jax import lax
def xla_conv(x):
    return lax.conv_general_dilated(x, wh, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC")).astype(jnp.bfloat16)
dt = _timed_chain(xla_conv, xh, rtt)
print(f"XLA NHWC s1 SAME: {flv/dt/peak:.4f} MFU ({dt*1e3:.3f} ms)", flush=True)

# ---- glue validation: .at[0,0,0].set trick vs direct chain on split flash
from neuronika_tpu.ops.pallas.attention import flash_attention
Bq, H, S, D = 4, 8, 2048, 128
q, k, v = (jax.random.normal(jax.random.key(i), (Bq, H, S, D), jnp.bfloat16) for i in range(3))
fl = 2 * Bq * H * S * S * D
dt = _timed_chain(lambda x: flash_attention(x, k, v, True, None, 512, 512), q, rtt)
print(f"flash split direct chain: {fl/dt/peak:.4f} MFU", flush=True)
def at_chain(x):
    o = flash_attention(x, k, v, True, None, 512, 512)
    return x.at[0,0,0,0].set(o[0,0,0,0].astype(x.dtype))
dt = _timed_chain(at_chain, q, rtt)
print(f"flash split at-trick chain: {fl/dt/peak:.4f} MFU", flush=True)
print("SWEEP DONE", flush=True)
