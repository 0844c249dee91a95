import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import _timed_chain, _measure_rtt, _device_peak
peak = _device_peak(); rtt = _measure_rtt()
print(f"rtt {rtt*1e3:.1f}ms", flush=True)
from neuronika_tpu.ops.pallas.attention import flash_attention, flash_attention_qkv

B, H, S, D = 4, 8, 2048, 128
q, k, v = (jax.random.normal(jax.random.key(i), (B, H, S, D), jnp.bfloat16) for i in range(3))
fl = 2 * B * H * S * S * D
for blk in (256, 512, 1024):
    dt = _timed_chain(lambda x: flash_attention(x, k, v, True, None, blk, blk), q, rtt)
    print(f"split fwd blk{blk}: {fl/dt/peak:.4f}", flush=True)

# packed, flagship config (fast softmax), same total work: B=4 H=8 -> W = 3*H*D
W = 3 * H * D
qkv = jax.random.normal(jax.random.key(7), (B, S, W), jnp.bfloat16) / 3.0
for blk in (512, 1024):
    for fast in (False, True):
        def fc(x, blk=blk, fast=fast):
            o = flash_attention_qkv(x, None, H, H, True, None, blk, blk, False, 0.0, fast, True)
            return x.at[0,0,0].set(o[0,0,0].astype(x.dtype))
        dt = _timed_chain(fc, qkv, rtt, iters=16)
        print(f"packed fwd blk{blk} fast={fast}: {fl/dt/peak:.4f}", flush=True)

# jax bundled TPU flash kernel (independent baseline)
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jfa
    dt = _timed_chain(lambda x: jfa(x, k, v, causal=True, sm_scale=1.0/(D**0.5)), q, rtt)
    print(f"jax bundled flash fwd: {fl/dt/peak:.4f}", flush=True)
except Exception as e:
    print("bundled FAIL", type(e).__name__, str(e)[:200], flush=True)

# XLA attention (materialized S^2) baseline
def xla_attn(x):
    att = jnp.einsum("bhqd,bhkd->bhqk", x, k, preferred_element_type=jnp.float32) / (D**0.5)
    mask = jnp.tril(jnp.ones((S, S), bool))
    att = jnp.where(mask, att, -1e30)
    att = jax.nn.softmax(att, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
dt = _timed_chain(xla_attn, q, rtt)
print(f"xla attn: {fl/dt/peak:.4f}", flush=True)

# matmul sanity (today's chip health)
a = jax.random.normal(jax.random.key(0), (4096, 4096), jnp.bfloat16)
b2 = jax.random.normal(jax.random.key(1), (4096, 4096), jnp.bfloat16) / 64.0
dt = _timed_chain(lambda x: jnp.dot(x, b2, preferred_element_type=jnp.bfloat16), a, rtt)
print(f"xla matmul 4096: {2*4096**3/dt/peak:.4f}", flush=True)
print("DONE", flush=True)
