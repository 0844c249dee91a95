"""R4 sweep: Pallas direct conv vs the XLA conv at ResNet-family shapes,
fwd and fwd+bwd, NHWC both sides — the data the per-shape route table
(ops/pallas/conv.py::route_conv2d) is derived from (VERDICT r3 #2c).

Also A/B's the dw kernel's channel blocking (128 vs 256).

Run on the real chip: python tools/sweep_r4_conv.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _timed_chain, _measure_rtt, _device_peak

peak = _device_peak()
rtt = _measure_rtt()
print(f"rtt {rtt * 1e3:.2f} ms", flush=True)

from neuronika_tpu.ops.pallas.conv import (  # noqa: E402
    conv2d_pallas_nhwc,
    conv2d_dw_nhwc,
)


def xla_conv(x, w, stride=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, stride, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


SHAPES = [
    # (B, HW, Ci, Co, k, s) — ResNet-family NHWC stages
    (64, 112, 64, 64, 3, 1),
    (64, 56, 256, 256, 3, 1),
    (64, 28, 512, 512, 3, 1),
    (64, 14, 1024, 1024, 3, 1),
    (64, 56, 256, 512, 3, 2),
    (64, 112, 64, 128, 3, 2),
    (64, 56, 256, 512, 1, 1),
]

for B, HW, Ci, Co, k, s in SHAPES:
    x = jax.random.normal(jax.random.key(0), (B, HW, HW, Ci), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, k, Ci, Co),
                          jnp.bfloat16) / (Ci * k * k) ** 0.5
    Ho = -(-HW // s)
    fl = 2 * B * Ho * Ho * Ci * Co * k * k
    tag = f"B{B} {HW}x{HW} {Ci}->{Co} k{k} s{s}"

    for name, f in (("pallas", lambda x_: conv2d_pallas_nhwc(x_, w, (s, s))),
                    ("xla", lambda x_: xla_conv(x_, w, (s, s)))):
        try:
            if s == 1 and Ci == Co:
                dt = _timed_chain(lambda x_: f(x_).astype(x_.dtype), x, rtt)
            else:
                def chain(x_, f=f):
                    y = f(x_)
                    return x_.at[0, 0, 0, 0].set(
                        y[0, 0, 0, 0].astype(x_.dtype))
                dt = _timed_chain(chain, x, rtt)
            print(f"{tag} fwd {name}: {fl / dt / peak:.4f} MFU "
                  f"({dt * 1e3:.3f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} fwd {name}: FAIL {type(e).__name__}: {e}",
                  flush=True)

    for name, f in (("pallas", lambda x_, w_: conv2d_pallas_nhwc(
                        x_, w_, (s, s))),
                    ("xla", lambda x_, w_: xla_conv(x_, w_, (s, s)))):
        try:
            g = jax.grad(
                lambda x_, w_, f=f: jnp.tanh(
                    f(x_, w_).astype(jnp.float32)).sum(),
                argnums=(0, 1))

            def chain(state, g=g):
                x_, wa = state
                dx, dw = g(x_, w)
                return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw

            dt = _timed_chain(chain, (x, jnp.zeros_like(w, jnp.float32)),
                              rtt, iters=16)
            print(f"{tag} f+b {name}: {3 * fl / dt / peak:.4f} MFU "
                  f"({dt * 1e3:.3f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} f+b {name}: FAIL {type(e).__name__}: {e}",
                  flush=True)

# dw-kernel channel blocking A/B at the bench shape
B, HW, C = 64, 56, 256
x = jax.random.normal(jax.random.key(0), (B, HW, HW, C), jnp.bfloat16)
g0 = jax.random.normal(jax.random.key(2), (B, HW, HW, C), jnp.bfloat16)
fl = 2 * B * HW * HW * C * C * 9
for blk in (128, 256):
    def dw_chain(x_, blk=blk):
        d = conv2d_dw_nhwc(jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0))),
                           g0, 3, 3, block_ci=blk, block_co=blk)
        return x_.at[0, 0, 0, 0].set(d[0, 0, 0, 0].astype(x_.dtype))
    try:
        dt = _timed_chain(dw_chain, x, rtt)
        print(f"dw blk={blk}: {fl / dt / peak:.4f} MFU ({dt * 1e3:.3f} ms)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"dw blk={blk}: FAIL {type(e).__name__}: {e}", flush=True)
