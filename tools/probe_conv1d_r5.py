"""conv1d r5 probe: two attacks on the 0.70-vs-0.80 gap (the one rank
below BASELINE's north star — VERDICT r4 weak #4).

1. B64 kernel variants: the r4 NWC tap-matmul kernel (0.61) issues k
   shallow K=Ci dots per block; `stack_taps=True` builds the (bl, k*Ci)
   patch IN VMEM (never touching HBM) and issues ONE K=k*Ci dot — the
   deep-K GEMM regime where the bench matmul measures 0.925. Swept
   against block_l 784 (exact tiling, M not %128) / 640 (M %128, 2%
   L padding) / 512.
2. Small batch: the r5 conv2d probe found XLA's emitter tile-quantizes
   on thin batches (pallas +10-22% at B<=4); test whether conv1d has
   the same regime. Both the NWC-native kernel and the framework-
   realistic path (NCW in/out transposes) are timed vs XLA NCH.

Run alone on the TPU (never SIGTERM mid-compile — wedges the tunnel).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_chain, _measure_rtt, _device_peak
from neuronika_tpu.ops.pallas.conv import _conv1d_s1_nwc

peak = _device_peak()
rtt = _measure_rtt()
C, L, K = 256, 3136, 3

w_nwc = (jax.random.normal(jax.random.key(1), (K, C, C), jnp.bfloat16)
         / (C * K) ** 0.5)
w_nch = w_nwc.transpose(2, 1, 0)     # (Co, Ci, k)


def xla_nch(x):
    return lax.conv_general_dilated(
        x, w_nch, (1,), "SAME", dimension_numbers=("NCH", "OIH", "NCH"))


def mfu(dt, B):
    return 2 * B * C * C * K * L / dt / peak


# -- correctness of stack_taps (once, full precision path) ---------------
xs = jax.random.normal(jax.random.key(0), (2, 64, C), jnp.bfloat16)
ref = _conv1d_s1_nwc(xs, w_nwc)
got = _conv1d_s1_nwc(xs, w_nwc, stack_taps=True)
err = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
print(f"stack_taps max err vs 3-tap: {err:.2e}", flush=True)
assert err < 1e-2

# -- 1. B64 variant sweep -------------------------------------------------
B = 64
x_nwc = jax.random.normal(jax.random.key(2), (B, L, C), jnp.bfloat16)
x_nch = x_nwc.transpose(0, 2, 1)

dt = _timed_chain(xla_nch, x_nch, rtt)
print(f"B64 XLA NCH SAME:                  {mfu(dt, B):.4f} ({dt*1e3:.3f} ms)",
      flush=True)

for stack in (False, True):
    for bl in (784, 640, 512):
        def step(x, bl=bl, stack=stack):
            y = _conv1d_s1_nwc(x, w_nwc, block_l=bl, stack_taps=stack)
            return jnp.pad(y, ((0, 0), (0, 2), (0, 0)))
        try:
            dt = _timed_chain(step, x_nwc, rtt)
            tag = "stacked" if stack else "3-tap  "
            print(f"B64 pallas NWC {tag} bl={bl}:      "
                  f"{mfu(dt, B):.4f} ({dt*1e3:.3f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B64 pallas bl={bl} stack={stack}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

# -- 2. small-batch sweep -------------------------------------------------
for B in (1, 2, 4, 8):
    xb_nwc = jax.random.normal(jax.random.key(3), (B, L, C), jnp.bfloat16)
    xb_nch = xb_nwc.transpose(0, 2, 1)

    dt = _timed_chain(xla_nch, xb_nch, rtt)
    print(f"B{B} XLA NCH SAME:        {mfu(dt, B):.4f} ({dt*1e3:.3f} ms)",
          flush=True)

    def pal_nwc(x):
        y = _conv1d_s1_nwc(x, w_nwc)
        return jnp.pad(y, ((0, 0), (0, 2), (0, 0)))

    def pal_stack(x):
        y = _conv1d_s1_nwc(x, w_nwc, stack_taps=True)
        return jnp.pad(y, ((0, 0), (0, 2), (0, 0)))

    def pal_ncw(x):
        # the framework-realistic route: NCW caller pays both transposes
        y = _conv1d_s1_nwc(x.transpose(0, 2, 1), w_nwc)
        return jnp.pad(y.transpose(0, 2, 1), ((0, 0), (0, 0), (0, 2)))

    for name, fn, xv in (("pallas NWC native ", pal_nwc, xb_nwc),
                         ("pallas NWC stacked", pal_stack, xb_nwc),
                         ("pallas NCW (xpose)", pal_ncw, xb_nch)):
        try:
            dt = _timed_chain(fn, xv, rtt)
            print(f"B{B} {name}: {mfu(dt, B):.4f} ({dt*1e3:.3f} ms)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B{B} {name}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

print("DONE", flush=True)
