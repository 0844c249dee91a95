"""conv1d roofline bound (VERDICT r3 #6): compute the bandwidth/compute
roofline for the bench's k=3 conv1d shape, measure the framework's NCW
path against it, and try layout variants (NWC; fold-to-2d with halo) to
see whether the 0.72 fwd MFU is a layout artifact or the attainable
bound. Run alone on the TPU."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_chain, _measure_rtt, _device_peak

peak = _device_peak()
rtt = _measure_rtt()
BW = 819e9          # v5e HBM, bytes/s
B, C, L, K = 64, 256, 3136, 3
fl = 2 * B * C * C * K * L

# roofline: perfectly fused direct conv moves input+output once
bytes_min = 2 * (B * C * L * 2)          # bf16 in + out
t_bw = bytes_min / BW
t_mxu = fl / peak
bound = t_mxu / max(t_mxu, t_bw)
print(f"shape B{B} C{C} L{L} k{K}: flops {fl/1e9:.1f} G, min bytes "
      f"{bytes_min/1e6:.1f} MB -> t_mxu {t_mxu*1e6:.0f} us, t_bw "
      f"{t_bw*1e6:.0f} us, roofline MFU cap {bound:.3f}", flush=True)
# im2col bound: materialising the (L, 3C) patch matrix adds a 3x-input
# write + read
bytes_i2c = bytes_min + 2 * (3 * B * C * L * 2)
print(f"im2col-materialised cap: "
      f"{t_mxu / max(t_mxu, bytes_i2c / BW):.3f}", flush=True)

x = jax.random.normal(jax.random.key(0), (B, C, L), jnp.bfloat16)
w = jax.random.normal(jax.random.key(1), (C, C, K),
                      jnp.bfloat16) / (C * K) ** 0.5

def ncw(x):
    return lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NCH", "OIH", "NCH"))

dt = _timed_chain(lambda x_: ncw(x_).astype(x_.dtype), x, rtt)
print(f"NCW (framework path): {fl/dt/peak:.4f} MFU ({dt*1e3:.3f} ms) — "
      f"{fl/dt/peak/bound:.2f}x of bound", flush=True)

# NWC: channels on lanes
xn = x.transpose(0, 2, 1)
wn = w.transpose(2, 1, 0)   # (K, Ci, Co) = WIO

def nwc(x):
    return lax.conv_general_dilated(
        x, wn, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))

dt = _timed_chain(lambda x_: nwc(x_).astype(x_.dtype), xn, rtt)
print(f"NWC: {fl/dt/peak:.4f} MFU ({dt*1e3:.3f} ms)", flush=True)

# fold-to-2d with halo: (B, C, 3136) -> (B, C, 49, 64) + 1-col halo each
# side, conv with a (1, 3) kernel VALID over 66 columns -> exact SAME
# conv1d (boundary taps read the true neighbours via the halo)
H2, W2 = 49, 64
x2 = x.reshape(B, C, H2, W2)
w2 = w[:, :, None, :]        # (Co, Ci, 1, 3)

def fold2d(x2_):
    left = jnp.pad(x2_[:, :, :, -1:], ((0, 0), (0, 0), (1, 0), (0, 0)))[
        :, :, :-1]           # previous row's last col (zero for row 0)
    right = jnp.pad(x2_[:, :, :, :1], ((0, 0), (0, 0), (0, 1), (0, 0)))[
        :, :, 1:]            # next row's first col (zero for last row)
    xh = jnp.concatenate([left, x2_, right], axis=3)     # (B, C, 49, 66)
    return lax.conv_general_dilated(
        xh, w2, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))

# correctness first
ref = ncw(x.astype(jnp.float32).astype(jnp.bfloat16))
got = fold2d(x2).reshape(B, C, L)
err = float(jnp.abs(ref.astype(jnp.float32)
                    - got.astype(jnp.float32)).max())
print(f"fold2d max err vs NCW: {err:.2e}", flush=True)
dt = _timed_chain(lambda x_: fold2d(x_).astype(x_.dtype), x2, rtt)
print(f"fold2d (1x3 over 49x64 + halo): {fl/dt/peak:.4f} MFU "
      f"({dt*1e3:.3f} ms)", flush=True)
print("DONE", flush=True)
