"""Direct (im2col-free) Conv2d forward Pallas kernel.

The reference's conv is an im2col unfold + per-sample GEMM parallelised
with rayon (node/convolution/mod.rs:85-123). On TPU the idiomatic form is a
sum of shifted MXU matmuls: for every kernel tap (kh, kw)

    out[n, :, ho, :] += W[:, :, kh, kw] · x[n, :, ho + kh·dh, kw·dw :]

so the (C_out × C_in) weight slice streams through the MXU against input
row slabs sliced straight out of a VMEM-resident sample — no patch
materialisation at all.

Scope: NCHW, stride 1, arbitrary dilation, groups=1, one sample's plane in
VMEM at a time (the general stride/groups path stays on
`lax.conv_general_dilated`, XLA's own MXU conv — ops.functional._conv_fwd).
Verified against that path in tests; exposed for experimentation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv2d_kernel(x_ref, w_ref, o_ref, *, kh, kw, dh, dw, wout, bh):
    # x_ref: (1, Ci, Hpad, W) full sample; w_ref: (Co, Ci, kh, kw)
    # o_ref: (1, Co, bh, Wout) rows [qi*bh, qi*bh + bh)
    ci = x_ref.shape[1]
    co = o_ref.shape[1]
    qi = pl.program_id(1)
    row0 = qi * bh

    def body(t, acc):
        i = t // kw
        j = t % kw
        xs = x_ref[0, :, pl.ds(row0 + i * dh, bh), pl.ds(j * dw, wout)]
        ws = w_ref[:, :, i, j]  # (Co, Ci)
        flat = xs.reshape(ci, bh * wout)
        return acc + jnp.dot(ws, flat, preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((co, bh * wout), jnp.float32)
    acc = lax.fori_loop(0, kh * kw, body, acc0)
    o_ref[0] = acc.reshape(co, bh, wout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "block_h", "interpret"))
def conv2d_direct(x, w, dilation=(1, 1), *, block_h: int = 8,
                  interpret: bool = False):
    """x (N, Ci, H, W) ⊛ w (Co, Ci, kh, kw), stride 1, VALID."""
    N, Ci, H, W = x.shape
    Co, Ci2, kh, kw = w.shape
    if Ci != Ci2:
        raise ValueError("channel mismatch (groups != 1 not supported here)")
    dh, dw = dilation
    Hout = H - dh * (kh - 1)
    Wout = W - dw * (kw - 1)
    if Hout <= 0 or Wout <= 0:
        raise ValueError("kernel larger than input")

    bh = min(block_h, Hout)
    pad_h = (-Hout) % bh
    if pad_h:  # pad input rows so output rows tile evenly
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    Hpad = x.shape[2]
    grid = (N, (Hout + pad_h) // bh)

    out = pl.pallas_call(
        functools.partial(
            _conv2d_kernel, kh=kh, kw=kw, dh=dh, dw=dw, wout=Wout, bh=bh
        ),
        out_shape=jax.ShapeDtypeStruct((N, Co, Hout + pad_h, Wout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Ci, Hpad, W), lambda n, i: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Co, Ci, kh, kw), lambda n, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, bh, Wout), lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w)
    return out[:, :, :Hout, :]
