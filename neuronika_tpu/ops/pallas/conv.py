"""Direct (im2col-free) Conv2d forward Pallas kernel.

The reference's conv is an im2col unfold + per-sample GEMM parallelised
with rayon (node/convolution/mod.rs:85-123). On TPU the idiomatic form is a
sum of shifted MXU matmuls: for every kernel tap (kh, kw)

    out[n, :, ho, :] += W[:, :, kh, kw] · x[n, :, ho + kh·dh, kw·dw :]

so the (C_out × C_in) weight slice streams through the MXU against input
row slabs sliced straight out of a VMEM-resident sample — no patch
materialisation at all.

Scope: NCHW, stride 1, arbitrary dilation, groups=1, one sample's plane in
VMEM at a time. Status: **interpreter-validated prototype** — Mosaic
currently rejects the unaligned (Ci, bh, Wout)→(Ci, bh·Wout) shape cast the
tap-matmul needs, so on real TPUs the production conv path remains
`lax.conv_general_dilated` (XLA's own MXU conv, ops.functional._conv_fwd),
which is also the fallback for stride/groups. The kernel documents the
direct-conv design and is exercised against the XLA path in tests.
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
    #
    # The tap loop is UNROLLED (kh·kw is small and static) so every slice
    # offset along the sublane/lane dims is a static constant — Mosaic can
    # lower those as register shifts, whereas dynamic lane-dim offsets must
    # be provably 128-aligned.
    ci = x_ref.shape[1]
    co = o_ref.shape[1]
    qi = pl.program_id(1)
    row0 = pl.multiple_of(qi * bh, bh)

    # one dynamic (row-block) slice; taps then use static offsets within it
    window = x_ref[0, :, pl.ds(row0, bh + dh * (kh - 1)), :]

    acc = jnp.zeros((co, bh * wout), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            xs = window[:, i * dh:i * dh + bh, j * dw:j * dw + wout]
            ws = w_ref[:, :, i, j]  # (Co, Ci)
            flat = xs.reshape(ci, bh * wout)
            acc = acc + jnp.dot(ws, flat, preferred_element_type=jnp.float32)
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


# --------------------------------------------------------------------------
# backward on the Pallas tier, by kernel composition (stride 1)
#
# The reference's conv backwards are col2im scatter + per-channel GEMMs
# (node/convolution/mod.rs:146-294). On the direct-conv formulation both
# cotangents are themselves convolutions, so the SAME kernel serves all
# three passes:
#   d(input)  = conv( pad(g, d·(k−1)),  flip_spatial(swap_io(w)), dilation d )
#   d(kernel) = corr( x,  g )  — batch becomes the contraction axis, i.e.
#               conv with N and C transposed (dilation 1 case).


def conv2d_direct_input_grad(g, w, dilation=(1, 1), *, interpret=False):
    """d(input) for stride-1 VALID conv: full-correlation with the
    spatially flipped, io-swapped kernel."""
    dh, dw_ = dilation
    kh, kw = w.shape[2], w.shape[3]
    gpad = jnp.pad(
        g, ((0, 0), (0, 0), (dh * (kh - 1),) * 2, (dw_ * (kw - 1),) * 2)
    )
    w_t = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # (Ci, Co, kh, kw)
    return conv2d_direct(gpad, w_t, dilation, interpret=interpret)


def conv2d_direct_kernel_grad(x, g, *, interpret=False):
    """d(kernel) for stride-1, dilation-1 VALID conv: correlate input with
    the out-gradient, contracting over the batch."""
    xt = x.transpose(1, 0, 2, 3)  # (Ci, N, H, W)
    gt = g.transpose(1, 0, 2, 3)  # (Co, N, Ho, Wo) as the "kernel"
    dw = conv2d_direct(xt, gt, (1, 1), interpret=interpret)
    return dw.transpose(1, 0, 2, 3)  # (Co, Ci, kh, kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_pallas(x, w, dilation=(1, 1), interpret: bool = False):
    """Stride-1 VALID Conv2d where forward AND both backward passes run on
    the direct Pallas kernel (dilation-1 for the kernel gradient; other
    configurations use the XLA path in ops.functional)."""
    return conv2d_direct(x, w, dilation, interpret=interpret)


def _conv2d_pallas_fwd(x, w, dilation, interpret):
    return conv2d_direct(x, w, dilation, interpret=interpret), (x, w)


def _conv2d_pallas_bwd(dilation, interpret, res, g):
    x, w = res
    dx = conv2d_direct_input_grad(g, w, dilation, interpret=interpret)
    if dilation == (1, 1):
        dw = conv2d_direct_kernel_grad(x, g, interpret=interpret)
    else:
        # dilated kernel-grad needs strided output sampling — use the XLA
        # conv's transpose (same math as ops.functional's conv vjp)
        from ..functional import _conv_fwd

        dw = jax.linear_transpose(
            lambda k: _conv_fwd(((1, 1), dilation, 1), k, x), w
        )(g)[0]
    return dx, dw


conv2d_pallas.defvjp(_conv2d_pallas_fwd, _conv2d_pallas_bwd)
