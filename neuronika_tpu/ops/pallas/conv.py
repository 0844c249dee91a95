"""Direct (im2col-free) Conv2d Pallas kernels.

The reference's conv is an im2col unfold + per-sample GEMM parallelised
with rayon (node/convolution/mod.rs:85-123). On TPU the idiomatic form is a
sum of shifted MXU matmuls: for every kernel tap (i, j)

    out[n, rows, :, :] += x[n, rows + i·dh, j·dw :, :] @ W[i, j]    (NHWC)

**Layout is the whole game for Mosaic.** The r1 NCHW prototype needed a
(Ci, bh, Wout) → (Ci, bh·Wout) cast that merges sublanes INTO the lane
dimension — Mosaic rejects it unless 128-aligned. In NHWC the tap slab is
(bh, Wout, Ci) → (bh·Wout, Ci): only *leading* (non-lane) dims merge, the
lane dim (Ci) is untouched, and the tap offsets land on sublane dims where
static offsets are free. This NHWC kernel compiles on real TPUs and is the
`use_pallas` conv path (NCHW callers pay two transposes at the boundary;
the kernel itself is the roofline demonstrator — XLA's conv remains the
default production path, ops/functional.py).

Scope: stride 1, arbitrary dilation, groups=1. Backwards by kernel
composition: d(input) is a full-correlation with the flipped/io-swapped
kernel; d(kernel) is a correlation contracting the batch — both run on the
SAME kernel (node/convolution/mod.rs:146-294 is the reference's col2im
equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv2d_nhwc_kernel(x_ref, w_ref, o_ref, *, kh, kw, dh, dw, wout, bh):
    # x_ref: (1, Hpad, W, Ci) full sample; w_ref: (kh, kw, Ci, Co)
    # o_ref: (1, bh, Wout, Co) — output rows [qi·bh, qi·bh + bh)
    ci = x_ref.shape[3]
    co = o_ref.shape[3]
    qi = pl.program_id(1)
    row0 = pl.multiple_of(qi * bh, bh)

    # one dynamic (row-block) slice on a SUBLANE dim; the tap offsets below
    # are then static, and the (bh, wout, Ci) -> (bh·wout, Ci) casts keep
    # the lane dim intact — all Mosaic-lowerable.
    window = x_ref[0, pl.ds(row0, bh + dh * (kh - 1)), :, :]

    acc = jnp.zeros((bh * wout, co), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            xs = window[i * dh:i * dh + bh, j * dw:j * dw + wout, :]
            flat = xs.reshape(bh * wout, ci)
            acc = acc + jnp.dot(flat, w_ref[i, j],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, wout, co).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "block_h", "interpret")
)
def conv2d_direct_nhwc(x, w, dilation=(1, 1), *, block_h: int = 8,
                       interpret: bool = False):
    """x (N, H, W, Ci) ⊛ w (kh, kw, Ci, Co), stride 1, VALID → NHWC out."""
    N, H, W, Ci = x.shape
    kh, kw, Ci2, Co = w.shape
    if Ci != Ci2:
        raise ValueError("channel mismatch (groups != 1 not supported here)")
    dh, dw = dilation
    Hout = H - dh * (kh - 1)
    Wout = W - dw * (kw - 1)
    if Hout <= 0 or Wout <= 0:
        raise ValueError("kernel larger than input")

    bh = min(block_h, Hout)
    pad_h = (-Hout) % bh
    if pad_h:  # pad input rows so output row-blocks tile evenly
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    Hpad = x.shape[1]
    grid = (N, (Hout + pad_h) // bh)

    out = pl.pallas_call(
        functools.partial(
            _conv2d_nhwc_kernel, kh=kh, kw=kw, dh=dh, dw=dw, wout=Wout, bh=bh
        ),
        out_shape=jax.ShapeDtypeStruct((N, Hout + pad_h, Wout, Co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hpad, W, Ci), lambda n, i: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, Ci, Co), lambda n, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, Wout, Co), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Hout * Wout * Ci * Co * kh * kw,
            bytes_accessed=(N * Hpad * W * Ci + N * Hout * Wout * Co)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w)
    return out[:, :Hout, :, :]


def conv2d_direct(x, w, dilation=(1, 1), *, block_h: int = 8,
                  interpret: bool = False):
    """NCHW façade over the NHWC kernel: x (N, Ci, H, W) ⊛
    w (Co, Ci, kh, kw) → (N, Co, Hout, Wout), stride 1, VALID."""
    xt = x.transpose(0, 2, 3, 1)
    wt = w.transpose(2, 3, 1, 0)
    out = conv2d_direct_nhwc(xt, wt, dilation, block_h=block_h,
                             interpret=interpret)
    return out.transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------
# backward on the Pallas tier, by kernel composition (stride 1)


def conv2d_direct_input_grad(g, w, dilation=(1, 1), *, interpret=False):
    """d(input) for stride-1 VALID conv (NCHW API): full-correlation with
    the spatially flipped, io-swapped kernel."""
    dh, dw_ = dilation
    kh, kw = w.shape[2], w.shape[3]
    gpad = jnp.pad(
        g, ((0, 0), (0, 0), (dh * (kh - 1),) * 2, (dw_ * (kw - 1),) * 2)
    )
    w_t = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # (Ci, Co, kh, kw)
    return conv2d_direct(gpad, w_t, dilation, interpret=interpret)


def conv2d_direct_kernel_grad(x, g, *, interpret=False):
    """d(kernel) for stride-1, dilation-1 VALID conv (NCHW API): correlate
    input with the out-gradient, contracting over the batch."""
    xt = x.transpose(1, 0, 2, 3)  # (Ci, N, H, W)
    gt = g.transpose(1, 0, 2, 3)  # (Co, N, Ho, Wo) as the "kernel"
    dw = conv2d_direct(xt, gt, (1, 1), interpret=interpret)
    return dw.transpose(1, 0, 2, 3)  # (Co, Ci, kh, kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_pallas(x, w, dilation=(1, 1), interpret: bool = False):
    """Stride-1 VALID Conv2d (NCHW) where forward AND both backward passes
    run on the direct Pallas kernel (dilation-1 for the kernel gradient;
    other configurations use the XLA path in ops.functional)."""
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
