"""Fused row softmax / log-softmax Pallas kernels (VPU tier).

One VMEM-resident pass per row block: max-shift, exp, normalise — no
intermediate HBM round-trips. Used by the `softmax`/`log_softmax` ops when
`config.use_pallas` is on (XLA's own fusion is the default path; the kernel
exists to keep the whole softmax family on the native tier and as the basis
for fused losses)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_kernel(x_ref, o_ref, *, log: bool):
    x = x_ref[:].astype(jnp.float32)
    m = x.max(axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = e.sum(axis=-1, keepdims=True)
    if log:
        o_ref[:] = (x - m - jnp.log(s)).astype(o_ref.dtype)
    else:
        o_ref[:] = (e / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("log", "block_rows", "interpret"))
def softmax_last_axis(x, *, log: bool = False, block_rows: int = 256,
                      interpret: bool = False):
    """Softmax over the last axis of an arbitrary-rank array."""
    shape = x.shape
    cols = shape[-1]
    x2 = x.reshape(-1, cols)
    rows = x2.shape[0]
    br = min(block_rows, rows)
    pad = (-rows) % br
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_softmax_kernel, log=log),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(x2.shape[0] // br,),
        in_specs=[pl.BlockSpec((br, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    if pad:
        out = out[:rows]
    return out.reshape(shape)
