"""Pure op definitions: forward functions + hand-written VJP rules.

Every op the reference implements as a `Forward`/`Backward` struct pair
(neuronika-variable/src/node/mod.rs:1-81, 39 modules) is defined here as a
pair of *pure, jit-traceable* functions:

``fwd(extra, *operand_values) -> value``
``vjp(extra, operand_values, out_value, out_grad) -> per-operand grads``

`extra` is a hashable tuple of static parameters (axis, exponent, stride, …)
baked into the trace-cache signature. Stochastic ops (dropout) additionally
take ``key``/``train`` keyword arguments; their VJP regenerates the identical
mask from the same key (the reference instead stores the noise buffer,
node/dropout/mod.rs:53-128 — equivalent semantics, no HBM residual).

Backward semantics deliberately mirror the reference, including its quirks:

* broadcast un-reduction sums the out-grad over leading / size-1 axes into
  each operand's shape (utils.rs:152-192) — see :func:`unbroadcast`.
* losses: MAE/MSE/BCE/BCEWithLogits `Mean` divide by element count
  (e.g. squared_error/mod.rs:54); KLDiv and NLL `Mean` divide by
  ``len_of(Axis(0))`` (kldiv/mod.rs:56, nll/mod.rs:63) while the NLL
  *backward* divides by ``target.len()`` (nll/mod.rs:113).
* NLL expects the **class axis first** (input ``(C, …)``, target over the
  remaining axes holding class indices as floats) — nll/mod.rs:46-68.
* BCE clamps logs at −100 like the reference (bce/mod.rs).
* pad's backward only slices the interior (node/pad/mod.rs:161-182); for
  reflective/replicative modes this drops the border contributions exactly
  as the reference does.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax


class Op(NamedTuple):
    name: str
    fwd: Callable
    vjp: Optional[Callable]
    rng: bool = False


OPS: Dict[str, Op] = {}


def _register(name: str, fwd: Callable, vjp: Optional[Callable], rng: bool = False) -> Op:
    op = Op(name, fwd, vjp, rng)
    OPS[name] = op
    return op


# --------------------------------------------------------------------------
# broadcasting helpers (reference: utils.rs cobroadcast / accumulate)


def unbroadcast(g: jax.Array, shape) -> jax.Array:
    """Reduce a broadcast out-gradient back to an operand's shape by summing
    over prepended axes and broadcast (size-1) axes — the reference's
    `accumulate` (utils.rs:152-192)."""
    if g.shape == tuple(shape):
        return g
    extra = g.ndim - len(shape)
    if extra > 0:
        g = g.sum(axis=tuple(range(extra)))
    keep = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape)) if s == 1 and gs != 1)
    if keep:
        g = g.sum(axis=keep, keepdims=True)
    return g


# --------------------------------------------------------------------------
# broadcast arithmetic (node/{addition,subtraction,multiplication,division})


_register(
    "add",
    lambda e, a, b: a + b,
    lambda e, p, o, g: (unbroadcast(g, p[0].shape), unbroadcast(g, p[1].shape)),
)
_register(
    "sub",
    lambda e, a, b: a - b,
    lambda e, p, o, g: (unbroadcast(g, p[0].shape), unbroadcast(-g, p[1].shape)),
)
_register(
    "mul",
    lambda e, a, b: a * b,
    lambda e, p, o, g: (
        unbroadcast(g * p[1], p[0].shape),
        unbroadcast(g * p[0], p[1].shape),
    ),
)
_register(
    "div",
    lambda e, a, b: a / b,
    lambda e, p, o, g: (
        unbroadcast(g / p[1], p[0].shape),
        unbroadcast(-g * p[0] / (p[1] * p[1]), p[1].shape),
    ),
)
_register("neg", lambda e, a: -a, lambda e, p, o, g: (-g,))

# --------------------------------------------------------------------------
# elementwise unary (node/{power,sqrt,exp,logn,relu,leaky_relu,sigmoid,tanh,
# softplus})

_register(
    "pow",
    lambda e, a: a ** e[0],
    lambda e, p, o, g: (g * e[0] * p[0] ** (e[0] - 1),),
)
_register("sqrt", lambda e, a: jnp.sqrt(a), lambda e, p, o, g: (g / (2.0 * o),))
_register("exp", lambda e, a: jnp.exp(a), lambda e, p, o, g: (g * o,))
_register("ln", lambda e, a: jnp.log(a), lambda e, p, o, g: (g / p[0],))
_register(
    "relu",
    lambda e, a: jnp.maximum(a, 0.0),
    lambda e, p, o, g: (g * (p[0] > 0.0).astype(g.dtype),),
)
_register(
    "leaky_relu",
    lambda e, a: jnp.where(a > 0.0, a, 0.01 * a),
    lambda e, p, o, g: (g * jnp.where(p[0] > 0.0, 1.0, 0.01).astype(g.dtype),),
)
_register(
    "sigmoid",
    lambda e, a: jax.nn.sigmoid(a),
    lambda e, p, o, g: (g * o * (1.0 - o),),
)
_register(
    "tanh",
    lambda e, a: jnp.tanh(a),
    lambda e, p, o, g: (g * (1.0 - o * o),),
)
_register(
    "softplus",
    lambda e, a: jnp.logaddexp(a, 0.0),
    # d/dx ln(1+e^x) = 1/(1+e^-x) (softplus/mod.rs:74-76)
    lambda e, p, o, g: (g * jax.nn.sigmoid(p[0]),),
)

# --------------------------------------------------------------------------
# softmax family (node/{softmax,logsoftmax}); extra = (axis,)


def _softmax_vjp(e, p, o, g):
    axis = e[0]
    return (o * (g - (g * o).sum(axis=axis, keepdims=True)),)


def _log_softmax_vjp(e, p, o, g):
    axis = e[0]
    return (g - jnp.exp(o) * g.sum(axis=axis, keepdims=True),)


def _softmax_fwd(e, a, *, log=False):
    axis = e[0]
    if _use_pallas() and axis in (-1, a.ndim - 1):
        from ..config import config
        from .pallas.softmax import softmax_last_axis

        return softmax_last_axis(a, log=log, interpret=config.pallas_interpret)
    return jax.nn.log_softmax(a, axis=axis) if log else jax.nn.softmax(a, axis=axis)


_register("softmax", lambda e, a: _softmax_fwd(e, a), _softmax_vjp)
_register("log_softmax", lambda e, a: _softmax_fwd(e, a, log=True), _log_softmax_vjp)

# --------------------------------------------------------------------------
# reductions (node/{sum,mean}) — full reductions to a 0-d scalar


_register(
    "sum",
    lambda e, a: a.sum(),
    lambda e, p, o, g: (jnp.broadcast_to(g, p[0].shape),),
)
_register(
    "mean",
    lambda e, a: a.mean(),
    lambda e, p, o, g: (jnp.broadcast_to(g / p[0].size, p[0].shape),),
)


# per-axis reductions (extension beyond the reference's full reductions;
# keepdims semantics so results broadcast back); extra = (axis,)
def _axis_red_vjp(scale_by_n):
    def vjp(e, p, o, g):
        axis = e[0]
        g = jnp.expand_dims(g, axis) if g.ndim < p[0].ndim else g
        g = jnp.broadcast_to(g, p[0].shape)
        if scale_by_n:
            g = g / p[0].shape[axis]
        return (g,)

    return vjp


_register(
    "sum_axis",
    lambda e, a: a.sum(axis=e[0], keepdims=True),
    _axis_red_vjp(False),
)
_register(
    "mean_axis",
    lambda e, a: a.mean(axis=e[0], keepdims=True),
    _axis_red_vjp(True),
)

# --------------------------------------------------------------------------
# shape ops (node/{transpose,unsqueeze,chunk,concatenate,stack,multi_*})

_register(
    "t",
    lambda e, a: jnp.transpose(a),  # ndarray .t() reverses all axes
    lambda e, p, o, g: (jnp.transpose(g),),
)
_register(
    "unsqueeze",
    lambda e, a: jnp.expand_dims(a, e[0]),
    lambda e, p, o, g: (jnp.squeeze(g, e[0]),),
)


def _chunk_fwd(e, a):
    starts, sizes = e
    return lax.slice(a, starts, tuple(s + z for s, z in zip(starts, sizes)))


def _chunk_vjp(e, p, o, g):
    starts, _ = e
    return (jnp.zeros(p[0].shape, g.dtype).at[
        tuple(slice(s, s + z) for s, z in zip(starts, g.shape))
    ].set(g),)


_register("chunk", _chunk_fwd, _chunk_vjp)


def _cat_vjp(e, p, o, g):
    axis = e[0]
    split = p[0].shape[axis]
    return (
        lax.slice_in_dim(g, 0, split, axis=axis),
        lax.slice_in_dim(g, split, g.shape[axis], axis=axis),
    )


_register("cat", lambda e, a, b: jnp.concatenate((a, b), axis=e[0]), _cat_vjp)


def _multi_cat_vjp(e, p, o, g):
    axis = e[0]
    grads = []
    off = 0
    for x in p:
        grads.append(lax.slice_in_dim(g, off, off + x.shape[axis], axis=axis))
        off += x.shape[axis]
    return tuple(grads)


_register(
    "multi_cat",
    lambda e, *xs: jnp.concatenate(xs, axis=e[0]),
    _multi_cat_vjp,
)


def _stack_vjp(e, p, o, g):
    axis = e[0]
    return tuple(
        lax.index_in_dim(g, i, axis=axis, keepdims=False) for i in range(len(p))
    )


_register("stack", lambda e, a, b: jnp.stack((a, b), axis=e[0]), _stack_vjp)
_register("multi_stack", lambda e, *xs: jnp.stack(xs, axis=e[0]), _stack_vjp)

# --------------------------------------------------------------------------
# linear algebra (node/{matrix_matrix_mul,matrix_matrix_mul_t,matrix_vector_
# mul,vector_matrix_mul,vector_vector_mul}) — MXU ops; always f32 accumulate.


def _use_pallas() -> bool:
    from ..config import config

    return config.use_pallas


def _mm(e, a, b):
    if _use_pallas() and a.ndim == 2 and b.ndim == 2:
        from ..config import config
        from .pallas.matmul import matmul as pallas_matmul

        return pallas_matmul(a, b, interpret=config.pallas_interpret)
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


_register(
    "mm",
    _mm,
    # bwd-left g·Rᵀ, bwd-right Lᵀ·g (matrix_matrix_mul/mod.rs:65,97)
    lambda e, p, o, g: (_mm(e, g, p[1].T), _mm(e, p[0].T, g)),
)
_register(
    "mm_t",
    lambda e, a, b: _mm(e, a, b.T),
    # bwd-left g·R, bwd-right gᵀ·L (matrix_matrix_mul_t/mod.rs)
    lambda e, p, o, g: (_mm(e, g, p[1]), _mm(e, g.T, p[0])),
)
_register(
    "mv",
    lambda e, a, v: _mm(e, a, v[:, None])[:, 0],
    lambda e, p, o, g: (g[:, None] * p[1][None, :], _mm(e, p[0].T, g[:, None])[:, 0]),
)
_register(
    "vm",
    lambda e, v, a: _mm(e, v[None, :], a)[0],
    lambda e, p, o, g: (_mm(e, p[1], g[:, None])[:, 0], p[0][:, None] * g[None, :]),
)
_register(
    "vv",
    lambda e, a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype),
    lambda e, p, o, g: (g * p[1], g * p[0]),
)


# batched matmul — extension beyond the reference's Ix2-only `mm` (the
# reference kit is 2-d, SURVEY §2.1; TPU models want (B, S, K) @ (K, N) so
# the MXU sees one large GEMM per projection instead of S-many row GEMVs).
# lhs (..., K), rhs (K, N); f32 accumulate, compute-dtype output.
def _matmul_fwd(e, a, b):
    out = lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(a.dtype)


def _matmul_vjp(e, p, o, g):
    a, b = p
    da = lax.dot_general(
        g, b, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    batch_axes = tuple(range(a.ndim - 1))
    db = lax.dot_general(
        a, g, ((batch_axes, batch_axes), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(b.dtype)
    return da, db


_register("matmul", _matmul_fwd, _matmul_vjp)


# dtype cast — extension (bf16 compute bodies with f32 loss heads). The
# VJP casts the cotangent back to the input dtype (standard mixed-precision
# convention).
_register(
    "astype",
    lambda e, a: a.astype(e[0]),
    lambda e, p, o, g: (g.astype(p[0].dtype),),
)

# --------------------------------------------------------------------------
# dropout (node/dropout/mod.rs:53-128): Bernoulli(1-p) mask scaled 1/(1-p);
# identity when eval or p==0; zeros when p==1. Mask regenerated from the key.


def _dropout_mask(key, shape, p):
    return jax.random.bernoulli(key, 1.0 - p, shape)


def _dropout_fwd(e, a, *, key, train):
    (p,) = e
    if not train or p == 0.0:
        return a
    if p == 1.0:
        return jnp.zeros_like(a)
    mask = _dropout_mask(key, a.shape, p)
    return jnp.where(mask, a / (1.0 - p), 0.0)


def _dropout_vjp(e, prim, o, g, *, key, train):
    (p,) = e
    if not train or p == 0.0:
        return (g,)
    if p == 1.0:
        return (jnp.zeros_like(g),)
    mask = _dropout_mask(key, prim[0].shape, p)
    return (jnp.where(mask, g / (1.0 - p), 0.0),)


_register("dropout", _dropout_fwd, _dropout_vjp, rng=True)

# --------------------------------------------------------------------------
# fused attention — extension beyond the reference (VERDICT r3 #1: the
# define-by-run tier needs the flash kernel reachable from the Var API, not
# only from the functional transformer). Operand: the packed group-major
# qkv projection (B, S, (H + 2·KV)·hd) — exactly what one fused
# `x.matmul(w_qkv)` produces; returns (B, S, H·hd) head-major. extra =
# (n_head, n_kv_head, causal, rate, block). Dropout is status-gated like
# the `dropout` op: the op is rng and regenerates its in-kernel mask seed
# from the recorded PRNG key in the VJP.


def _attn_geometry(n_head, n_kv_head, width):
    kv = n_kv_head or n_head
    hd = width // (n_head + 2 * kv)
    if hd * (n_head + 2 * kv) != width:
        raise ValueError(
            f"packed qkv width {width} does not factor into H={n_head}, "
            f"KV={kv} heads"
        )
    return kv, hd


def _attn_xla(qkv, n_head, n_kv_head, causal, rate, key):
    """Reference-math fallback (identical unpack to the Pallas kernel's
    group-major layout, ops/pallas/attention.py `_qkv_geometry`)."""
    b, s, w = qkv.shape
    kv, hd = _attn_geometry(n_head, n_kv_head, w)
    g_sz = n_head // kv
    parts = qkv.reshape(b, s, kv, g_sz + 2, hd)
    q = parts[:, :, :, :g_sz, :].reshape(b, s, n_head, hd).transpose(0, 2, 1, 3)
    k = parts[:, :, :, g_sz, :].transpose(0, 2, 1, 3)
    v = parts[:, :, :, g_sz + 1, :].transpose(0, 2, 1, 3)
    if kv != n_head:
        k = jnp.repeat(k, g_sz, axis=1)
        v = jnp.repeat(v, g_sz, axis=1)
    scale = 1.0 / (hd ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    if rate > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(qkv.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, s, n_head * hd)


def _attn_use_kernel(qkv, n_head, n_kv_head):
    from ..config import config, on_tpu

    _, s, w = qkv.shape
    _, hd = _attn_geometry(n_head, n_kv_head, w)
    return (
        (on_tpu() or config.pallas_interpret)
        and s % 128 == 0
        and hd % 128 == 0
    )


def _attn_fwd(e, qkv, *, key, train):
    n_head, n_kv_head, causal, rate, block = e
    rate = float(rate) if train else 0.0
    if _attn_use_kernel(qkv, n_head, n_kv_head):
        from ..config import config
        from .pallas.attention import flash_attention_qkv

        s = qkv.shape[1]
        # in-kernel dropout adds a (bq, bk) u32 mask tile to scoped VMEM;
        # cap blocks at 512 when active (transformer.py:_attention does the
        # same for the functional tier)
        bq = bk = min(block, s, 512 if rate > 0.0 else 1 << 30)
        seed = (
            jax.random.randint(key, (), 0, 1 << 30).astype(jnp.float32)
            if rate > 0.0 else None
        )
        return flash_attention_qkv(
            qkv, seed, n_head, n_kv_head, causal, None, bq, bk,
            config.pallas_interpret, rate, True, True,
        )
    return _attn_xla(qkv, n_head, n_kv_head, causal, rate, key)


def _attn_vjp(e, p, o, g, *, key, train):
    _, vjp_fn = jax.vjp(lambda q: _attn_fwd(e, q, key=key, train=train), p[0])
    return vjp_fn(g)


_register("flash_attention", _attn_fwd, _attn_vjp, rng=True)

# --------------------------------------------------------------------------
# padding (node/pad) — extra = (padding per trailing spatial axis, mode, value)
# padding applies symmetrically to the LAST len(padding) axes; leading
# (batch/channel) axes are untouched (node/pad/mod.rs:104-128).


def _pad_widths(ndim: int, padding: Sequence[int]):
    lead = ndim - len(padding)
    return [(0, 0)] * lead + [(w, w) for w in padding]


def _pad_fwd(e, a):
    padding, mode, value = e
    widths = _pad_widths(a.ndim, padding)
    if mode == "zero":
        return jnp.pad(a, widths)
    if mode == "constant":
        return jnp.pad(a, widths, constant_values=value)
    if mode == "reflective":
        return jnp.pad(a, widths, mode="reflect")
    if mode == "replicative":
        return jnp.pad(a, widths, mode="edge")
    raise ValueError(f"unknown padding mode: {mode}")


def _pad_vjp(e, p, o, g):
    padding, _, _ = e
    widths = _pad_widths(g.ndim, padding)
    sl = tuple(slice(lo, dim - hi) for (lo, hi), dim in zip(widths, g.shape))
    return (g[sl],)


_register("pad", _pad_fwd, _pad_vjp)

# --------------------------------------------------------------------------
# convolution (node/convolution/mod.rs, 513 LoC). Layouts follow the
# reference: input (N, C_in, *spatial), kernel (C_out, C_in/groups, *k),
# VALID padding (padding composes via the `pad` op, var.rs:726).
# extra = (stride, dilation, groups). NB: the reference exposes this as a
# *kernel* method — kernel.convolution(input, ...) (var.rs:704-724) — the
# operand order here is (kernel, input) to match.


def _conv_dn(nd: int):
    # (batch, feature, spatial...) for lhs/out; (out, in, spatial...) for rhs.
    lhs = (0, 1) + tuple(range(2, 2 + nd))
    rhs = (0, 1) + tuple(range(2, 2 + nd))
    return lax.ConvDimensionNumbers(lhs, rhs, lhs)


def _conv_fwd_lax(e, kernel, inp):
    stride, dilation, groups = e
    nd = len(stride)
    return lax.conv_general_dilated(
        inp,
        kernel,
        window_strides=stride,
        padding="VALID",
        rhs_dilation=dilation,
        dimension_numbers=_conv_dn(nd),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(inp.dtype)


def _conv_fwd(e, kernel, inp):
    stride, dilation, groups = e
    # Pallas direct-conv path (2-d, stride 1, groups 1) behind the flag:
    # the NHWC tap-matmul kernel (ops/pallas/conv.py) compiles on Mosaic
    # (the r1 NCHW variant's lane-merging reshape did not), so the flag now
    # genuinely switches tiers on hardware too. XLA's conv remains the
    # default production path. Cotangents below always transpose the lax
    # form (same math either way).
    if _use_pallas():
        from ..config import config
        from .pallas.conv import (
            conv1d_direct_nwc,
            conv2d_direct,
            conv3d_direct_ndhwc,
            route_conv2d,
        )

        interp = config.pallas_interpret
        # per-shape routing (VERDICT r3 #2c): in "auto" mode the measured
        # route table decides the tier so use_pallas never pessimises; in
        # interpret mode the kernels always run (CPU test meshes exercise
        # kernel code, not perf)
        if not interp:
            route_kw = {"batch": inp.shape[0]}
            if len(stride) == 2:
                # kernel (Co, Ci/g, kh, kw), inp (N, Ci, H, W)
                kh, kw = kernel.shape[2], kernel.shape[3]
                route_kw.update(
                    ksize=kh if kh == kw else 0,
                    sample_bytes=(inp.shape[2] + 2) * inp.shape[3]
                    * inp.shape[1] * inp.dtype.itemsize,
                    weight_bytes=kernel.size * kernel.dtype.itemsize,
                )
            elif len(stride) == 1:
                # kernel (Co, Ci, k), inp (N, Ci, L) — the 1-d kernel
                # holds the whole padded (L, Ci) sample per program
                route_kw.update(
                    ksize=kernel.shape[2],
                    sample_bytes=(inp.shape[2] + kernel.shape[2])
                    * inp.shape[1] * inp.dtype.itemsize,
                    weight_bytes=kernel.size * kernel.dtype.itemsize,
                )
            if route_conv2d(len(stride), stride, dilation, groups,
                            **route_kw) != "pallas":
                return _conv_fwd_lax(e, kernel, inp)
        # grouped convs route to the kernel when the per-group channel
        # slices are lane-aligned (or in interpret mode, where Mosaic's
        # tiling rules don't apply); otherwise fall through to XLA
        ok_groups = groups == 1 or interp or (
            kernel.shape[1] % 128 == 0
            and (kernel.shape[0] // groups) % 128 == 0
        )
        if (len(stride) == 2 and ok_groups
                and (stride == (1, 1) or dilation == (1, 1))):
            return conv2d_direct(inp, kernel, dilation, stride,
                                 groups=groups, interpret=interp)
        if groups != 1:
            return _conv_fwd_lax(e, kernel, inp)
        if len(stride) == 1:
            # NOT out_ncw: the in-kernel VMEM block transpose measured
            # 0.32 MFU vs 0.61 for kernel + XLA transpose at the bench
            # shape (Mosaic relayouts the accumulator; the fused XLA
            # transpose is far cheaper) — see conv.py::_conv1d_kernel
            out = conv1d_direct_nwc(
                inp.transpose(0, 2, 1), kernel.transpose(2, 1, 0),
                dilation[0], stride[0], interpret=interp)
            return out.transpose(0, 2, 1)
        if len(stride) == 3 and stride == (1, 1, 1):
            out = conv3d_direct_ndhwc(
                inp.transpose(0, 2, 3, 4, 1),
                kernel.transpose(2, 3, 4, 1, 0),
                dilation, interpret=interp)
            return out.transpose(0, 4, 1, 2, 3)
    return _conv_fwd_lax(e, kernel, inp)


def _conv_vjp(e, p, o, g):
    # Convolution is bilinear; the input/kernel cotangents are the standard
    # transposed convolutions (reference: ConvolutionBackwardInput /
    # ConvolutionBackwardKernel, node/convolution/mod.rs:146-294). We derive
    # them by linear transposition of the forward conv — under jit this
    # lowers to exactly the transposed-conv HLO.
    kernel, inp = p

    def conv_k(k):
        return _conv_fwd_lax(e, k, inp)

    def conv_x(x):
        return _conv_fwd_lax(e, kernel, x)

    dk = jax.linear_transpose(conv_k, kernel)(g)[0]
    dx = jax.linear_transpose(conv_x, inp)(g)[0]
    return (dk, dx)


_register("convolution", _conv_fwd, _conv_vjp)

# --------------------------------------------------------------------------
# losses — scalar criteria with Reduction::{Sum,Mean}; extra = (reduction,)
# All take (input, target); target is non-differentiable in the reference
# (targets are `Var`, var.rs:440-521) but grads w.r.t. target are never
# requested, so we return None for it.


def _red_mean_numel(x, total):
    return total / x.size


def _mae_fwd(e, inp, tgt):
    total = jnp.abs(inp - tgt).sum()
    return total / inp.size if e[0] == "mean" else total


def _mae_vjp(e, p, o, g):
    inp, tgt = p
    diff = inp - tgt
    d = jnp.sign(diff) * g
    if e[0] == "mean":
        d = d / inp.size
    return (d, None)


_register("mae", _mae_fwd, _mae_vjp)


def _mse_fwd(e, inp, tgt):
    total = ((inp - tgt) ** 2).sum()
    return total / inp.size if e[0] == "mean" else total


def _mse_vjp(e, p, o, g):
    inp, tgt = p
    d = 2.0 * (inp - tgt) * g
    if e[0] == "mean":
        d = d / inp.size
    return (d, None)


_register("mse", _mse_fwd, _mse_vjp)


def _clamped_log(x):
    # ln clamped at -100, matching the reference's BCE (var.rs:461-482) and
    # PyTorch's convention.
    return jnp.maximum(jnp.log(x), -100.0)


def _bce_fwd(e, inp, tgt):
    total = -(tgt * _clamped_log(inp) + (1.0 - tgt) * _clamped_log(1.0 - inp)).sum()
    return total / inp.size if e[0] == "mean" else total


def _bce_vjp(e, p, o, g):
    inp, tgt = p
    eps = jnp.finfo(inp.dtype).tiny
    d = (inp - tgt) / jnp.maximum(inp * (1.0 - inp), eps) * g
    if e[0] == "mean":
        d = d / inp.size
    return (d, None)


_register("bce", _bce_fwd, _bce_vjp)


def _bce_logits_fwd(e, inp, tgt):
    # log-sum-exp stable form (bce_with_logits/mod.rs:44-57)
    m = jnp.maximum(-inp, 0.0)
    total = ((1.0 - tgt) * inp + m + jnp.log(jnp.exp(-m) + jnp.exp(-inp - m))).sum()
    return total / inp.size if e[0] == "mean" else total


def _bce_logits_vjp(e, p, o, g):
    inp, tgt = p
    d = (jax.nn.sigmoid(inp) - tgt) * g
    if e[0] == "mean":
        d = d / inp.size
    return (d, None)


_register("bce_with_logits", _bce_logits_fwd, _bce_logits_vjp)


def _kldiv_fwd(e, inp, tgt):
    # input = log-probabilities; masked where target == 0 (kldiv/mod.rs:46-53).
    elt = jnp.where(tgt > 0.0, tgt * (jnp.log(jnp.where(tgt > 0.0, tgt, 1.0)) - inp), 0.0)
    total = elt.sum()
    # Mean divides by the batch (axis 0) length — "batchmean" (kldiv/mod.rs:56).
    return total / inp.shape[0] if e[0] == "mean" else total


def _kldiv_vjp(e, p, o, g):
    inp, tgt = p
    d = -tgt * g
    if e[0] == "mean":
        d = d / tgt.shape[0]
    return (d, None)


_register("kldiv", _kldiv_fwd, _kldiv_vjp)


def _nll_fwd(e, inp, tgt):
    # Reference layout: class axis FIRST (nll/mod.rs:46-68): input (C, ...),
    # target (...) of float class indices. total = Σ input[target[j], j].
    c = inp.shape[0]
    idx = tgt.astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, c, axis=0, dtype=inp.dtype)
    total = (onehot * inp).sum()
    # Mean divides by input.len_of(Axis(0)) == C in the reference
    # (nll/mod.rs:63) — replicated verbatim, quirk documented.
    return -total / c if e[0] == "mean" else -total


def _nll_vjp(e, p, o, g):
    inp, tgt = p
    c = inp.shape[0]
    idx = tgt.astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, c, axis=0, dtype=inp.dtype)
    d = -onehot * g
    if e[0] == "mean":
        # backward divides by target.len() (nll/mod.rs:113), not by C.
        d = d / tgt.size
    return (d, None)


_register("nll", _nll_fwd, _nll_vjp)

# --------------------------------------------------------------------------
# max pooling — not in the reference (its MNIST-CNN capability target,
# BASELINE.md configs[1], needs it); extra = (window, stride), applied to
# the trailing spatial dims of an (N, C, *spatial) input.


def _pool_dims(ndim: int, window, stride):
    lead = ndim - len(window)
    return (
        (1,) * lead + tuple(window),
        (1,) * lead + tuple(stride),
    )


def _max_pool_fwd(e, a):
    window, stride = e
    w, s = _pool_dims(a.ndim, window, stride)
    return lax.reduce_window(a, -jnp.inf, lax.max, w, s, "VALID")


def _max_pool_vjp(e, p, o, g):
    # max-pool is piecewise linear; its cotangent is the select-and-scatter
    # HLO, obtained by linearizing the forward at the primal point.
    (x,) = p
    _, vjp_fn = jax.vjp(lambda t: _max_pool_fwd(e, t), x)
    return (vjp_fn(g)[0],)


_register("max_pool", _max_pool_fwd, _max_pool_vjp)


def _avg_pool_fwd(e, a):
    window, stride = e
    w, s = _pool_dims(a.ndim, window, stride)
    total = lax.reduce_window(a, 0.0, lax.add, w, s, "VALID")
    denom = 1
    for k in window:
        denom *= k
    return total / denom


def _avg_pool_vjp(e, p, o, g):
    (x,) = p
    _, vjp_fn = jax.vjp(lambda t: _avg_pool_fwd(e, t), x)
    return (vjp_fn(g)[0],)


_register("avg_pool", _avg_pool_fwd, _avg_pool_vjp)

# reshape — extension beyond the reference (needed for conv -> linear
# transitions in the CNN configs); extra = (new_shape,)
_register(
    "reshape",
    lambda e, a: a.reshape(e[0]),
    lambda e, p, o, g: (g.reshape(p[0].shape),),
)


# embedding — extension beyond the reference (token lookup for the
# transformer config without one-hot matmuls). Operands: (weight (V, D),
# ids (...)); ids are float class indices like NLL's targets and are
# non-differentiable. VJP scatter-adds into the table.
def _embedding_fwd(e, w, ids):
    return w[ids.astype(jnp.int32)]


def _embedding_vjp(e, p, o, g):
    w, ids = p
    dw = jnp.zeros_like(w).at[ids.astype(jnp.int32)].add(g)
    return (dw, None)


_register("embedding", _embedding_fwd, _embedding_vjp)
