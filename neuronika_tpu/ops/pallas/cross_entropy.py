"""Fused linear + softmax-cross-entropy Pallas kernels.

The language-model head is the last big HBM consumer: materialising
logits (B·S, V) in f32 costs gigabytes of traffic per step at LM vocab
sizes. These kernels stream the vocabulary in blocks through the grid (so
Pallas double-buffers the weight tiles) and never write the logits tensor:

* forward: grid (row-block i, vocab-block j) — online logsumexp carried in
  VMEM scratch across j, plus the target logit gathered by mask; outputs
  per-row loss and lse at the last j.
* backward d(x): same grid, recomputes logits blockwise, forms
  p = exp(logit − lse) − onehot and accumulates p·W in scratch.
* backward d(W): grid (vocab-block j, row-block i) with an f32 accumulator
  revisited across rows (matmul-K-loop pattern).

`fused_linear_cross_entropy(x, w, targets)` = mean over rows of
CE(softmax(x·wᵀ), targets), with a custom VJP. The XLA composite
(`reference_linear_cross_entropy`) is the fallback and test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# --------------------------------------------------------------------------
# forward: grid (ni, nj), scratch carries (m, s, target-logit) across j


def _ce_fwd_kernel(x_ref, w_ref, t_ref, loss_ref, lse_ref,
                   m_sc, s_sc, tl_sc, *, block_v):
    bm = x_ref.shape[0]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        s_sc[:] = jnp.zeros_like(s_sc)
        tl_sc[:] = jnp.zeros_like(tl_sc)

    x = x_ref[:]
    wb = w_ref[:]  # (bv, D), storage dtype feeds the MXU; f32 accumulate
    tgt = t_ref[:, :1]
    logits = jnp.dot(x, wb.T, preferred_element_type=jnp.float32)  # (bm, bv)
    cols = j * block_v + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)

    m_old = m_sc[:, :1]
    m_new = jnp.maximum(m_old, logits.max(axis=1, keepdims=True))
    s_sc[:, :1] = s_sc[:, :1] * jnp.exp(m_old - m_new) + jnp.exp(
        logits - m_new
    ).sum(axis=1, keepdims=True)
    m_sc[:, :1] = m_new
    tl_sc[:, :1] += jnp.where(cols == tgt, logits, 0.0).sum(
        axis=1, keepdims=True
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        lse = m_sc[:, :1] + jnp.log(s_sc[:, :1])
        loss_ref[:] = jnp.broadcast_to(lse - tl_sc[:, :1], loss_ref.shape)
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


# --------------------------------------------------------------------------
# backward d(x): grid (ni, nj), dx accumulated in the resident f32 output
# block (index_map ignores j, so Pallas keeps it in VMEM across the inner
# loop — no scratch, which is what let the r1 kernel OOM VMEM at bm>=1024)


def _ce_dx_kernel(x_ref, w_ref, t_ref, lse_ref, g_ref, dx_ref, *, block_v):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    x = x_ref[:]
    wb = w_ref[:]
    tgt = t_ref[:, :1]
    lse = lse_ref[:, :1]
    g = g_ref[:, :1]
    logits = jnp.dot(x, wb.T, preferred_element_type=jnp.float32)
    cols = j * block_v + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.exp(logits - lse) - jnp.where(cols == tgt, 1.0, 0.0)
    dx_ref[:] += jnp.dot(
        (p * g).astype(x.dtype), wb, preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# backward d(W): grid (nj, ni), dW accumulated in the resident f32 output


def _ce_dw_kernel(x_ref, w_ref, t_ref, lse_ref, g_ref, dw_ref, *, block_v):
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    x = x_ref[:]                      # (bm, D) row block i
    wb = w_ref[:]                     # (bv, D) vocab block j
    tgt = t_ref[:, :1]
    lse = lse_ref[:, :1]
    g = g_ref[:, :1]
    logits = jnp.dot(x, wb.T, preferred_element_type=jnp.float32)  # (bm, bv)
    cols = j * block_v + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.exp(logits - lse) - jnp.where(cols == tgt, 1.0, 0.0)
    dw_ref[:] += jnp.dot(
        (p * g).astype(x.dtype).T, x, preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# wrappers


def _rep_i32(v):
    return jnp.broadcast_to(
        v[:, None].astype(jnp.int32), (v.shape[0], 128)
    ).astype(jnp.int32)


def _rep_f32(v):
    return jnp.broadcast_to(v[:, None].astype(jnp.float32), (v.shape[0], 128))


def _ce_fwd_call(x, w, targets, bm, bv, interpret):
    N, D = x.shape
    V = w.shape[0]
    row = pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    wrow = pl.BlockSpec((bv, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((bm, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    loss, lse = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, block_v=bv),
        out_shape=(
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
            jax.ShapeDtypeStruct((N, 128), jnp.float32),
        ),
        grid=(N // bm, V // bv),
        in_specs=[row, wrow, vec],
        out_specs=(vec, vec),
        scratch_shapes=[
            pltpu.VMEM((bm, 128), jnp.float32),
            pltpu.VMEM((bm, 128), jnp.float32),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w, _rep_i32(targets))
    return loss[:, 0], lse


def _ce_bwd_call(x, w, targets, lse, g_rows, bm, bv, interpret,
                 bm_dw=None, bv_dw=None):
    N, D = x.shape
    V = w.shape[0]
    t_rep = _rep_i32(targets)
    g_rep = _rep_f32(g_rows)
    bm_dw = bm_dw or bm
    bv_dw = bv_dw or bv

    row_i = pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_j = pl.BlockSpec((bv, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    vec_i = pl.BlockSpec((bm, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_ce_dx_kernel, block_v=bv),
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        grid=(N // bm, V // bv),
        in_specs=[row_i, w_j, vec_i, vec_i, vec_i],
        out_specs=row_i,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w, t_rep, lse, g_rep)

    # swapped grid: (vocab j, rows i)
    row_i2 = pl.BlockSpec((bm_dw, D), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    w_j2 = pl.BlockSpec((bv_dw, D), lambda j, i: (j, 0),
                        memory_space=pltpu.VMEM)
    vec_i2 = pl.BlockSpec((bm_dw, 128), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    dw = pl.pallas_call(
        functools.partial(_ce_dw_kernel, block_v=bv_dw),
        out_shape=jax.ShapeDtypeStruct((V, D), jnp.float32),
        grid=(V // bv_dw, N // bm_dw),
        in_specs=[row_i2, w_j2, vec_i2, vec_i2, vec_i2],
        out_specs=w_j2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w, t_rep, lse, g_rep)
    return dx.astype(x.dtype), dw.astype(w.dtype)


def _auto_bm(n, cap):
    """Largest power-of-two-ish row block <= cap that divides n."""
    for bm in (cap, 1536, 1024, 768, 512, 384, 256, 128, 64, 32, 16, 8):
        if bm <= cap and n % bm == 0:
            return bm
    return n


def _blocks(x, w, block_m, block_v):
    # Mosaic double-buffers EVERY block (even accumulator outputs whose
    # index map ignores the inner grid dim), and kernel-body intermediates
    # like the (bm, bv) logits tile live on the same 16 MB VMEM budget —
    # measured OOMs: fwd bm2048/bv1024 20.7M, dx bm1024/bv1024 19.2M. The
    # caps below keep each kernel ~10-13 MB. The re-streamed W/x tiles are
    # fully hidden by double buffering (tile DMA ~2 us vs ~8 us of MXU
    # work), so small row blocks cost no bandwidth stalls.
    N, V = x.shape[0], w.shape[0]
    bm = _auto_bm(N, block_m or 1024)
    bv = min(block_v, V)
    if N % bm or V % bv:
        raise ValueError("rows/vocab must be divisible by the block sizes")
    bm_dx = _auto_bm(N, min(bm, 512))
    bv_dw = _auto_bm(V, min(bv, 512))
    bm_dw = _auto_bm(N, 512)
    return bm, bv, bm_dx, bv_dw, bm_dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_linear_cross_entropy(x, w, targets, block_m: int = None,  # noqa: RUF013
                               block_v: int = 1024, interpret: bool = False):
    """mean over rows of CE(softmax(x·wᵀ), targets).

    x (N, D), w (V, D), targets (N,) int — N divisible by the row block, V
    by block_v (pad rows/vocab at the caller if needed). block_m=None
    auto-picks the largest feasible row block per kernel."""
    bm, bv, _, _, _ = _blocks(x, w, block_m, block_v)
    loss, _ = _ce_fwd_call(x, w, targets, bm, bv, interpret)
    return loss.mean()


def _flce_fwd(x, w, targets, block_m, block_v, interpret):
    bm, bv, _, _, _ = _blocks(x, w, block_m, block_v)
    loss, lse = _ce_fwd_call(x, w, targets, bm, bv, interpret)
    return loss.mean(), (x, w, targets, lse)


def _flce_bwd(block_m, block_v, interpret, res, g):
    x, w, targets, lse = res
    _, bv, bm_dx, bv_dw, bm_dw = _blocks(x, w, block_m, block_v)
    g_rows = jnp.full((x.shape[0],), 1.0 / x.shape[0], jnp.float32) * g
    dx, dw = _ce_bwd_call(x, w, targets, lse, g_rows, bm_dx, bv, interpret,
                          bm_dw=bm_dw, bv_dw=bv_dw)
    return dx, dw, None


fused_linear_cross_entropy.defvjp(_flce_fwd, _flce_bwd)


def reference_linear_cross_entropy(x, w, targets):
    """XLA composite oracle."""
    logits = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[:, None].astype(jnp.int32),
                              axis=-1)[:, 0]
    return (lse - tgt).mean()
