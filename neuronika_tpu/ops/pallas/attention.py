"""Causal flash attention — Pallas TPU kernels with a custom VJP.

The memory-bound step of the flagship transformer: materialising the
(B, H, S, S) attention matrix in HBM is the classic bandwidth wall. This
kernel keeps the running softmax statistics (m, l) in VMEM and never writes
the S×S matrix (flash-attention-2 schedule): one forward kernel, and two
backward kernels (a dq pass over query blocks and a dk/dv pass over key
blocks) driven by the saved log-sum-exp and the delta = Σ dO·O row term.

All softmax math is f32 on the VPU; the q·kᵀ / p·v contractions hit the MXU
with f32 accumulation. Falls back to the XLA composite off-TPU (tests run
the kernels in interpreter mode).

This is the "attention built from primitive ops" stretch config of
BASELINE.md taken to speed-of-light; the reference has no attention op at
all (SURVEY.md §5 long-context row).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# --------------------------------------------------------------------------
# forward kernel


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, causal):
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    seq = k_ref.shape[2]
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, d)

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)

    if causal:
        num_kv = ((qi + 1) * block_q + block_k - 1) // block_k
    else:
        num_kv = seq // block_k

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)  # (bq, bk)
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(rows >= cols, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=1)
        acc = acc * alpha[:, None] + jnp.dot(
            p, vb, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / l[:, None]).astype(o_ref.dtype)
    # lse is replicated across a 128-lane axis to satisfy TPU tiling
    lse_ref[0, 0] = jnp.broadcast_to(
        (m + jnp.log(l))[:, None], lse_ref.shape[2:]
    )


# --------------------------------------------------------------------------
# backward kernels


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, block_k, causal):
    block_q = q_ref.shape[2]
    seq = k_ref.shape[2]
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]      # (bq, 1), lane-replicated storage
    delta = delta_ref[0, 0][:, :1]

    if causal:
        num_kv = ((qi + 1) * block_q + block_k - 1) // block_k
    else:
        num_kv = seq // block_k

    def body(j, dq):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32) * scale
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jnp.dot(ds, kb, preferred_element_type=jnp.float32)

    dq0 = jnp.zeros_like(q)
    dq_ref[0, 0] = lax.fori_loop(0, num_kv, body, dq0).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, causal):
    block_k = k_ref.shape[2]
    seq = q_ref.shape[2]
    kj = pl.program_id(2)

    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    start = (kj * block_k) // block_q if causal else 0
    num_q = seq // block_q

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        dob = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        s = jnp.dot(qb, k.T, preferred_element_type=jnp.float32) * scale
        if causal:
            rows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, dob, preferred_element_type=jnp.float32)
        dp = jnp.dot(dob, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jnp.dot(ds.T, qb, preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros_like(k)
    dv0 = jnp.zeros_like(v)
    dk, dv = lax.fori_loop(start, num_q, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# wrappers


def _block_sizes(seq: int, block_q: int, block_k: int):
    bq = min(block_q, seq)
    bk = min(block_k, seq)
    if seq % bq or seq % bk:
        raise ValueError(f"sequence length {seq} must be divisible by block sizes")
    return bq, bk


def _fwd_call(q, k, v, scale, causal, block_q, block_k, interpret):
    B, H, S, D = q.shape
    bq, bk = _block_sizes(S, block_q, block_k)
    grid = (B, H, S // bq)
    row_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk, causal=causal),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=[row_spec, full_spec, full_spec],
        out_specs=(
            row_spec,
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D // (2 if causal else 1),
            bytes_accessed=4 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _bwd_call(q, k, v, o, lse, do, scale, causal, block_q, block_k, interpret):
    B, H, S, D = q.shape
    bq, bk = _block_sizes(S, block_q, block_k)
    # delta = rowsum(dO * O), lane-replicated like lse
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (B, H, S, 128))

    row_q = pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    row_k = pl.BlockSpec((1, 1, bk, D), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    vec_q = pl.BlockSpec((1, 1, bq, 128), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((1, 1, S, 128), lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=bk, causal=causal),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, S // bq),
        in_specs=[row_q, full, full, row_q, vec_q, vec_q],
        out_specs=row_q,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=bq, causal=causal),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, H, S // bk),
        in_specs=[full, row_k, row_k, full, vec_full, vec_full],
        out_specs=(row_k, row_k),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------------------
# public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def flash_attention(q, k, v, causal: bool = True, scale: float = None,  # noqa: RUF013
                    block_q: int = 256, block_k: int = 256,
                    interpret: bool = False):
    """q, k, v: (B, H, S, D) -> (B, H, S, D). Softmax(q·kᵀ·scale)·v with an
    optional causal mask, never materialising the S×S matrix."""
    out, _ = _fwd_call(q, k, v, _resolve_scale(scale, q), causal,
                       block_q, block_k, interpret)
    return out


def _resolve_scale(scale, q):
    return 1.0 / math.sqrt(q.shape[-1]) if scale is None else scale


def _flash_fwd(q, k, v, causal, scale, block_q, block_k, interpret):
    s = _resolve_scale(scale, q)
    out, lse = _fwd_call(q, k, v, s, causal, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, scale, block_q, block_k, interpret, res, do):
    q, k, v, out, lse = res
    s = _resolve_scale(scale, q)
    dq, dk, dv = _bwd_call(q, k, v, out, lse, do, s, causal,
                           block_q, block_k, interpret)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def reference_attention(q, k, v, causal: bool = True, scale: float = None):  # noqa: RUF013
    """XLA-composite oracle used in tests and as the non-TPU fallback."""
    s = _resolve_scale(scale, q)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * s
    if causal:
        S = q.shape[2]
        mask = jnp.tril(jnp.ones((S, S), bool))
        att = jnp.where(mask, att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
