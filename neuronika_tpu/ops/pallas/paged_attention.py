"""Paged-attention decode kernel: block-table K/V gather fused into the
attention dots.

The XLA paged decode path (`models/transformer.make_paged_decode_step`)
materialises each layer's `pk_l[table]` gather — the pool blocks are
read, written to a contiguous (B, MB·BS) buffer, and read again by the
attention einsum: ~3 HBM passes over the cache per layer. Decode is
cache/weight-bandwidth-bound, so those extra passes are pure loss. This
kernel DMAs each sequence's pool blocks straight into VMEM by indexing
the BlockSpec with the scalar-prefetched block table (the TPU equivalent
of vLLM's gather-free PagedAttention CUDA kernel) and keeps the online-
softmax statistics in VMEM scratch: ONE pass over the cache.

Layout contract (matches `init_paged_cache` / `_decode_qkv`):
  q        (B, KV, G, hd)   — one new token per sequence, GQA folded into
                              the query side (G = n_head // kv_heads)
  pk/pv    (NB, KV, BS, hd) — ONE layer's slice of the block pool
  table    (B, MB) int32    — pool block id per logical block
  pos      (B,) int32       — current write position (attends 0..pos)
Returns (B, KV, G, hd) in q's dtype.

Grid is (B, KV, MB) with the block walk innermost; unallocated table
entries point at scratch block 0, whose contribution is masked (and its
FLOPs skipped via `pl.when`, though the DMA still runs — the table is
dense up to ceil((pos+1)/BS) for live slots, so waste is bounded by the
idle lanes). Out-of-band softmax follows the house exp2-domain style
(ops/pallas/attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _kernel(table_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
            acc_ref, m_ref, l_ref, *, scale, block_size, n_blocks_per_seq,
            window):
    b, kv, mb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    G, hd = q_ref.shape[2], q_ref.shape[3]
    BS = block_size

    @pl.when(mb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    pos = pos_ref[b]

    # blocks beyond the sequence's live length contribute nothing: skip
    # their VPU/MXU work entirely (their DMA is the table-dense read)
    @pl.when(mb * BS <= pos)
    def _tile():
        q = q_ref[0, 0]                                    # (G, hd)
        k = k_ref[0, 0]                                    # (BS, hd)
        v = v_ref[0, 0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s * (scale * LOG2E)                            # exp2 domain
        cols = mb * BS + lax.broadcasted_iota(jnp.int32, (G, BS), 1)
        keep = cols <= pos
        if window:
            keep &= pos - cols < window
        s = jnp.where(keep, s, NEG_INF)
        m_prev = m_ref[:, 0]                               # (G,)
        l_prev = l_ref[:, 0]
        m_new = jnp.maximum(m_prev, s.max(axis=1))
        alpha = jnp.exp2(m_prev - m_new)                   # (G,)
        p = jnp.exp2(s - m_new[:, None])                   # (G, BS)
        l_new = l_prev * alpha + p.sum(axis=1)
        acc_ref[...] = (
            acc_ref[...] * alpha[:, None]
            + jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32))
        m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(mb == n_blocks_per_seq - 1)
    def _flush():
        l = l_ref[:, 0]
        o_ref[0, 0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def paged_attention(q, pk, pv, table, pos, *, window: int = 0,
                    interpret: bool = False):
    """One decode step of attention over a paged KV pool (see module
    docstring for the layout contract)."""
    B, KV, G, hd = q.shape
    NB, KVp, BS, hdp = pk.shape
    assert (KV, hd) == (KVp, hdp), (q.shape, pk.shape)
    MB = table.shape[1]
    scale = 1.0 / (hd ** 0.5)

    grid = (B, KV, MB)

    def q_map(b, kv, mb, table_ref, pos_ref):
        return (b, kv, 0, 0)

    def kv_map(b, kv, mb, table_ref, pos_ref):
        return (table_ref[b, mb], kv, 0, 0)

    kern = functools.partial(
        _kernel, scale=scale, block_size=BS, n_blocks_per_seq=MB,
        window=window)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, G, hd), q_map),
                pl.BlockSpec((1, 1, BS, hd), kv_map),
                pl.BlockSpec((1, 1, BS, hd), kv_map),
            ],
            out_specs=pl.BlockSpec((1, 1, G, hd), q_map),
            scratch_shapes=[
                pltpu.VMEM((G, hd), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(table, pos, q, pk, pv)
