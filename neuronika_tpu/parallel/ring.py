"""Ring attention: context parallelism over a mesh axis.

Shards the SEQUENCE axis of attention across chips (the `cp` axis) so a
context longer than one chip's HBM can be trained on. Each chip keeps
its local query block resident and the key/value blocks travel around
the ring via `lax.ppermute` (one ICI hop per step — neighbour traffic
only, never an all-gather of the full sequence).

Design (TPU-native; no reference counterpart — the reference
/root/reference/neuronika-variable/src/node/ has no attention op at
all, and its only parallelism is rayon over the batch):

* the per-hop compute is the SAME Pallas flash kernel the single-chip
  path runs (`ops/pallas/attention._fwd_call` / `_bwd_call`); the ring
  layer only adds the block rotation and the online-softmax combine.
* partial outputs are merged with the base-2 log-sum-exp the kernel
  already emits: out = Σ_j 2^(lse_j − M)·o_j / Σ_j 2^(lse_j − M).
  The combine is exact, not an approximation.
* causality across blocks is free: with query block i and the hop-h
  key/value block jb = (i − h) mod n, a block is entirely in the past
  iff h ≤ i, entirely in the future otherwise.  Future blocks are
  excluded by zeroing their combine weight (SPMD cannot branch per
  chip, so their kernel still runs — the classic ring-attention load
  imbalance; hop 0 is the diagonal block and runs the causal kernel).
* backward is the standard flash backward run per hop with the GLOBAL
  lse/delta (p = 2^(s − lse_global) reproduces the true attention
  weights for any past block).  dq accumulates on the query's home
  chip; dk/dv accumulate on buffers that travel WITH their k/v block
  and are home again after n hops.  Future-block hops are zeroed by
  masking do (delta is derived from do inside `_bwd_call`, so both
  vanish and dq/dk/dv contributions are exactly zero).

The hop loop is a Python unroll (mesh axes are small static ints), so
each hop's `causal` flag stays a compile-time constant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pallas.attention import (
    LSE_W,
    _bwd_call,
    _fwd_call,
    _resolve_scale,
)


def _shift(x, axis_name, n):
    """Rotate a pytree one step forward around the ring (chip j -> j+1)."""
    perm = [(j, (j + 1) % n) for j in range(n)]
    return jax.tree_util.tree_map(
        lambda t: lax.ppermute(t, axis_name, perm), x
    )


def _ring_fwd_impl(q, k, v, axis_name, axis_size, causal, scale,
                   block_q, block_k, interpret):
    n = axis_size
    i = lax.axis_index(axis_name)
    s = _resolve_scale(scale, q)
    m = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)       # (B, H, Sq)
    l = jnp.zeros(q.shape[:3], jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)
    kv = (k, v)
    for h in range(n):
        kh, vh = kv
        o_h, lse_h = _fwd_call(q, kh, vh, s, causal and h == 0,
                               block_q, block_k, interpret)
        lse_h = lse_h[..., 0]                               # (B, H, Sq)
        if causal and h > 0:
            # kv block (i − h) mod n: in the past iff h ≤ i
            lse_h = jnp.where(i >= h, lse_h, -jnp.inf)
        m_new = jnp.maximum(m, lse_h)
        # m_new can only be -inf before any valid hop contributed (h=0 is
        # always valid under causal, so post-hop state is always finite)
        alpha = jnp.exp2(m - m_new)
        w = jnp.exp2(lse_h - m_new)
        acc = acc * alpha[..., None] + o_h.astype(jnp.float32) * w[..., None]
        l = l * alpha + w
        m = m_new
        # rotate every hop so k/v end the loop back on their home chip
        kv = _shift(kv, axis_name, n)
    out = (acc / l[..., None]).astype(q.dtype)
    lse = m + jnp.log2(l)                                   # global, base-2
    return out, lse


def _ring_bwd_impl(q, k, v, out, lse, do, axis_name, axis_size, causal,
                   scale, block_q, block_k, interpret):
    n = axis_size
    i = lax.axis_index(axis_name)
    s = _resolve_scale(scale, q)
    lse_full = jnp.broadcast_to(lse[..., None], (*lse.shape, LSE_W))
    dq = jnp.zeros(q.shape, jnp.float32)
    state = (k, v, jnp.zeros(k.shape, jnp.float32),
             jnp.zeros(v.shape, jnp.float32))
    zero = jnp.zeros_like(do)
    for h in range(n):
        kh, vh, dk_acc, dv_acc = state
        if causal and h > 0:
            do_h = jnp.where(i >= h, do, zero)
        else:
            do_h = do
        dq_h, dk_h, dv_h = _bwd_call(
            q, kh, vh, out, lse_full, do_h, s, causal and h == 0,
            block_q, block_k, interpret,
        )
        dq = dq + dq_h.astype(jnp.float32)
        state = (kh, vh, dk_acc + dk_h.astype(jnp.float32),
                 dv_acc + dv_h.astype(jnp.float32))
        state = _shift(state, axis_name, n)
    _, _, dk, dv = state
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def ring_flash_attention(q, k, v, axis_name: str, axis_size: int,
                         causal: bool = True, scale: float = None,  # noqa: RUF013
                         block_q: int = 256, block_k: int = 256,
                         interpret: bool = False):
    """Flash attention with q/k/v sharded (B, H, S/n, D) per chip over
    mesh axis `axis_name` of size `axis_size`.  Call INSIDE `shard_map`.

    Semantically identical to `flash_attention` on the gathered arrays;
    the full sequence never materialises on any chip.  Sliding windows
    and in-kernel dropout are not supported on the ring path.
    """
    out, _ = _ring_fwd_impl(q, k, v, axis_name, axis_size, causal, scale,
                            block_q, block_k, interpret)
    return out


def _ring_vjp_fwd(q, k, v, axis_name, axis_size, causal, scale,
                  block_q, block_k, interpret):
    out, lse = _ring_fwd_impl(q, k, v, axis_name, axis_size, causal,
                              scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _ring_vjp_bwd(axis_name, axis_size, causal, scale, block_q, block_k,
                  interpret, res, do):
    q, k, v, out, lse = res
    return _ring_bwd_impl(q, k, v, out, lse, do, axis_name, axis_size,
                          causal, scale, block_q, block_k, interpret)


ring_flash_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)
