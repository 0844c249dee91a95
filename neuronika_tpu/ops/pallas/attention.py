"""Causal flash attention — Pallas TPU kernels with a custom VJP.

The memory-bound step of the flagship transformer: materialising the
(B, H, S, S) attention matrix in HBM is the classic bandwidth wall. This
kernel keeps the running softmax statistics (m, l) in VMEM and never writes
the S×S matrix (flash-attention-2 schedule): one forward kernel, and two
backward kernels (a dq pass over query blocks and a dk/dv pass over key
blocks) driven by the saved log-sum-exp and the delta = Σ dO·O row term.

Performance notes (TPU v5e measurements drive these choices):
* every MXU contraction takes **bf16 operands with f32 accumulation**
  (`preferred_element_type=f32`) — upcasting q/k/v/p to f32 before the dot
  would halve MXU throughput or worse; softmax/statistics math stays f32 on
  the VPU.
* the causal loop is split into a full-tiles range (no mask evaluated) and
  the single diagonal tile range (iota mask) — the mask is a VPU cost paid
  only where it changes the result.
* the log-sum-exp residual is stored `(B, H, S, LSE_W)` with LSE_W = 8
  lanes (the f32 sublane tile), not 128 — 16× less HBM for the residual
  that selective rematerialisation keeps alive per layer.
* under `jax.checkpoint`, the forward kernel is NOT re-run in the backward
  pass when the remat policy saves pallas/custom_vjp outputs (the
  primitive-name predicate in models/transformer._remat_policy) — the
  out/lse residuals are then kept instead of recomputed.

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
LSE_W = 8  # lane width of the stored log-sum-exp (f32 sublane tile)
# Softmax runs in the exp2 domain: the VPU's native exponent is base-2, so
# exp(x) is computed as exp2(x·log2(e)) anyway — folding log2(e) into the
# static scale removes one multiply per element from every softmax pass
# (the kernels are VPU-bound at head_dim 128, so elementwise passes are the
# critical path, not the MXU dots). The stored lse is base-2; it never
# leaves these kernels.
LOG2E = 1.4426950408889634


def _dot_bf16(a, b):
    """MXU contraction: operands stay in their storage dtype (bf16 on the
    perf path), accumulation in f32."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _tile_keep_mask(seed_ref, b, h, row_tile, col_tile, shape, rate,
                    interpret=False):
    """Deterministic per-tile dropout keep-mask.

    Seeded by (seed, batch, head, absolute q-tile, absolute k-tile) so the
    forward and both backward kernels regenerate the IDENTICAL mask for a
    tile regardless of their own grid/loop orientation (the reference
    stores the noise buffer, node/dropout/mod.rs:53-128; regenerating from
    the on-core counter-based PRNG is the TPU-idiomatic equivalent).

    Interpret mode (CPU tests) has no lowering for the Mosaic PRNG; a
    jax.random emulation keeps fwd/bwd masks consistent there (the actual
    bits differ from TPU — the distribution is what tests check)."""
    threshold = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    # Mosaic's prng_seed accepts at most TWO seed values — mix the tile
    # coordinates into one int32 (injective for b<96, h<99, row<99 tiles;
    # far beyond practical shapes).
    mix = (b * jnp.int32(1000003) + h * jnp.int32(10007)
           + row_tile * jnp.int32(101) + col_tile)
    if interpret:
        key = jax.random.fold_in(jax.random.key(seed_ref[0]), mix)
        bits = jax.random.bits(key, shape, jnp.uint32)
    else:
        pltpu.prng_seed(seed_ref[0], mix)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= threshold  # keep with probability 1 - rate


# --------------------------------------------------------------------------
# forward kernel


def _fwd_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, *, scale,
                block_k, causal, dropout, interpret=False, window=0):
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    seq = k_ref.shape[2]
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    q = q_ref[0, 0]  # (bq, d) — storage dtype feeds the MXU directly

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)

    def tile(j, carry, masked):
        m, l, acc = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = _dot_bf16(q, kb.T) * (scale * LOG2E)  # f32 (bq, bk)
        if masked:
            rows = qi * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = j * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = rows >= cols
            if window:  # sliding window: only the last `window` keys
                keep &= rows - cols < window
            s = jnp.where(keep, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=1))
        p = jnp.exp2(s - m_new[:, None])
        alpha = jnp.exp2(m - m_new)
        # softmax statistics (l, lse) are UNMASKED — dropout applies to the
        # normalised probabilities, so masking only touches the p·v term
        l = l * alpha + p.sum(axis=1)
        if dropout > 0.0:
            keep = _tile_keep_mask(seed_ref, b, h, qi, j,
                                   (block_q, block_k), dropout, interpret)
            p = jnp.where(keep, p, 0.0)
        acc = acc * alpha[:, None] + _dot_bf16(p.astype(q_ref.dtype), vb)
        return m_new, l, acc

    if causal:
        # tiles strictly below the diagonal need no mask; tiles crossing it
        # (block_q/block_k not nested ⇒ possibly several) evaluate the iota
        # mask; tiles strictly above are skipped entirely. With a sliding
        # window the band also has a LOWER edge: tiles fully below
        # (cols ≤ rows−window for every pair) are skipped, tiles crossing
        # it are masked — O(S·window) work instead of O(S²/2).
        n_full = (qi * block_q) // block_k
        n_edge = ((qi + 1) * block_q + block_k - 1) // block_k
        if window:
            qs = qi * block_q
            qe = qs + block_q
            j_min = jnp.maximum(0, (qs - window + 1) // block_k)
            # first tile whose EVERY column is in-window for every row
            j_full = jnp.clip((qe - window + block_k - 1) // block_k,
                              j_min, n_full)
            carry = lax.fori_loop(
                j_min, j_full, lambda j, c: tile(j, c, True), (m0, l0, acc0)
            )
            carry = lax.fori_loop(
                j_full, n_full, lambda j, c: tile(j, c, False), carry
            )
        else:
            carry = lax.fori_loop(
                0, n_full, lambda j, c: tile(j, c, False), (m0, l0, acc0)
            )
        m, l, acc = lax.fori_loop(
            n_full, n_edge, lambda j, c: tile(j, c, True), carry
        )
    else:
        m, l, acc = lax.fori_loop(
            0, seq // block_k, lambda j, c: tile(j, c, False), (m0, l0, acc0)
        )
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0
    o_ref[0, 0] = (acc * (inv_keep / l[:, None])).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(
        (m + jnp.log2(l))[:, None], lse_ref.shape[2:]
    )


# --------------------------------------------------------------------------
# backward kernels


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
                   dq_ref, *, scale, block_k, causal, dropout,
                   interpret=False, window=0):
    block_q = q_ref.shape[2]
    seq = k_ref.shape[2]
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]      # (bq, 1)
    delta = delta_ref[0, 0][:, :1]
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    def tile(j, dq, masked):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = _dot_bf16(q, kb.T) * (scale * LOG2E)
        if masked:
            rows = qi * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = j * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = rows >= cols
            if window:
                keep &= rows - cols < window
            s = jnp.where(keep, s, NEG_INF)
        # p <= 1 mathematically (lse >= every in-row score); the clamp
        # keeps out-of-distribution scores (ring attention's future
        # blocks, whose contribution is zeroed via do/delta) from
        # overflowing exp2 into inf * 0 = NaN.
        p = jnp.exp2(jnp.minimum(s - lse, 0.0))
        dp = _dot_bf16(do, vb.T)
        if dropout > 0.0:
            keep = _tile_keep_mask(seed_ref, b, h, qi, j,
                                   (block_q, block_k), dropout, interpret)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - delta) * scale
        return dq + _dot_bf16(ds.astype(q_ref.dtype), kb)

    dq0 = jnp.zeros((block_q, q_ref.shape[3]), jnp.float32)
    if causal:
        n_full = (qi * block_q) // block_k
        n_edge = ((qi + 1) * block_q + block_k - 1) // block_k
        if window:  # same banded ranges as the forward kernel
            qs = qi * block_q
            qe = qs + block_q
            j_min = jnp.maximum(0, (qs - window + 1) // block_k)
            j_full = jnp.clip((qe - window + block_k - 1) // block_k,
                              j_min, n_full)
            dq = lax.fori_loop(j_min, j_full,
                               lambda j, d: tile(j, d, True), dq0)
            dq = lax.fori_loop(j_full, n_full,
                               lambda j, d: tile(j, d, False), dq)
        else:
            dq = lax.fori_loop(0, n_full, lambda j, d: tile(j, d, False),
                               dq0)
        dq = lax.fori_loop(n_full, n_edge, lambda j, d: tile(j, d, True), dq)
    else:
        dq = lax.fori_loop(
            0, seq // block_k, lambda j, d: tile(j, d, False), dq0
        )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    seed_ref, dk_ref, dv_ref, *, scale, block_q, causal,
                    dropout, interpret=False, window=0):
    block_k = k_ref.shape[2]
    hd = k_ref.shape[3]
    seq = q_ref.shape[2]
    b, h, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    def tile(i, carry, masked):
        dk, dv = carry
        qb = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        s = _dot_bf16(qb, k.T) * (scale * LOG2E)
        if masked:
            rows = i * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = kj * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = rows >= cols
            if window:
                keep &= rows - cols < window
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp2(jnp.minimum(s - lse, 0.0))  # see _bwd_dq_kernel note
        dp = _dot_bf16(dob, v.T)
        if dropout > 0.0:
            # same absolute (q-tile, k-tile) seed as fwd/dq -> same mask
            keep = _tile_keep_mask(seed_ref, b, h, i, kj,
                                   (block_q, block_k), dropout, interpret)
            pv = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pv = p
        dv = dv + _dot_bf16(pv.astype(q_ref.dtype).T, dob)
        ds = p * (dp - delta) * scale
        dk = dk + _dot_bf16(ds.astype(q_ref.dtype).T, qb)
        return dk, dv

    zeros = (
        jnp.zeros((block_k, hd), jnp.float32),
        jnp.zeros((block_k, hd), jnp.float32),
    )
    num_q = seq // block_q
    if causal:
        # query tiles strictly below this key tile's diagonal are masked to
        # zero contribution — start at the first overlapping tile; tiles
        # fully past the diagonal (q-block entirely ≥ k-block end) unmasked.
        # A sliding window adds an UPPER edge: query tiles with every row
        # ≥ col+window contribute nothing and are skipped.
        start = (kj * block_k) // block_q
        n_edge = ((kj + 1) * block_k + block_q - 1) // block_q
        carry = lax.fori_loop(
            start, n_edge, lambda i, c: tile(i, c, True), zeros
        )
        if window:
            ks = kj * block_k
            ke = ks + block_k
            # rows valid while r ≤ c+window−1: full tiles end at
            # ks+window, partially-valid tiles end at ke+window−1
            i_full = jnp.clip((ks + window) // block_q, n_edge, num_q)
            i_edge = jnp.clip((ke + window - 2) // block_q + 1, i_full,
                              num_q)
            carry = lax.fori_loop(
                n_edge, i_full, lambda i, c: tile(i, c, False), carry
            )
            dk, dv = lax.fori_loop(
                i_full, i_edge, lambda i, c: tile(i, c, True), carry
            )
        else:
            dk, dv = lax.fori_loop(
                n_edge, num_q, lambda i, c: tile(i, c, False), carry
            )
    else:
        dk, dv = lax.fori_loop(0, num_q, lambda i, c: tile(i, c, False), zeros)
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


def _block_size(seq: int, block: int, what: str) -> int:
    """One axis, its own length: q blocks divide Sq, kv blocks divide
    Skv — never cross-checked (cross-attention has Sq != Skv)."""
    b = min(block, seq)
    if seq % b:
        raise ValueError(
            f"{what} length {seq} must be divisible by its block size {b}")
    return b


def _shrink_block(bk: int, seq: int, cap: int = 256) -> int:
    """Shrink a validated block size (bk | seq) to at most `cap` while
    KEEPING divisibility — `min(bk, 256)` alone can return a non-divisor
    for non-power-of-two callers (e.g. bk=384, Skv=1152 -> 256∤1152: the
    dkv grid would under-cover the kv rows and silently drop the last
    partial block's gradients). Halving an even divisor of `seq` is
    always a divisor; odd leftovers fall back to the largest divisor
    <= cap."""
    while bk > cap and bk % 2 == 0:
        bk //= 2
    if bk > cap:
        for d in range(min(cap, seq), 0, -1):
            if seq % d == 0:
                return d
    return bk


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape((1,))


def _fwd_call(q, k, v, scale, causal, block_q, block_k, interpret,
              dropout=0.0, seed=None, window=0):
    B, H, S, D = q.shape
    Skv = k.shape[2]
    if causal and Skv != S:
        raise ValueError("causal attention requires matching q/kv lengths")
    if window and not causal:
        raise ValueError("sliding window requires causal attention")
    bq = _block_size(S, block_q, "query sequence")
    bk = _block_size(Skv, block_k, "key/value sequence")
    if dropout > 0.0 and Skv * D * q.dtype.itemsize > 2 ** 19:
        # the dropout keep-mask is seeded per (q-tile, k-tile) index, so
        # fwd/dq/dkv must share block sizes; mirror the dkv pass's
        # scoped-VMEM clamp (see _bwd_call) here when it will fire
        bk = _shrink_block(bk, Skv)
    grid = (B, H, S // bq)
    row_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk,
                          causal=causal, dropout=dropout,
                          interpret=interpret, window=window),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, LSE_W), jnp.float32),
        ),
        grid=grid,
        in_specs=[row_spec, full_spec, full_spec, seed_spec],
        out_specs=(
            row_spec,
            pl.BlockSpec((1, 1, bq, LSE_W), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * Skv * D // (2 if causal else 1),
            bytes_accessed=4 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * Skv,
        ),
        interpret=interpret,
    )(q, k, v, _seed_arr(seed))
    return out, lse


def _bwd_call(q, k, v, o, lse, do, scale, causal, block_q, block_k,
              interpret, dropout=0.0, seed=None, window=0):
    B, H, S, D = q.shape
    Skv = k.shape[2]
    if causal and Skv != S:
        raise ValueError("causal attention requires matching q/kv lengths")
    if window and not causal:
        raise ValueError("sliding window requires causal attention")
    bq = _block_size(S, block_q, "query sequence")
    bk = _block_size(Skv, block_k, "key/value sequence")
    # scoped-VMEM clamp (same rationale as _bwd_call_qkv): the dkv
    # pass's whole-S q/do/lse/delta blocks + (bk, D) f32 accumulators
    # crowd the 16M stack at S4096/hd128 with bk=512 (measured,
    # tools/probe_s4096_vmem.py). Only the dkv pass is clamped — the dq
    # pass's footprint is bk-independent (bk just tiles its loop over
    # whole-S k/v already resident in VMEM).
    bk_kv = _shrink_block(bk, Skv) if Skv * D * q.dtype.itemsize > 2 ** 19 else bk
    if dropout > 0.0:
        # tile-seeded keep-masks: every pass must share block sizes
        # (_fwd_call applies the same clamp), including the dq pass
        bk = bk_kv
    # delta = rowsum(dO * O), stored like lse
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (B, H, S, LSE_W))

    row_q = pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    row_k = pl.BlockSpec((1, 1, bk_kv, D), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    full_kv = pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    vec_q = pl.BlockSpec((1, 1, bq, LSE_W), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((1, 1, S, LSE_W), lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    seed_a = _seed_arr(seed)

    flops_bwd = 7 * B * H * S * Skv * D // (2 if causal else 1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=bk,
                          causal=causal, dropout=dropout,
                          interpret=interpret, window=window),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, S // bq),
        in_specs=[row_q, full_kv, full_kv, row_q, vec_q, vec_q, seed_spec],
        out_specs=row_q,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_bwd // 7,
            bytes_accessed=5 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * Skv // (2 if causal else 1),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, seed_a)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=bq,
                          causal=causal, dropout=dropout,
                          interpret=interpret, window=window),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, H, Skv // bk_kv),
        in_specs=[full, row_k, row_k, full, vec_full, vec_full, seed_spec],
        out_specs=(row_k, row_k),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * flops_bwd // 7,
            bytes_accessed=5 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * Skv // (2 if causal else 1),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, seed_a)
    return dq, dk, dv


# --------------------------------------------------------------------------
# public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def flash_attention(q, k, v, causal: bool = True, scale: float = None,  # noqa: RUF013
                    block_q: int = 256, block_k: int = 256,
                    interpret: bool = False, window: int = 0):
    """q, k, v: (B, H, S, D) -> (B, H, S, D). Softmax(q·kᵀ·scale)·v with an
    optional causal mask, never materialising the S×S matrix.

    `window` > 0 (requires `causal`) restricts each query to the last
    `window` keys including itself (Mistral-style sliding window); the
    kernels skip tiles outside the band, so compute is O(S·window)."""
    out, _ = _fwd_call(q, k, v, _resolve_scale(scale, q), causal,
                       block_q, block_k, interpret, window=window)
    return out


def _resolve_scale(scale, q):
    return 1.0 / math.sqrt(q.shape[-1]) if scale is None else scale


def _flash_fwd(q, k, v, causal, scale, block_q, block_k, interpret,
               window=0):
    # NOTE on rematerialisation: `checkpoint_name` tags placed in here are
    # invisible to jax.checkpoint policies (the custom_vjp call is opaque to
    # partial-eval). Saving these residuals instead works through a
    # *primitive-name* policy that saves the outputs of the custom_vjp /
    # pallas_call equation itself — see models/transformer._remat_policy.
    s = _resolve_scale(scale, q)
    out, lse = _fwd_call(q, k, v, s, causal, block_q, block_k, interpret,
                         window=window)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, scale, block_q, block_k, interpret, window, res, do):
    q, k, v, out, lse = res
    s = _resolve_scale(scale, q)
    dq, dk, dv = _bwd_call(q, k, v, out, lse, do, s, causal,
                           block_q, block_k, interpret, window=window)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def flash_attention_dropout(q, k, v, seed, causal: bool = True,
                            scale: float = None,  # noqa: RUF013
                            block_q: int = 256, block_k: int = 256,
                            interpret: bool = False, rate: float = 0.1,
                            window: int = 0):
    """Flash attention with attention-dropout INSIDE the kernel.

    `seed`: f32 scalar array (trace-stable across steps — no retrace per
    step); the per-tile keep masks are regenerated deterministically from
    (seed, batch, head, q-tile, k-tile) by the on-core PRNG in both the
    forward and backward kernels, so no mask tensor ever exists in HBM.
    Dropout applies to the *normalised* probabilities with 1/(1-rate)
    scaling, matching the composite softmax-dropout path in distribution."""
    out, _ = _fwd_call(q, k, v, _resolve_scale(scale, q), causal,
                       block_q, block_k, interpret, rate, seed,
                       window=window)
    return out


def _flashdrop_fwd(q, k, v, seed, causal, scale, block_q, block_k,
                   interpret, rate, window=0):
    s = _resolve_scale(scale, q)
    out, lse = _fwd_call(q, k, v, s, causal, block_q, block_k, interpret,
                         rate, seed, window=window)
    return out, (q, k, v, out, lse, seed)


def _flashdrop_bwd(causal, scale, block_q, block_k, interpret, rate,
                   window, res, do):
    q, k, v, out, lse, seed = res
    s = _resolve_scale(scale, q)
    dq, dk, dv = _bwd_call(q, k, v, out, lse, do, s, causal, block_q,
                           block_k, interpret, rate, seed, window=window)
    return dq, dk, dv, jnp.zeros_like(seed)


flash_attention_dropout.defvjp(_flashdrop_fwd, _flashdrop_bwd)


def reference_attention(q, k, v, causal: bool = True, scale: float = None,  # noqa: RUF013
                        window: int = 0):
    """XLA-composite oracle used in tests and as the non-TPU fallback."""
    s = _resolve_scale(scale, q)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * s
    if causal:
        S = q.shape[2]
        mask = jnp.tril(jnp.ones((S, S), bool))
        if window:
            mask &= ~jnp.tril(jnp.ones((S, S), bool), -window)
        att = jnp.where(mask, att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------------------
# layout-native ("packed qkv") kernels
#
# The transformer's qkv projection emits ONE (B, S, W) tensor with
# W = H·hd + 2·KV·hd. The BHSD kernels above require splitting it into
# q/k/v and transposing to (B, H, S, hd) — at d768/S1024 those copies are
# ~18% of the body's HBM traffic (measured: the body forward is
# bandwidth-bound at 0.50 MFU). These kernels instead read head blocks
# STRAIGHT out of the packed tensor via BlockSpec index maps (viewing it
# as (B, S, W//hd, hd)): zero dispatch copies, zero GQA repeats (several
# q-heads map onto one kv block), and the fused backward writes d_qkv in
# the same layout (no repack concat on the flagship path).
#
# PACKED LAYOUT (kv-group-major): the W axis is KV groups of (G+2) hd-wide
# chunks, group g = [q_{gG} … q_{gG+G-1} | k_g | v_g] with G = H / KV.
# Global q-head order is therefore plain head-major (h = g·G + m). Two
# wins over the section-major [all-q | all-k | all-v] alternative:
#   * tensor-parallel sharding: any contiguous W/tp slice that keeps whole
#     groups IS a valid packed tensor for H/tp heads — `shard_map` over a
#     ("dp", None, "tp")-sharded qkv calls these kernels per-shard with no
#     resharding (the section-major layout's tp slices straddle sections).
#   * the per-group backward reads ONE contiguous (S, (G+2)·hd) slab —
#     q members, k and v together — and writes d_qkv the same way.


def _fwd_kernel_qkv(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, *,
                    scale, block_k, causal, dropout, interpret=False,
                    fast=False):
    # Rank-3 refs (Mosaic tiling: last two dims are (sublane, lane); head
    # blocks are hd-wide lane slices at 128-aligned offsets):
    # q_ref (1,bq,hd) · k/v_ref (1,S,hd) · o_ref (1,bq,hd) ·
    # lse_ref (1,1,bq,LSE_W); same math as _fwd_kernel (BHSD twin).
    block_q = q_ref.shape[1]
    head_dim = q_ref.shape[2]
    seq = k_ref.shape[1]
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    q = q_ref[0]

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)

    def tile(j, carry, masked):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = _dot_bf16(q, kb.T) * (scale * LOG2E)
        if masked:
            rows = qi * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = j * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        if fast:
            # "fast" softmax: no running max / rescale (exp2 around 0 is
            # exact by shift-invariance; overflows only past logits ~88 —
            # see GPTConfig.flash_softmax). Drops the max-reduce and the
            # alpha passes from the VPU-bound critical path.
            p = jnp.exp2(s)
            l = l + p.sum(axis=1)
            m_new = m
        else:
            m_new = jnp.maximum(m, s.max(axis=1))
            p = jnp.exp2(s - m_new[:, None])
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + p.sum(axis=1)
        if dropout > 0.0:
            keep = _tile_keep_mask(seed_ref, b, h, qi, j,
                                   (block_q, block_k), dropout, interpret)
            p = jnp.where(keep, p, 0.0)
        if fast:
            acc = acc + _dot_bf16(p.astype(q_ref.dtype), vb)
        else:
            acc = acc * alpha[:, None] + _dot_bf16(p.astype(q_ref.dtype), vb)
        return m_new, l, acc

    carry0 = (jnp.zeros((block_q,), jnp.float32) if fast else m0, l0, acc0)
    if causal:
        n_full = (qi * block_q) // block_k
        n_edge = ((qi + 1) * block_q + block_k - 1) // block_k
        carry = lax.fori_loop(
            0, n_full, lambda j, c: tile(j, c, False), carry0)
        m, l, acc = lax.fori_loop(
            n_full, n_edge, lambda j, c: tile(j, c, True), carry)
    else:
        m, l, acc = lax.fori_loop(
            0, seq // block_k, lambda j, c: tile(j, c, False), carry0)
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0
    o_ref[0] = (acc * (inv_keep / l[:, None])).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(
        (m + jnp.log2(l))[:, None], lse_ref.shape[2:])


def _bwd_dq_kernel_qkv(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                       seed_ref, dq_ref, *, scale, block_k, causal, dropout,
                       interpret=False):
    block_q = q_ref.shape[1]
    seq = k_ref.shape[1]
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, :1]
    # delta = rowsum(dO · O) computed IN-KERNEL (one (bq, hd) reduce per
    # program) — the external delta pass cost ~14 ms/step in the profile
    delta = (do.astype(jnp.float32) * o_ref[0].astype(jnp.float32)).sum(
        -1, keepdims=True)
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    def tile(j, dq, masked):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = _dot_bf16(q, kb.T) * (scale * LOG2E)
        if masked:
            rows = qi * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = j * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp2(s - lse)
        dp = _dot_bf16(do, vb.T)
        if dropout > 0.0:
            keep = _tile_keep_mask(seed_ref, b, h, qi, j,
                                   (block_q, block_k), dropout, interpret)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - delta) * scale
        return dq + _dot_bf16(ds.astype(q_ref.dtype), kb)

    dq0 = jnp.zeros((block_q, q_ref.shape[2]), jnp.float32)
    if causal:
        n_full = (qi * block_q) // block_k
        n_edge = ((qi + 1) * block_q + block_k - 1) // block_k
        dq = lax.fori_loop(0, n_full, lambda j, d: tile(j, d, False), dq0)
        dq = lax.fori_loop(n_full, n_edge, lambda j, d: tile(j, d, True), dq)
    else:
        dq = lax.fori_loop(
            0, seq // block_k, lambda j, d: tile(j, d, False), dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel_qkv(*refs, scale, block_q, causal,
                        dropout, group, interpret=False):
    # grid (B, KV, kblocks); inputs are per-member whole-S q refs
    # (1, S, hd) — G separate lane slices of the group-major packed qkv —
    # plus BLOCKED (1, bk, hd) k/v refs at the kj block (the old whole-S
    # (1, S, (G+2)·hd) slab loaded S·2·hd of k/v rows per program just to
    # read bk of them; with double buffering that overflowed the 16M
    # scoped-VMEM stack at S4096/hd128 bk=512); do/o refs carry the
    # group's q-heads as (1, S, G*hd) slices of the dense head-major
    # tensors; lse (1, G, S, LSE_W); dk/dv out (1, bk, hd).
    q_refs = refs[:group]
    k_ref, v_ref, do_ref, o_ref, lse_ref, seed_ref, dk_ref, dv_ref = \
        refs[group:]
    hd = dk_ref.shape[2]
    block_k = dk_ref.shape[1]
    seq = q_refs[0].shape[1]
    b, g, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    k = k_ref[0]
    v = v_ref[0]
    dtype = k_ref.dtype
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    def tile(i, carry, member, masked):
        dk, dv = carry
        qb = q_refs[member][0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, pl.ds(i * block_q, block_q),
                     member * hd:(member + 1) * hd]
        ob = o_ref[0, pl.ds(i * block_q, block_q),
                   member * hd:(member + 1) * hd]
        lse = lse_ref[0, member, pl.ds(i * block_q, block_q), :1]
        delta = (dob.astype(jnp.float32) * ob.astype(jnp.float32)).sum(
            -1, keepdims=True)
        s = _dot_bf16(qb, k.T) * (scale * LOG2E)
        if masked:
            rows = i * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = kj * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp2(s - lse)
        dp = _dot_bf16(dob, v.T)
        if dropout > 0.0:
            # global q-head index for mask consistency with fwd/dq
            h = g * group + member
            keep = _tile_keep_mask(seed_ref, b, h, i, kj,
                                   (block_q, block_k), dropout, interpret)
            pv = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pv = p
        dv = dv + _dot_bf16(pv.astype(dtype).T, dob)
        ds = p * (dp - delta) * scale
        dk = dk + _dot_bf16(ds.astype(dtype).T, qb)
        return dk, dv

    zeros = (
        jnp.zeros((block_k, hd), jnp.float32),
        jnp.zeros((block_k, hd), jnp.float32),
    )
    num_q = seq // block_q
    carry = zeros
    for member in range(group):  # static unroll over the kv-group
        if causal:
            start = (kj * block_k) // block_q
            n_edge = ((kj + 1) * block_k + block_q - 1) // block_q
            carry = lax.fori_loop(
                start, n_edge,
                lambda i, c, m=member: tile(i, c, m, True), carry)
            carry = lax.fori_loop(
                n_edge, num_q,
                lambda i, c, m=member: tile(i, c, m, False), carry)
        else:
            carry = lax.fori_loop(
                0, num_q, lambda i, c, m=member: tile(i, c, m, False), carry)
    dk, dv = carry
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _qkv_geometry(qkv, n_head, n_kv_head):
    B, S, W = qkv.shape
    KV = n_kv_head or n_head
    hd = W // (n_head + 2 * KV)
    if hd * (n_head + 2 * KV) != W:
        raise ValueError(f"packed width {W} does not factor into "
                         f"H={n_head}, KV={KV} heads")
    return B, S, W, KV, hd


def _fwd_call_qkv(qkv, n_head, n_kv_head, scale, causal, block_q, block_k,
                  interpret, dropout=0.0, seed=None, fast=False):
    B, S, W, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    H, G = n_head, n_head // (n_kv_head or n_head)
    bq, bk = _block_sizes(S, block_q, block_k)
    if dropout > 0.0 and \
            2 * (3 * G * S * hd * qkv.dtype.itemsize + S * LSE_W * 4) > 13e6:
        # tile-seeded keep-masks require fwd/dq/dkv to share block sizes;
        # mirror the dkv pass's scoped-VMEM clamp (_bwd_call_qkv) when it
        # will fire
        bk = _shrink_block(bk, S)
    grid = (B, H, S // bq)
    # group-major layout: q-head h lives in group g = h//G at member slot
    # h%G; its k/v chunks close the group (see the layout comment above)
    qc = lambda h: (h // G) * (G + 2) + h % G
    kc = lambda h: (h // G) * (G + 2) + G

    q_spec = pl.BlockSpec((1, bq, hd), lambda b, h, i: (b, i, qc(h)),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, kc(h)),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, kc(h) + 1),
                          memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_qkv, scale=scale, block_k=bk,
                          causal=causal, dropout=dropout,
                          interpret=interpret, fast=fast),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, H * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, H, S, LSE_W), jnp.float32),
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, seed_spec],
        out_specs=(
            pl.BlockSpec((1, bq, hd), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, LSE_W), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * hd // (2 if causal else 1),
            bytes_accessed=2 * B * S * W * qkv.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, _seed_arr(seed))
    return out, lse


def _bwd_call_qkv(qkv, n_head, n_kv_head, out, lse, do, scale, causal,
                  block_q, block_k, interpret, dropout=0.0, seed=None):
    B, S, W, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    H, G = n_head, n_head // (n_kv_head or n_head)
    bq, bk = _block_sizes(S, block_q, block_k)
    if dropout == 0.0 and 6 * G * S * hd * qkv.dtype.itemsize > 9e6:
        # wide-head long-S (e.g. S4096/hd256): without dropout the
        # blocks are free to shrink (no keep-mask coupling with the
        # forward), and the caller's bq=512 tile intermediates overflow
        # the 16M stack on top of the whole-S q/do/o residents —
        # measured on TPU: (512, *) fails Mosaic, (256, 256) compiles.
        bq = _shrink_block(bq, S)
        bk = _shrink_block(bk, S)
    # The dq pass's footprint is bk-independent (bk only tiles its inner
    # loop over whole-S k/v already in VMEM), so it always keeps the
    # caller's bk. The dkv pass holds whole-S q/do/o/lse blocks whose
    # doubled-buffered total nears Mosaic's 16M scoped-VMEM stack at long
    # S (measured r4, tools/probe_s4096_vmem.py); shrink ITS kv block
    # when the estimate crowds the stack (the (bk, hd) f32 accumulators
    # are the only bk-scaled term left after the slab->blocked-k/v
    # restructure below — S4096/hd128 now fits at bk=512).
    est = 2 * (3 * G * S * hd * qkv.dtype.itemsize + S * LSE_W * 4)
    bk_kv = _shrink_block(bk, S) if est > 13e6 else bk
    if dropout > 0.0:
        # tile-seeded keep-masks: every pass must share block sizes
        # (_fwd_call_qkv applies the same clamp), including the dq pass
        bk = bk_kv
    # group-major chunk maps (see the packed-layout comment above)
    qc = lambda h: (h // G) * (G + 2) + h % G
    kc = lambda h: (h // G) * (G + 2) + G

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    seed_a = _seed_arr(seed)
    # packed-qkv q block vs dense head-major (do / out / dq) block: same
    # shape, different chunk maps
    pk_q = pl.BlockSpec((1, bq, hd), lambda b, h, i: (b, i, qc(h)),
                        memory_space=pltpu.VMEM)
    row_q = pl.BlockSpec((1, bq, hd), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM)
    k_full = pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, kc(h)),
                          memory_space=pltpu.VMEM)
    v_full = pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, kc(h) + 1),
                          memory_space=pltpu.VMEM)
    vec_q = pl.BlockSpec((1, 1, bq, LSE_W), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)

    flops_bwd = 7 * B * H * S * S * hd // (2 if causal else 1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_qkv, scale=scale, block_k=bk,
                          causal=causal, dropout=dropout,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((B, S, H * hd), qkv.dtype),
        grid=(B, H, S // bq),
        in_specs=[pk_q, k_full, v_full, row_q, row_q, vec_q, seed_spec],
        out_specs=row_q,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_bwd // 7,
            bytes_accessed=3 * B * S * W * qkv.dtype.itemsize,
            transcendentals=B * H * S * S // (2 if causal else 1),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, do, out, lse, seed_a)

    # dk/dv: grid over kv heads; each program reads its group's q members
    # as G whole-S (1, S, hd) lane slices of the packed qkv, this kj's
    # (1, bk, hd) k/v blocks (blocked — the old whole-S slab overflowed
    # scoped VMEM at long S), and the group's (1, S, G·hd) slice of the
    # dense head-major do/o
    qm_specs = [
        pl.BlockSpec((1, S, hd),
                     lambda b, g, j, m=m: (b, 0, g * (G + 2) + m),
                     memory_space=pltpu.VMEM)
        for m in range(G)
    ]
    kb_spec = pl.BlockSpec((1, bk_kv, hd),
                           lambda b, g, j: (b, j, g * (G + 2) + G),
                           memory_space=pltpu.VMEM)
    vb_spec = pl.BlockSpec((1, bk_kv, hd),
                           lambda b, g, j: (b, j, g * (G + 2) + G + 1),
                           memory_space=pltpu.VMEM)
    qg_spec = pl.BlockSpec((1, S, G * hd), lambda b, g, j: (b, 0, g),
                           memory_space=pltpu.VMEM)
    vg_spec = pl.BlockSpec((1, G, S, LSE_W), lambda b, g, j: (b, g, 0, 0),
                           memory_space=pltpu.VMEM)
    dkv_out = pl.BlockSpec((1, bk_kv, hd), lambda b, g, j: (b, j, g),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_qkv, scale=scale, block_q=bq,
                          causal=causal, dropout=dropout, group=G,
                          interpret=interpret),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, KV * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, S, KV * hd), qkv.dtype),
        ),
        grid=(B, KV, S // bk_kv),
        in_specs=[*qm_specs, kb_spec, vb_spec, qg_spec, qg_spec, vg_spec,
                  seed_spec],
        out_specs=(dkv_out, dkv_out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * flops_bwd // 7,
            bytes_accessed=3 * B * S * W * qkv.dtype.itemsize,
            transcendentals=B * H * S * S // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*([qkv] * (G + 2)), do, out, lse, seed_a)

    # repack head-major dq + per-group dk/dv into the group-major layout
    d_qkv = jnp.concatenate(
        [dq.reshape(B, S, KV, G, hd),
         dk.reshape(B, S, KV, 1, hd),
         dv.reshape(B, S, KV, 1, hd)], axis=3,
    ).reshape(B, S, W)
    return d_qkv


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def flash_attention_qkv(qkv, seed, n_head: int, n_kv_head: int = 0,
                        causal: bool = True, scale: float = None,  # noqa: RUF013
                        block_q: int = 256, block_k: int = 256,
                        interpret: bool = False, dropout: float = 0.0,
                        fast_softmax: bool = False,
                        fused_bwd: bool = False):
    """Layout-native flash attention on the packed qkv projection.

    `qkv` (B, S, H·hd + 2·KV·hd) — the raw output of the fused qkv matmul
    (+bias) in the kv-group-major layout: KV groups of (G+2) hd-wide
    chunks, group g = [q_{gG} … q_{gG+G-1} | k_g | v_g] (see the layout
    comment above — this makes any whole-group tp shard a valid packed
    tensor). Returns (B, S, H·hd) head-major, ready for the output
    projection. No split / transpose / GQA-repeat copies ever hit HBM.
    `seed` (f32 scalar) drives in-kernel attention dropout when
    dropout > 0 (see flash_attention_dropout)."""
    _, _, _, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    s = 1.0 / math.sqrt(hd) if scale is None else scale
    out, _ = _fwd_call_qkv(qkv, n_head, n_kv_head, s, causal, block_q,
                           block_k, interpret, dropout, seed, fast_softmax)
    return out


def _flashqkv_fwd(qkv, seed, n_head, n_kv_head, causal, scale, block_q,
                  block_k, interpret, dropout, fast_softmax,
                  fused_bwd=False):
    _, _, _, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    s = 1.0 / math.sqrt(hd) if scale is None else scale
    out, lse = _fwd_call_qkv(qkv, n_head, n_kv_head, s, causal, block_q,
                             block_k, interpret, dropout, seed, fast_softmax)
    return out, (qkv, out, lse, seed)


def _flashqkv_bwd(n_head, n_kv_head, causal, scale, block_q, block_k,
                  interpret, dropout, fast_softmax, fused_bwd, res, do):
    qkv, out, lse, seed = res
    _, S, _, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    s = 1.0 / math.sqrt(hd) if scale is None else scale
    bwd = _bwd_call_qkv
    if fused_bwd:
        # The slab-fused kernel holds whole-S slabs (qkv in+out, o, do)
        # plus two f32 (S, hd) scratches per program; with double
        # buffering the footprint grows linearly in S and blows the 16M
        # scoped-VMEM stack at S4096/hd128 (measured r4: Mosaic compile
        # failure; S2048 fits). Oversize no-dropout shapes route to the
        # i-BLOCKED fused kernel (same 5-pass math, q-tile loop promoted
        # to the grid, dk/dv in scratch) when ITS whole-S residents
        # (k/v in, dk/dv out, two f32 scratches — ~(8·it+8)·S·hd bytes)
        # fit the stack: S4096/hd128 bf16 measures f+b 0.5723 vs the
        # split pair's 0.4433 (the split executes 9 MXU passes for the
        # 7 the fused path needs). Shapes too big even for the blocked
        # kernel (S4096/hd256, S16384/hd128 — compile-checked on TPU)
        # keep the split pair, as do oversize dropout shapes (dropout
        # pins the blocked kernel to the forward's (bq, bk), which
        # does not compile at these sizes).
        #
        # NB dropout at est <= 12e6 is safe on the slab kernel: the
        # forward's keep-mask clamp condition implies est > 17e6 for
        # every dtype, so a clamped forward can never pair with the
        # unclamped slab backward.
        G = n_head // (n_kv_head or n_head)
        est = S * hd * (qkv.dtype.itemsize * (8 * G + 8) + 8)
        blocked_est = S * hd * (8 * qkv.dtype.itemsize + 8)
        if est <= 12e6:
            bwd = _bwd_call_qkv_fused
        elif dropout == 0.0 and blocked_est <= 14e6:
            bwd = _bwd_call_qkv_fused_blocked
    d_qkv = bwd(qkv, n_head, n_kv_head, out, lse, do, s, causal,
                block_q, block_k, interpret, dropout, seed)
    dseed = None if seed is None else jnp.zeros_like(seed)
    return d_qkv, dseed


flash_attention_qkv.defvjp(_flashqkv_fwd, _flashqkv_bwd)


# --------------------------------------------------------------------------
# fused backward (packed layout): dq + dk + dv in ONE kernel
#
# The split dq/dkv passes each recompute s = q·kᵀ and dp = dO·vᵀ — 7 MXU
# tiles and two exp2 passes per (i, j) pair. This kernel walks the (i, j)
# tile grid once per (batch, kv-head): 5 MXU tiles, one exp2. dq rows
# accumulate in registers over j; dk/dv accumulate in VMEM scratch over
# (member, i) and write out at the end. Profiled: the split backward was
# ~15% of the train step.


def _bwd_fused_kernel_qkv(slab_ref, do_ref, o_ref, lse_ref,
                          seed_ref, dqkv_ref,
                          dk_scr, dv_scr, *, scale, block_q, block_k,
                          causal, dropout, group, interpret=False):
    # grid (B, KV). slab (1, S, (G+2)·hd) — the kv-group's contiguous
    # slice of the group-major packed qkv (q member m at m·hd, k at G·hd,
    # v at (G+1)·hd); do/o (1, S, G*hd) head-major slices; lse (1, G, S, W).
    # out: d_qkv (1, S, (G+2)·hd) written in the SAME packed layout — no
    # repack concat ever hits HBM. Scratch dk/dv (S, hd) f32.
    S = slab_ref.shape[1]
    hd = do_ref.shape[2] // group
    b, g = pl.program_id(0), pl.program_id(1)
    n_q = S // block_q
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    dk_scr[...] = jnp.zeros((S, hd), jnp.float32)
    dv_scr[...] = jnp.zeros((S, hd), jnp.float32)

    for member in range(group):  # static unroll over the kv-group
        h = g * group + member

        def qtile(i, _, member=member, h=h):
            qb = slab_ref[0, pl.ds(i * block_q, block_q),
                          member * hd:(member + 1) * hd]
            dob = do_ref[0, pl.ds(i * block_q, block_q),
                         member * hd:(member + 1) * hd]
            ob = o_ref[0, pl.ds(i * block_q, block_q),
                       member * hd:(member + 1) * hd]
            lse = lse_ref[0, member, pl.ds(i * block_q, block_q), :1]
            delta = (dob.astype(jnp.float32)
                     * ob.astype(jnp.float32)).sum(-1, keepdims=True)

            def ktile(j, dq, masked):
                kb = slab_ref[0, pl.ds(j * block_k, block_k),
                              group * hd:(group + 1) * hd]
                vb = slab_ref[0, pl.ds(j * block_k, block_k),
                              (group + 1) * hd:(group + 2) * hd]
                s = _dot_bf16(qb, kb.T) * (scale * LOG2E)
                if masked:
                    rows = i * block_q + lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 0)
                    cols = j * block_k + lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 1)
                    s = jnp.where(rows >= cols, s, NEG_INF)
                p = jnp.exp2(s - lse)
                dp = _dot_bf16(dob, vb.T)
                if dropout > 0.0:
                    keep = _tile_keep_mask(seed_ref, b, h, i, j,
                                           (block_q, block_k), dropout,
                                           interpret)
                    pv = jnp.where(keep, p * inv_keep, 0.0)
                    dp = jnp.where(keep, dp * inv_keep, 0.0)
                else:
                    pv = p
                ds = p * (dp - delta) * scale
                dsb = ds.astype(slab_ref.dtype)
                sl = pl.ds(j * block_k, block_k)
                dv_scr[sl, :] += _dot_bf16(pv.astype(slab_ref.dtype).T, dob)
                dk_scr[sl, :] += _dot_bf16(dsb.T, qb)
                return dq + _dot_bf16(dsb, kb)

            dq0 = jnp.zeros((block_q, hd), jnp.float32)
            if causal:
                n_full = (i * block_q) // block_k
                n_edge = ((i + 1) * block_q + block_k - 1) // block_k
                dq = lax.fori_loop(
                    0, n_full, lambda j, d: ktile(j, d, False), dq0)
                dq = lax.fori_loop(
                    n_full, n_edge, lambda j, d: ktile(j, d, True), dq)
            else:
                dq = lax.fori_loop(
                    0, S // block_k, lambda j, d: ktile(j, d, False), dq0)
            dqkv_ref[0, pl.ds(i * block_q, block_q),
                     member * hd:(member + 1) * hd] = dq.astype(
                dqkv_ref.dtype)
            return 0

        lax.fori_loop(0, n_q, qtile, 0)

    dqkv_ref[0, :, group * hd:(group + 1) * hd] = dk_scr[...].astype(
        dqkv_ref.dtype)
    dqkv_ref[0, :, (group + 1) * hd:(group + 2) * hd] = dv_scr[...].astype(
        dqkv_ref.dtype)


def _bwd_fused_kernel_qkv_blocked(*refs, scale, block_k, causal,
                                  dropout, group, interpret=False):
    # The long-S variant of `_bwd_fused_kernel_qkv` (same 5-MXU-pass
    # math): grid (B, KV, n_q) with the q-tile loop PROMOTED to the
    # sequential grid axis, so q/do/o/lse arrive as (1, bq, ·) blocks
    # instead of whole-S slabs — only k/v stay whole-S (index-invariant
    # in i: fetched once per (b, g)). dk/dv accumulate in f32 VMEM
    # scratch across the i steps and are written at the last i. This
    # cuts the whole-S footprint from ~S·hd·(16G+16+8) bytes to
    # ~S·hd·(4+8+8)+O(bq) — S4096/hd128/G1 fits the 16M scoped-VMEM
    # stack where the slab kernel needs 21M, so the 5-pass fused
    # backward replaces the 7-pass split pair at long S.
    q_refs = refs[:group]
    (k_ref, v_ref, do_ref, o_ref, lse_ref, seed_ref,
     dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs[group:]
    hd = dk_ref.shape[2]
    S = k_ref.shape[1]
    block_q = q_refs[0].shape[1]
    b, g, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_q = pl.num_programs(2)
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    @pl.when(i == 0)
    def _zero():
        dk_scr[...] = jnp.zeros((S, hd), jnp.float32)
        dv_scr[...] = jnp.zeros((S, hd), jnp.float32)

    for member in range(group):  # static unroll over the kv-group
        h = g * group + member
        qb = q_refs[member][0]
        dob = do_ref[0, :, member * hd:(member + 1) * hd]
        ob = o_ref[0, :, member * hd:(member + 1) * hd]
        lse = lse_ref[0, member, :, :1]
        delta = (dob.astype(jnp.float32)
                 * ob.astype(jnp.float32)).sum(-1, keepdims=True)

        def ktile(j, dq, masked, qb=qb, dob=dob, lse=lse, delta=delta,
                  h=h):
            kb = k_ref[0, pl.ds(j * block_k, block_k), :]
            vb = v_ref[0, pl.ds(j * block_k, block_k), :]
            s = _dot_bf16(qb, kb.T) * (scale * LOG2E)
            if masked:
                rows = i * block_q + lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                cols = j * block_k + lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                s = jnp.where(rows >= cols, s, NEG_INF)
            p = jnp.exp2(s - lse)
            dp = _dot_bf16(dob, vb.T)
            if dropout > 0.0:
                keep = _tile_keep_mask(seed_ref, b, h, i, j,
                                       (block_q, block_k), dropout,
                                       interpret)
                pv = jnp.where(keep, p * inv_keep, 0.0)
                dp = jnp.where(keep, dp * inv_keep, 0.0)
            else:
                pv = p
            ds = p * (dp - delta) * scale
            dsb = ds.astype(k_ref.dtype)
            sl = pl.ds(j * block_k, block_k)
            dv_scr[sl, :] += _dot_bf16(pv.astype(k_ref.dtype).T, dob)
            dk_scr[sl, :] += _dot_bf16(dsb.T, qb)
            return dq + _dot_bf16(dsb, kb)

        dq0 = jnp.zeros((block_q, hd), jnp.float32)
        if causal:
            n_full = (i * block_q) // block_k
            n_edge = ((i + 1) * block_q + block_k - 1) // block_k
            dq = lax.fori_loop(
                0, n_full, lambda j, d: ktile(j, d, False), dq0)
            dq = lax.fori_loop(
                n_full, n_edge, lambda j, d: ktile(j, d, True), dq)
        else:
            dq = lax.fori_loop(
                0, S // block_k, lambda j, d: ktile(j, d, False), dq0)
        dq_ref[0, :, member * hd:(member + 1) * hd] = dq.astype(
            dq_ref.dtype)

    @pl.when(i == n_q - 1)
    def _flush():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_call_qkv_fused_blocked(qkv, n_head, n_kv_head, out, lse, do,
                                scale, causal, block_q, block_k,
                                interpret, dropout=0.0, seed=None):
    """Long-S fused backward: one 5-pass kernel over grid (B, KV, n_q),
    then the split path's repack (dq head-major + per-group dk/dv ->
    group-major packed d_qkv)."""
    B, S, W, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    H, G = n_head, n_head // (n_kv_head or n_head)
    bq, bk = _block_sizes(S, block_q, block_k)
    if dropout > 0.0:
        # tile-seeded keep-masks must match the forward's block sizes:
        # mirror _fwd_call_qkv's scoped-VMEM clamp under its EXACT
        # condition (clamping when the fwd didn't — or vice versa —
        # silently corrupts dropout gradients). The VJP router keeps
        # oversize dropout shapes on the split pair; this path serves
        # direct callers and the parity tests.
        if 2 * (3 * G * S * hd * qkv.dtype.itemsize + S * LSE_W * 4) \
                > 13e6:
            bk = _shrink_block(bk, S)
    else:
        # no keep-mask coupling -> free block choice. Measured S4096
        # hd128 sweep (r5, tools/probe_s4096_bq.py + pairs): bq > 256
        # overflows the 16M scoped-VMEM stack (the bq x bk f32 tile
        # intermediates — (512, 512) fails to compile), bq < 256
        # starves the MXU (0.43-0.46); bk = 1024 is the knee
        # (0.5731 vs 0.5418 at bk=512, FAIL at 2048).
        bq = _shrink_block(bq, S)
        bk = _shrink_block(S, S, cap=1024)

    qm_specs = [
        pl.BlockSpec((1, bq, hd),
                     lambda b, g, i, m=m: (b, i, g * (G + 2) + m),
                     memory_space=pltpu.VMEM)
        for m in range(G)
    ]
    k_spec = pl.BlockSpec((1, S, hd),
                          lambda b, g, i: (b, 0, g * (G + 2) + G),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, S, hd),
                          lambda b, g, i: (b, 0, g * (G + 2) + G + 1),
                          memory_space=pltpu.VMEM)
    qg_spec = pl.BlockSpec((1, bq, G * hd), lambda b, g, i: (b, i, g),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, G, bq, LSE_W),
                            lambda b, g, i: (b, g, i, 0),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dq_spec = pl.BlockSpec((1, bq, G * hd), lambda b, g, i: (b, i, g),
                           memory_space=pltpu.VMEM)
    dkv_spec = pl.BlockSpec((1, S, hd), lambda b, g, i: (b, 0, g),
                            memory_space=pltpu.VMEM)

    flops_bwd = 7 * B * H * S * S * hd // (2 if causal else 1)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel_qkv_blocked, scale=scale,
                          block_k=bk, causal=causal, dropout=dropout,
                          group=G, interpret=interpret),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, H * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, S, KV * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, S, KV * hd), qkv.dtype),
        ),
        grid=(B, KV, S // bq),
        in_specs=[*qm_specs, k_spec, v_spec, qg_spec, qg_spec, lse_spec,
                  seed_spec],
        out_specs=(dq_spec, dkv_spec, dkv_spec),
        scratch_shapes=[
            pltpu.VMEM((S, hd), jnp.float32),
            pltpu.VMEM((S, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * flops_bwd // 7,
            bytes_accessed=4 * B * S * W * qkv.dtype.itemsize,
            transcendentals=B * H * S * S // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*([qkv] * (G + 2)), do, out, lse, _seed_arr(seed))

    d_qkv = jnp.concatenate(
        [dq.reshape(B, S, KV, G, hd),
         dk.reshape(B, S, KV, 1, hd),
         dv.reshape(B, S, KV, 1, hd)], axis=3,
    ).reshape(B, S, W)
    return d_qkv


def _bwd_call_qkv_fused(qkv, n_head, n_kv_head, out, lse, do, scale, causal,
                        block_q, block_k, interpret, dropout=0.0, seed=None):
    B, S, W, KV, hd = _qkv_geometry(qkv, n_head, n_kv_head)
    H, G = n_head, n_head // (n_kv_head or n_head)
    bq, bk = _block_sizes(S, block_q, block_k)

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    slab = pl.BlockSpec((1, S, (G + 2) * hd), lambda b, g: (b, 0, g),
                        memory_space=pltpu.VMEM)
    qg = pl.BlockSpec((1, S, G * hd), lambda b, g: (b, 0, g),
                      memory_space=pltpu.VMEM)
    lseg = pl.BlockSpec((1, G, S, LSE_W), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)

    flops_bwd = 7 * B * H * S * S * hd // (2 if causal else 1)
    d_qkv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel_qkv, scale=scale, block_q=bq,
                          block_k=bk, causal=causal, dropout=dropout,
                          group=G, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((B, S, W), qkv.dtype),
        grid=(B, KV),
        in_specs=[slab, qg, qg, lseg, seed_spec],
        out_specs=slab,
        scratch_shapes=[
            pltpu.VMEM((S, hd), jnp.float32),
            pltpu.VMEM((S, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * flops_bwd // 7,
            bytes_accessed=4 * B * S * W * qkv.dtype.itemsize,
            transcendentals=B * H * S * S // (2 if causal else 1),
        ),
        interpret=interpret,
    )(qkv, do, out, lse, _seed_arr(seed))
    return d_qkv
