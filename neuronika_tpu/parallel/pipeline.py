"""Microbatched pipeline parallelism (GPipe-style) over a `pp` mesh axis.

Stage s of the mesh holds its own slice of the stacked layer parameters;
microbatches flow stage-to-stage over ICI via `lax.ppermute` inside a
`shard_map`. The schedule runs `n_micro + n_stages - 1` ticks: stage 0
injects a fresh microbatch each tick while earlier outputs ripple down the
ring, and the last stage collects results (classic GPipe fill/drain, bubble
fraction (P-1)/(T+P-1)).

`pipeline(stage_fn)` works for any per-stage function of the form
`stage_fn(stage_params, x) -> x` where `stage_params` is a pytree whose
leaves carry a leading `n_stages` axis (sharded over `pp`).

Training works by differentiating straight through the schedule:
`jax.grad` of a loss on `pipeline_forward`'s output reverses the fill/drain
loop (ppermute transposes to the opposite ring direction), which is exactly
the backward pipeline; gradients match sequential execution to float
precision (tests). A 1F1B schedule (smaller activation footprint than this
full-forward-then-backward form) is a later optimisation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_forward"]


def pipeline_forward(stage_fn, mesh: Mesh, axis: str = "pp"):
    """Build a pipelined forward: (stage_params, microbatches) -> outputs.

    * `stage_params`: pytree, every leaf has leading dim = n_stages
      (sharded over `axis`).
    * `microbatches`: (n_micro, micro_batch, ...) — replicated input; stage
      0 consumes it.
    Returns outputs (n_micro, micro_batch, ...) gathered from the last
    stage.
    """
    n_stages = mesh.shape[axis]

    def run(stage_params, micro):
        # inside shard_map: stage_params leaves have leading dim 1 (this
        # stage's slice); micro is the full (n_micro, ...) batch.
        stage = lax.axis_index(axis)
        local = jax.tree.map(lambda l: l[0], stage_params)
        n_micro = micro.shape[0]
        ticks = n_micro + n_stages - 1

        buf = jnp.zeros_like(micro[0])
        outs = jnp.zeros_like(micro)

        def tick(t, carry):
            buf, outs = carry
            # stage 0 injects microbatch t (if still filling)
            inject = micro[jnp.minimum(t, n_micro - 1)]
            x = jnp.where(stage == 0, inject, buf)
            y = stage_fn(local, x)
            # last stage collects finished microbatch t-(P-1)
            done_idx = t - (n_stages - 1)
            is_done = jnp.logical_and(stage == n_stages - 1, done_idx >= 0)
            outs = lax.cond(
                is_done,
                lambda o: lax.dynamic_update_index_in_dim(
                    o, y, jnp.maximum(done_idx, 0), 0
                ),
                lambda o: o,
                outs,
            )
            # ripple forward: stage s sends to s+1 (ring; last->0 ignored)
            buf = lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return buf, outs

        _, outs = lax.fori_loop(0, ticks, tick, (buf, outs))
        # every stage's `outs` is partial; only the LAST stage holds data —
        # psum after masking broadcasts it to all (outputs replicated).
        outs = jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, axis)

    def call(stage_params, microbatches):
        specs_params = jax.tree.map(lambda _: P(axis), stage_params)
        return shard_map(
            run,
            mesh=mesh,
            in_specs=(specs_params, P()),
            out_specs=P(),
            check_rep=False,
        )(stage_params, microbatches)

    return call
