"""Microbatched pipeline parallelism over a `pp` mesh axis.

Stage s of the mesh holds its own slice of the stacked layer parameters;
microbatches flow stage-to-stage over ICI via `lax.ppermute` inside a
`shard_map`. Two schedules:

* `pipeline_forward` — GPipe fill/drain: `n_micro + n_stages - 1` ticks,
  stage 0 injects a fresh microbatch each tick while earlier outputs ripple
  down the ring, and the last stage collects results. Training works by
  differentiating straight through the schedule: `jax.grad` reverses the
  loop (ppermute transposes to the opposite ring direction), which is
  exactly the backward pipeline — but XLA then keeps ALL tick activations
  live (full-forward-then-backward memory profile).

* `pipeline_train_1f1b` — one-forward-one-backward: each tick a stage runs
  the forward for one in-flight microbatch AND the backward for another
  (cotangents ripple the reverse ring), with the last stage computing the
  per-microbatch loss gradient the moment a microbatch completes. Stage
  activations are rematerialised at backward time from the saved stage
  *inputs* (≤ 2·(P-1)+1 live per stage), so the activation footprint is
  O(stages), not O(microbatches). MoE-style auxiliary scalar losses flow:
  `stage_fn` returns `(y, aux)` and `aux_weight·mean_micro(Σ_stages aux)`
  joins the objective with exact gradients.

`stage_fn(stage_params, x)` operates on a pytree whose leaves carry a
leading `n_stages` axis (sharded over `pp`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from .mesh import shard_map_compat as shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_forward", "pipeline_train_1f1b"]


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


def pipeline_train_1f1b(stage_fn, loss_fn, mesh: Mesh, axis: str = "pp",
                        aux_weight: float = 0.0):
    """Build a 1F1B fused pipeline train pass.

    * `stage_fn(local_params, x) -> (y, aux)` — one stage's forward; `aux`
      is a scalar auxiliary loss (0.0 if unused). `local_params` leaves
      have the leading stage axis stripped.
    * `loss_fn(y, target, loss_params) -> scalar` — per-microbatch loss at
      the last stage (e.g. LM head + CE); `loss_params` are replicated.

    Returns `run(stage_params, loss_params, micro_x, micro_tgt)` computing

        L = mean_m loss(y_m) + aux_weight * mean_m Σ_stage aux_sm

    and its exact gradients in ONE interleaved schedule:
    `(loss, grads_stage_params, grads_loss_params, dmicro_x)`.
    `dmicro_x` is the cotangent of `micro_x` so callers can chain embedding
    gradients. Microbatch m forwards at stage s on tick s+m and backwards
    on tick 2(P-1)-s+m; total ticks M + 2(P-1). Stage inputs are saved in a
    rotating buffer and the stage is rematerialised (jax.vjp) at backward
    time — in-flight slots per stage ≤ 2(P-1)+1.
    """
    n_stages = mesh.shape[axis]

    def run_sharded(stage_params, loss_params, micro_x, micro_tgt):
        P_ = n_stages
        stage = lax.axis_index(axis)
        local = jax.tree.map(lambda l: l[0], stage_params)
        M = micro_x.shape[0]
        R = min(M, 2 * P_ - 1)  # max in-flight per stage: 2(P-1)+1
        ticks = M + 2 * (P_ - 1)
        aux_ct = jnp.float32(aux_weight / M)

        def fwd_with_aux(loc, x):
            return stage_fn(loc, x)

        def last_stage_grad(y, m):
            """loss value + dL/dy + loss-param grads for microbatch m."""
            tgt = jax.tree.map(lambda t: t[jnp.clip(m, 0, M - 1)], micro_tgt)
            lval, pull = jax.vjp(
                lambda y_, lp: loss_fn(y_, tgt, lp), y, loss_params
            )
            dy, dlp = pull(jnp.ones((), lval.dtype) / M)
            return lval, dy, dlp

        xbuf0 = jnp.zeros((R + 1,) + micro_x.shape[1:], micro_x.dtype)
        carry0 = (
            jnp.zeros_like(micro_x[0]),                     # fwd ripple in
            jnp.zeros_like(micro_x[0]),                     # bwd ripple in
            xbuf0,                                          # saved inputs
            jax.tree.map(jnp.zeros_like, local),            # stage grads
            jax.tree.map(jnp.zeros_like, loss_params),      # loss grads
            jnp.zeros_like(micro_x),                        # dmicro_x
            jnp.zeros((), jnp.float32),                     # loss acc
            jnp.zeros((), jnp.float32),                     # aux acc
        )

        def tick(t, carry):
            fwd_in, bwd_in, xbuf, gstage, gloss, dmicro, lacc, aacc = carry
            last = P_ - 1

            # ---------- forward half: microbatch m_f = t - stage
            m_f = t - stage
            fwd_valid = jnp.logical_and(m_f >= 0, m_f < M)
            inject = micro_x[jnp.clip(m_f, 0, M - 1)]
            x_in = jnp.where(stage == 0, inject, fwd_in)
            y, aux = fwd_with_aux(local, x_in)
            aacc = aacc + jnp.where(fwd_valid, aux.astype(jnp.float32), 0.0)
            wslot = jnp.where(fwd_valid, jnp.mod(m_f, R), R)
            xbuf = lax.dynamic_update_index_in_dim(xbuf, x_in, wslot, 0)

            # last stage: loss + dL/dy for this just-finished microbatch
            lval, dy0, dlp = last_stage_grad(y, m_f)
            at_last = jnp.logical_and(stage == last, fwd_valid)
            # the COTANGENT already carries 1/M; the accumulated VALUE
            # needs it too (objective is the mean over microbatches)
            lacc = lacc + jnp.where(
                at_last, lval.astype(jnp.float32) / M, 0.0
            )
            gloss = jax.tree.map(
                lambda g, d: g + jnp.where(at_last, d, jnp.zeros_like(d)),
                gloss, dlp,
            )

            # ---------- backward half: microbatch m_b = t - 2(P-1) + stage
            m_b = t - 2 * (P_ - 1) + stage
            bwd_valid = jnp.logical_and(m_b >= 0, m_b < M)
            rslot = jnp.where(bwd_valid, jnp.mod(m_b, R), R)
            x_saved = xbuf[rslot]
            dy = jnp.where(stage == last, dy0, bwd_in)
            (_, _), pull = jax.vjp(fwd_with_aux, local, x_saved)
            dlocal, dx = pull((dy, aux_ct))
            gstage = jax.tree.map(
                lambda g, d: g + jnp.where(bwd_valid, d, jnp.zeros_like(d)),
                gstage, dlocal,
            )
            # stage 0's dx is the microbatch-input cotangent
            write_dm = jnp.logical_and(stage == 0, bwd_valid)
            dmicro = lax.dynamic_update_index_in_dim(
                dmicro,
                jnp.where(write_dm, dx, dmicro[jnp.clip(m_b, 0, M - 1)]),
                jnp.clip(m_b, 0, M - 1), 0,
            )

            # ---------- ripples: activations forward, cotangents backward
            fwd_in = lax.ppermute(
                y, axis, [(i, (i + 1) % P_) for i in range(P_)]
            )
            bwd_in = lax.ppermute(
                dx, axis, [(i, (i - 1) % P_) for i in range(P_)]
            )
            return fwd_in, bwd_in, xbuf, gstage, gloss, dmicro, lacc, aacc

        _, _, _, gstage, gloss, dmicro, lacc, aacc = lax.fori_loop(
            0, ticks, tick, carry0
        )

        # stage grads live per-stage (out_specs stitches the stage axis
        # back); loss grads / dmicro / loss exist only on their producing
        # stages — mask happened via validity, broadcast via psum.
        gstage = jax.tree.map(lambda g: g[None], gstage)
        gloss = jax.tree.map(lambda g: lax.psum(g, axis), gloss)
        dmicro = lax.psum(
            jnp.where(stage == 0, dmicro, jnp.zeros_like(dmicro)), axis
        )
        loss = lax.psum(
            jnp.where(stage == n_stages - 1, lacc, 0.0), axis
        )
        # aux objective VALUE (its gradient already flowed via the vjp
        # cotangent): every stage accumulated its own aux over microbatches
        loss = loss + (aux_weight / M) * lax.psum(aacc, axis)
        return loss, gstage, gloss, dmicro

    def call(stage_params, loss_params, micro_x, micro_tgt):
        sp = jax.tree.map(lambda _: P(axis), stage_params)
        rep = jax.tree.map(lambda _: P(), loss_params)
        return shard_map(
            run_sharded,
            mesh=mesh,
            in_specs=(sp, rep, P(), P()),
            out_specs=(P(), sp, rep, P()),
            check_rep=False,
        )(stage_params, loss_params, micro_x, micro_tgt)

    return call
