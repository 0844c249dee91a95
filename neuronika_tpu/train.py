"""High-level training loop for the functional transformer tier.

`Trainer` assembles the pieces every production run re-implements by
hand — the fused train step (`models.transformer.make_train_step`, or
the pjit-sharded variant on a mesh), a warmup-cosine LR schedule,
gradient clipping/accumulation, JSONL metrics (`utils.MetricsLogger`),
orbax checkpointing with retention + resume (`utils.checkpoint`), and
periodic held-out evaluation (`make_eval_step`) — behind one object:

    trainer = Trainer(cfg, key=jax.random.key(0), lr=3e-4,
                      warmup_steps=100, total_steps=5000,
                      checkpoint_dir="runs/gpt", log_path="runs/gpt.jsonl")
    trainer.fit(batches, steps=5000)          # batches yields (tok, tgt)

`Trainer.resume()` restores params/opt-state/step from the latest
checkpoint so a killed run continues exactly where it stopped. The LR
is a per-step device scalar argument, so the schedule never recompiles
the step.

The reference has no trainer (users write the epoch loop by hand —
examples/quickstart.rs:212-227); this is the extension tier equivalent
of that loop, kept deliberately thin: the step function is the same
jitted program a hand-rolled loop would build, and everything here is
host-side orchestration.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import transformer as T

__all__ = ["Trainer", "warmup_cosine"]


def warmup_cosine(base_lr: float, warmup_steps: int = 0,
                  total_steps: Optional[int] = None,
                  min_lr: float = 0.0) -> Callable[[int], float]:
    """step -> lr: linear warmup to `base_lr` over `warmup_steps`, then
    cosine decay to `min_lr` at `total_steps` (constant after warmup if
    `total_steps` is None)."""

    def lr(step: int) -> float:
        if warmup_steps and step < warmup_steps:
            return base_lr * (step + 1) / warmup_steps
        if total_steps is None:
            return base_lr
        t = min(max(step - warmup_steps, 0), total_steps - warmup_steps)
        frac = t / max(total_steps - warmup_steps, 1)
        return min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + math.cos(math.pi * frac))

    return lr


class Trainer:
    """Orchestrates fused train steps with scheduling, logging,
    checkpointing and eval. See the module docstring for the shape of a
    run; every collaborator is also usable on its own."""

    def __init__(self, cfg: T.GPTConfig, *, key, params: Any = None,
                 lr: float = 3e-4, warmup_steps: int = 0,
                 total_steps: Optional[int] = None, min_lr: float = 0.0,
                 grad_clip: float = 0.0, accum_steps: int = 1,
                 mesh=None, fsdp: bool = False,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_every: int = 1000, keep: int = 3,
                 log_path: Optional[str] = None, print_every: int = 0,
                 eval_every: int = 0,
                 eval_batches: Optional[Callable[[], Iterable]] = None,
                 pad_id: Optional[int] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.params = (T.init_params(key, cfg) if params is None
                       else params)
        if mesh is not None:
            sh = (T.fsdp_param_shardings(mesh, cfg) if fsdp
                  else T.param_shardings(mesh, cfg))
            self.params = jax.device_put(self.params, sh)
        # opt_init over (possibly sharded) params: the moment buffers
        # follow the param shardings; the sharded step's stated
        # in_shardings take over from the first call either way
        self.opt_state = T.opt_init(self.params, cfg)
        if mesh is None:
            self._step = T.make_train_step(cfg, grad_clip=grad_clip,
                                           accum_steps=accum_steps)
        else:
            self._step = T.make_sharded_train_step(mesh, cfg, fsdp=fsdp)
        self.lr_fn = warmup_cosine(lr, warmup_steps, total_steps, min_lr)
        self.step_num = 0
        self._key = key
        self.grad_clip = grad_clip
        self._ckpt = None
        self.checkpoint_every = checkpoint_every
        if checkpoint_dir is not None:
            from .utils.checkpoint import Checkpointer

            self._ckpt = Checkpointer(checkpoint_dir, keep=keep)
        self._metrics_kw = dict(path=log_path, print_every=print_every)
        self.eval_every = eval_every
        self.eval_batches = eval_batches
        self.pad_id = pad_id
        self.last_eval: Optional[dict] = None

    # ---------------------------------------------------------------- core
    def train_step(self, tokens, targets) -> float:
        """One fused step at the current schedule position; returns the
        loss as a device scalar (fetch with float() to sync)."""
        self._key, k = jax.random.split(self._key)
        lr = jnp.float32(self.lr_fn(self.step_num))
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, jnp.asarray(tokens),
            jnp.asarray(targets), lr, k)
        self.step_num += 1
        return loss

    def fit(self, batches: Iterable[Tuple[np.ndarray, np.ndarray]],
            steps: Optional[int] = None) -> dict:
        """Drive `batches` (an iterable/iterator of (tokens, targets))
        for `steps` steps (or until exhausted), logging, checkpointing
        and evaluating on schedule. Returns the metrics summary."""
        from .utils.metrics import MetricsLogger

        it: Iterator = iter(batches)
        B_S = None
        m = None
        try:
            while steps is None or self.step_num < steps:
                try:
                    tokens, targets = next(it)
                except StopIteration:
                    break
                if m is None:
                    B_S = int(np.asarray(tokens).shape[0]
                              * np.asarray(tokens).shape[1])
                    m = MetricsLogger(tokens_per_step=B_S,
                                      flops_per_step=T.flops_per_token(
                                          self.cfg,
                                          np.asarray(tokens).shape[1]) * B_S,
                                      **self._metrics_kw)
                loss = self.train_step(tokens, targets)
                rec = {"loss": loss, "lr": self.lr_fn(self.step_num - 1)}
                if self.eval_every and self.eval_batches is not None and (
                        self.step_num % self.eval_every == 0):
                    self.last_eval = self.evaluate(self.eval_batches())
                    rec["eval_loss"] = self.last_eval["loss"]
                m.log(self.step_num, **rec)
                if self._ckpt is not None and (
                        self.step_num % self.checkpoint_every == 0):
                    self.save()
            if self._ckpt is not None and (
                    self._ckpt.latest_step() != self.step_num):
                self.save(force=True)   # final snapshot (unless the
                # periodic save already covered this exact step)
            return m.summary() if m is not None else {}
        finally:
            if self._ckpt is not None:
                self._ckpt.wait()
            if m is not None:
                m.close()

    def evaluate(self, batches: Iterable) -> dict:
        """Exact dataset loss/perplexity over `batches` (one cached
        jitted eval step; `T.evaluate` would rebuild it per call)."""
        if not hasattr(self, "_eval_step_fn"):
            self._eval_step_fn = T.make_eval_step(self.cfg,
                                                  pad_id=self.pad_id)
        total = count = 0.0
        for tokens, targets in batches:
            s, n = self._eval_step_fn(self.params, jnp.asarray(tokens),
                                      jnp.asarray(targets))
            total += float(s)
            count += float(n)
        if count == 0:
            raise ValueError("evaluate() received no tokens")
        loss = total / count
        return {"loss": loss,
                "perplexity": math.exp(min(loss, 700.0)),
                "tokens": int(count)}

    # ------------------------------------------------------------ ckpt api
    def _state(self) -> dict:
        return {"params": self.params, "opt_state": self.opt_state,
                "step": jnp.int32(self.step_num),
                "key": jax.random.key_data(self._key)}

    def save(self, force: bool = False) -> None:
        if self._ckpt is None:
            raise ValueError("Trainer was built without checkpoint_dir")
        self._ckpt.save(self.step_num, self._state(), force=force)

    def resume(self, step: Optional[int] = None) -> int:
        """Restore params/opt-state/step/PRNG from the latest (or a
        specific) checkpoint; returns the restored step number."""
        if self._ckpt is None:
            raise ValueError("Trainer was built without checkpoint_dir")
        state = self._ckpt.restore(step, like=jax.tree.map(
            lambda x: x, self._state()))
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step_num = int(state["step"])
        self._key = jax.random.wrap_key_data(state["key"])
        return self.step_num
