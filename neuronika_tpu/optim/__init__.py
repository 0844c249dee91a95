"""Optimizers (reference: neuronika-optim).

Architecture re-design for TPU: the reference loops boxed per-param
`Optimize` objects on the CPU (optimizer.rs:81-86). Here `step()` stages the
update of **all registered parameters into one jitted XLA program** —
hyperparameters (lr, betas, eps, λ) are traced scalars so LR schedulers never
trigger recompiles; structural choices (momentum on/off, nesterov, centered)
are static and part of the compile key.

Update rules match the reference exactly, including its divergences from
PyTorch (e.g. SGD's momentum buffer starts at zeros so the first momentum
step applies `(1-dampening)·g` — sgd/mod.rs:191-231; the penalty is added to
the *stored gradient* in place before the update — adam/mod.rs:146-148).

Exports: `StochasticGD` (alias `SGD`), `Adam`, `AMSGrad` (the reference
declares but forgets to re-export it — lib.rs:3 vs 11-16; exported here),
`Adagrad`, `RMSProp`, penalties `L1`/`L2`/`ElasticNet`, and `lr_scheduler`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..variable import VarDiff
from . import functional, lr_scheduler

__all__ = [
    "Optimizer", "StochasticGD", "SGD", "Adam", "AdamW", "AMSGrad",
    "Adagrad", "RMSProp", "Lion", "Adafactor", "Muon", "L1", "L2",
    "ElasticNet",
    "Penalty", "lr_scheduler", "functional", "clip_grad_norm",
]


def clip_grad_norm(parameters, max_norm: float) -> float:
    """Scale the gradients of `parameters` (VarDiffs) in place so their
    global L2 norm is at most `max_norm`; returns the pre-clip norm.
    Extension — the reference has no clipping; this is the define-by-run
    counterpart of `functional.clip_by_global_norm`."""
    import jax.numpy as _jnp

    params = list(parameters)
    total = sum(
        float(_jnp.sum(_jnp.square(p.grad().astype(_jnp.float32))))
        for p in params
    )
    norm = total ** 0.5
    if norm > max_norm and norm > 0.0:
        scale = max_norm / norm
        for p in params:
            p.node.grad = (p.grad() * scale).astype(p.node.dtype)
    return norm


# --------------------------------------------------------------------------
# penalties (reference: penalty.rs:1-79)


class Penalty:
    """Regularisation penalty added to the gradient: `grad += penalize(w)`."""

    def penalize(self, w):
        raise NotImplementedError


class L2(Penalty):
    """Weight decay: 2λw (penalty.rs:64-66)."""

    def __init__(self, lam: float) -> None:
        self.lam = float(lam)

    def penalize(self, w):
        return 2.0 * self.lam * w


class L1(Penalty):
    """λ·sign(w) (penalty.rs:70-72)."""

    def __init__(self, lam: float) -> None:
        self.lam = float(lam)

    def penalize(self, w):
        return self.lam * jnp.sign(w)


class ElasticNet(Penalty):
    """λ₁·sign(w) + 2λ₂w (penalty.rs:76-78)."""

    def __init__(self, lambda_l1: float, lambda_l2: float) -> None:
        self.lambda_l1 = float(lambda_l1)
        self.lambda_l2 = float(lambda_l2)

    def penalize(self, w):
        return self.lambda_l1 * jnp.sign(w) + 2.0 * self.lambda_l2 * w


class _NoPenalty(Penalty):
    def penalize(self, w):
        return 0.0


# --------------------------------------------------------------------------
# base optimizer (reference: optimizer.rs:33-94)


class Optimizer:
    """Holds registered parameters and stages their update as one XLA
    program. Subclasses define `_hyper()` (traced scalars), `_static_key()`
    (structure-affecting statics), `_init_state(param)`, and
    `_update(data, grad, state, hyper, step)` returning
    (new_data, new_state). The penalized gradient is written back to the
    parameter's gradient cell, matching the reference's in-place
    penalisation."""

    def __init__(self, lr: float, penalty: Optional[Penalty] = None) -> None:
        self._lr = float(lr)
        self.penalty = penalty if penalty is not None else _NoPenalty()
        self._params: List[VarDiff] = []
        self._state: List[Dict[str, jax.Array]] = []
        self._step_count = 0
        self._compiled = None
        from .._engine.executor import LRUCache

        self._fused_cache: Dict = LRUCache(32)

    # -------------------------------------------------------------- lr api
    def get_lr(self) -> float:
        return self._lr

    def set_lr(self, lr: float) -> None:
        if lr < 0.0:
            raise ValueError("the learning rate must be positive")
        self._lr = float(lr)

    @property
    def status(self):
        return self

    # ---------------------------------------------------------- registering
    def register(self, variable: VarDiff) -> None:
        """Register a differentiable variable as a parameter
        (optimizer.rs:70-77). The optimizer shares the variable's data/grad
        cells, like the reference's shallow `VarDiff` clone."""
        if not isinstance(variable, VarDiff):
            raise TypeError("only differentiable variables can be registered")
        self._params.append(variable)
        self._state.append(self._init_state(variable))
        self._compiled = None

    def register_all(self, variables) -> None:
        for v in variables:
            self.register(v)

    # -------------------------------------------------------------- stepping
    def step(self) -> None:
        """Apply one update to every registered parameter (optimizer.rs:81-86)."""
        if not self._params:
            return
        if self._compiled is None:
            self._compiled = self._build()
        datas = [p.node.get_value() for p in self._params]
        grads = [p.node.get_grad() for p in self._params]
        self._step_count += 1
        hyper = tuple(
            jnp.asarray(h, jnp.float32) for h in self._hyper()
        )
        step = jnp.asarray(self._step_count, jnp.float32)
        new_datas, new_grads, new_state = self._compiled(
            datas, grads, self._state, hyper, step
        )
        for p, d, g in zip(self._params, new_datas, new_grads):
            p.node.value = d
            p.node.computed = True
            p.node.grad = g
        self._state = new_state

    def zero_grad(self) -> None:
        for p in self._params:
            p.node.zero_grad()

    def train_step(self, loss, seed: float = 1.0, donate: bool = False,
                   block: bool = True):
        """Fused step: stage forward + backward + this optimizer's update
        into ONE XLA program (trace-cached on the loss graph's structure).
        Equivalent to `loss.forward(); loss.backward(seed); self.step();
        self.zero_grad()` but interior values/gradients never touch HBM —
        the TPU-first fast path for static training loops. Returns the
        loss value.
        With ``donate=True`` the parameter/optimizer-state buffers are
        donated to the program (in-place update; prior snapshots of the
        raw arrays become invalid). With ``block=False`` the call returns
        None without waiting for the device — read `loss.item()` later
        (keeps a training loop fully pipelined on remote devices).
        """
        from .._engine import executor

        return executor.fused_train_step(loss.node, self, seed, donate, block)

    def _build(self):
        penalty = self.penalty
        update = self._update

        def run(datas, grads, states, hyper, step):
            # update math runs in f32 regardless of param/state dtype
            # (bf16 params: without the round-trip the f32 hypers would
            # silently promote the parameter to f32 on the first step,
            # and moment products would lose mantissa in bf16 — the same
            # contract optim.functional's rules enforce); state is upcast
            # on read and rounded back to its storage dtype on write.
            out_d, out_g, out_s = [], [], []
            for d, g, s in zip(datas, grads, states):
                g = g + penalty.penalize(d)
                nd, ns = update(
                    d.astype(jnp.float32), g.astype(jnp.float32),
                    jax.tree.map(lambda x: x.astype(jnp.float32), s),
                    hyper, step,
                )
                out_d.append(nd.astype(d.dtype))
                out_g.append(g)
                out_s.append(jax.tree.map(
                    lambda x, ref: x.astype(ref.dtype), ns, s
                ))
            return out_d, out_g, out_s

        return jax.jit(run)

    # ------------------------------------------------------------ subclass
    def _hyper(self) -> Tuple[float, ...]:
        raise NotImplementedError

    def _init_state(self, variable: VarDiff) -> Dict[str, jax.Array]:
        raise NotImplementedError

    def _update(self, data, grad, state, hyper, step):
        raise NotImplementedError


# --------------------------------------------------------------------------
# SGD (reference: sgd/mod.rs:11-236)


class StochasticGD(Optimizer):
    """SGD with optional momentum / dampening / nesterov."""

    def __init__(self, lr, penalty=None, momentum=None, dampening=None,
                 nesterov: bool = False) -> None:
        super().__init__(lr, penalty)
        self.momentum = None if momentum in (None, 0.0) else float(momentum)
        self.dampening = 0.0 if dampening is None else float(dampening)
        self.nesterov = bool(nesterov)
        if self.nesterov and self.momentum is None:
            raise ValueError("nesterov momentum requires a momentum")

    def get_momentum(self):
        return self.momentum

    def get_dampening(self):
        return self.dampening

    def get_nesterov(self):
        return self.nesterov

    def _hyper(self):
        return (self._lr, self.momentum or 0.0, self.dampening)

    def _init_state(self, variable):
        if self.momentum is None:
            return {}
        return {"buffer": jnp.zeros(variable.shape, variable.dtype)}

    def _update(self, data, grad, state, hyper, step):
        lr, momentum, dampening = hyper
        if self.momentum is None:
            return data - grad * lr, state
        buf = state["buffer"] * momentum + grad * (1.0 - dampening)
        if self.nesterov:
            new = data - (grad + buf * momentum) * lr
        else:
            new = data - buf * lr
        return new, {"buffer": buf}


SGD = StochasticGD


# --------------------------------------------------------------------------
# Adam / AMSGrad (reference: adam/mod.rs:13-198, amsgrad/mod.rs)


class Adam(Optimizer):
    def __init__(self, lr, beta1: float = 0.9, beta2: float = 0.999,
                 penalty=None, eps: float = 1e-8,
                 state_dtype=None) -> None:
        """`state_dtype=jnp.bfloat16` halves m/v HBM traffic per step;
        the update math stays in f32 (matches optim.functional.adam_*)."""
        super().__init__(lr, penalty)
        self.beta1, self.beta2, self.eps = float(beta1), float(beta2), float(eps)
        self.state_dtype = state_dtype

    def _hyper(self):
        return (self._lr, self.beta1, self.beta2, self.eps)

    def _init_state(self, variable):
        # distinct buffers: donation forbids aliased arguments
        def z():
            return jnp.zeros(variable.shape, self.state_dtype or variable.dtype)

        return {"exp_avg": z(), "exp_avg_sq": z()}

    def _update(self, data, grad, state, hyper, step):
        lr, b1, b2, eps = hyper
        bc1 = 1.0 - b1**step
        bc2 = 1.0 - b2**step
        m0 = state["exp_avg"].astype(grad.dtype)
        v0 = state["exp_avg_sq"].astype(grad.dtype)
        m = m0 * b1 + grad * (1.0 - b1)
        v = v0 * b2 + grad * grad * (1.0 - b2)
        new = data - m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps) * (lr / bc1)
        sd = state["exp_avg"].dtype
        return new, {"exp_avg": m.astype(sd), "exp_avg_sq": v.astype(sd)}


class AMSGrad(Adam):
    """Adam with a running max of the second-moment estimate
    (amsgrad/mod.rs; unexported in the reference snapshot — a bug we fix)."""

    def _init_state(self, variable):
        def z():
            return jnp.zeros(variable.shape, variable.dtype)

        return {"exp_avg": z(), "exp_avg_sq": z(), "max_exp_avg_sq": z()}

    def _update(self, data, grad, state, hyper, step):
        lr, b1, b2, eps = hyper
        bc1 = 1.0 - b1**step
        bc2 = 1.0 - b2**step
        m = state["exp_avg"] * b1 + grad * (1.0 - b1)
        v = state["exp_avg_sq"] * b2 + grad * grad * (1.0 - b2)
        vmax = jnp.maximum(state["max_exp_avg_sq"], v)
        new = data - m / (jnp.sqrt(vmax) / jnp.sqrt(bc2) + eps) * (lr / bc1)
        return new, {"exp_avg": m, "exp_avg_sq": v, "max_exp_avg_sq": vmax}


class AdamW(Adam):
    """Adam with DECOUPLED weight decay (Loshchilov & Hutter 2019): the
    decay multiplies the parameter directly rather than flowing through
    the moments. Extension beyond the reference (whose Adam offers only
    coupled L2 via `Penalty`); matches optim.functional.adamw_*."""

    def __init__(self, lr, beta1: float = 0.9, beta2: float = 0.999,
                 weight_decay: float = 0.01, penalty=None,
                 eps: float = 1e-8, state_dtype=None) -> None:
        super().__init__(lr, beta1, beta2, penalty, eps, state_dtype)
        self.weight_decay = float(weight_decay)

    def _hyper(self):
        return (self._lr, self.beta1, self.beta2, self.eps,
                self.weight_decay)

    def _update(self, data, grad, state, hyper, step):
        lr, b1, b2, eps, wd = hyper
        bc1 = 1.0 - b1**step
        bc2 = 1.0 - b2**step
        m0 = state["exp_avg"].astype(grad.dtype)
        v0 = state["exp_avg_sq"].astype(grad.dtype)
        m = m0 * b1 + grad * (1.0 - b1)
        v = v0 * b2 + grad * grad * (1.0 - b2)
        new = (data
               - m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps) * (lr / bc1)
               - data * (lr * wd))
        sd = state["exp_avg"].dtype
        return new, {"exp_avg": m.astype(sd), "exp_avg_sq": v.astype(sd)}


class Lion(Optimizer):
    """Sign-momentum optimizer (Chen et al. 2023). One state buffer per
    parameter — half Adam's optimizer HBM — and a sign update with no
    sqrt/divide on the VPU. Matches optim.functional.lion_*."""

    def __init__(self, lr, beta1: float = 0.9, beta2: float = 0.99,
                 weight_decay: float = 0.0, penalty=None,
                 state_dtype=None) -> None:
        super().__init__(lr, penalty)
        self.beta1, self.beta2 = float(beta1), float(beta2)
        self.weight_decay = float(weight_decay)
        self.state_dtype = state_dtype

    def _hyper(self):
        return (self._lr, self.beta1, self.beta2, self.weight_decay)

    def _init_state(self, variable):
        return {"exp_avg": jnp.zeros(
            variable.shape, self.state_dtype or variable.dtype)}

    def _update(self, data, grad, state, hyper, step):
        lr, b1, b2, wd = hyper
        m0 = state["exp_avg"].astype(grad.dtype)
        u = jnp.sign(m0 * b1 + grad * (1.0 - b1))
        new = data - u * lr - data * (lr * wd)
        m = m0 * b2 + grad * (1.0 - b2)
        return new, {"exp_avg": m.astype(state["exp_avg"].dtype)}


class Adafactor(Optimizer):
    """Factored second moments (Shazeer & Stern 2018): matrices store a
    row + a column accumulator instead of a full second-moment tensor —
    O(n+m) optimizer memory, the classic memory-lean choice for large
    TPU models. Matches optim.functional.adafactor_*."""

    def __init__(self, lr, clip_threshold: float = 1.0,
                 decay_rate_power: float = 0.8, weight_decay: float = 0.0,
                 penalty=None, eps: float = 1e-30) -> None:
        super().__init__(lr, penalty)
        self.clip_threshold = float(clip_threshold)
        self.decay_rate_power = float(decay_rate_power)
        self.weight_decay = float(weight_decay)
        self.eps = float(eps)

    def _hyper(self):
        return (self._lr, self.clip_threshold, self.weight_decay, self.eps)

    def _init_state(self, variable):
        if len(variable.shape) >= 2:
            return {
                "vr": jnp.zeros(variable.shape[:-1], jnp.float32),
                "vc": jnp.zeros(
                    (*variable.shape[:-2], variable.shape[-1]), jnp.float32),
            }
        return {"v": jnp.zeros(variable.shape, jnp.float32)}

    def _update(self, data, grad, state, hyper, step):
        lr, clip, wd, eps = hyper
        b2t = 1.0 - step ** (-self.decay_rate_power)
        g32 = grad.astype(jnp.float32)
        sq = g32 * g32 + eps
        if data.ndim >= 2:
            vr = state["vr"] * b2t + sq.mean(axis=-1) * (1.0 - b2t)
            vc = state["vc"] * b2t + sq.mean(axis=-2) * (1.0 - b2t)
            denom = vr.mean(axis=-1, keepdims=True)
            vhat = (vr / denom)[..., None] * vc[..., None, :]
            ns = {"vr": vr, "vc": vc}
        else:
            vhat = state["v"] * b2t + sq * (1.0 - b2t)
            ns = {"v": vhat}
        u = g32 * jax.lax.rsqrt(vhat + eps)
        rms = jnp.sqrt(jnp.mean(u * u) + 1e-30)
        u = u / jnp.maximum(1.0, rms / clip)
        new = data - (u * lr).astype(data.dtype) - data * (lr * wd)
        return new, ns


class Muon(Optimizer):
    """Orthogonalised-momentum optimizer (Jordan et al. 2024): matrix
    parameters step by the quintic Newton-Schulz orthogonalisation of
    their momentum — five MATMUL-only iterations, i.e. the whole inner
    loop lives on the MXU. Non-matrix parameters fall back to momentum
    SGD. Matches optim.functional.muon_*."""

    def __init__(self, lr, momentum: float = 0.95, nesterov: bool = True,
                 ns_steps: int = 5, penalty=None) -> None:
        super().__init__(lr, penalty)
        self.momentum = float(momentum)
        self.nesterov = bool(nesterov)
        self.ns_steps = int(ns_steps)

    def _hyper(self):
        return (self._lr, self.momentum)

    def _init_state(self, variable):
        return {"buffer": jnp.zeros(variable.shape, jnp.float32)}

    def _update(self, data, grad, state, hyper, step):
        from .functional import _newton_schulz5

        lr, mom = hyper
        m = state["buffer"] * mom + grad
        d = m * mom + grad if self.nesterov else m
        if data.ndim >= 2:
            o = _newton_schulz5(d, self.ns_steps)
            scale = jnp.sqrt(
                jnp.maximum(1.0, data.shape[-2] / data.shape[-1]))
            new = data - o * (lr * scale)
        else:
            new = data - d * lr
        return new, {"buffer": m}


# --------------------------------------------------------------------------
# Adagrad (reference: adagrad/mod.rs:95-169)


class Adagrad(Optimizer):
    def __init__(self, lr, lr_decay: float = 0.0, penalty=None,
                 eps: float = 1e-10) -> None:
        super().__init__(lr, penalty)
        self.lr_decay, self.eps = float(lr_decay), float(eps)

    def _hyper(self):
        return (self._lr, self.lr_decay, self.eps)

    def _init_state(self, variable):
        return {"grad_sq": jnp.zeros(variable.shape, variable.dtype)}

    def _update(self, data, grad, state, hyper, step):
        lr, lr_decay, eps = hyper
        clr = lr / (1.0 + (step - 1.0) * lr_decay)
        gs = state["grad_sq"] + grad * grad
        new = data - grad / (jnp.sqrt(gs) + eps) * clr
        return new, {"grad_sq": gs}


# --------------------------------------------------------------------------
# RMSProp (reference: rmsprop/mod.rs:22-305 — 4 code paths)


class RMSProp(Optimizer):
    def __init__(self, lr, penalty=None, alpha=None, momentum=None,
                 centered: bool = False, eps: float = 1e-8) -> None:
        super().__init__(lr, penalty)
        self.alpha = 0.0 if alpha is None else float(alpha)
        self.momentum = None if momentum in (None, 0.0) else float(momentum)
        self.centered = bool(centered)
        self.eps = float(eps)

    def _hyper(self):
        return (self._lr, self.alpha, self.momentum or 0.0, self.eps)

    def _init_state(self, variable):
        def z():
            return jnp.zeros(variable.shape, variable.dtype)

        s = {"square_avg": z()}
        if self.centered:
            s["grad_avg"] = z()
        if self.momentum is not None:
            s["buffer"] = z()
        return s

    def _update(self, data, grad, state, hyper, step):
        lr, alpha, momentum, eps = hyper
        sq = state["square_avg"] * alpha + grad * grad * (1.0 - alpha)
        new_state = {"square_avg": sq}
        if self.centered:
            ga = state["grad_avg"] * alpha + grad * (1.0 - alpha)
            new_state["grad_avg"] = ga
            denom = jnp.sqrt(sq - ga * ga) + eps
        else:
            denom = jnp.sqrt(sq) + eps
        if self.momentum is not None:
            buf = state["buffer"] * momentum + grad / denom
            new_state["buffer"] = buf
            new = data - buf * lr
        else:
            new = data - grad / denom * lr
        return new, new_state
