"""Tape staging: compile whole forward/backward tapes to single XLA programs.

The reference replays its tape node-by-node with dynamic dispatch
(`Var::forward`, neuronika-variable/src/var.rs:110-128; `VarDiff::backward`,
vardiff.rs:125-141). On TPU that would mean one tiny kernel launch per node.
Instead we stage the *entire* tape into one pure function and `jax.jit` it, so
XLA fuses elementwise chains into matmuls and schedules the whole step as one
program. The reference's buffer-reuse trick (var.rs:114-119) becomes a trace
cache keyed on the tape's structural signature + leaf shapes, so dynamically
rebuilt graphs (the define-by-run contract) only pay compilation once per
distinct structure.

Gradient semantics reproduced from the reference:
* `backward(seed)` fills the root gradient with ``seed`` (vardiff.rs:133) and
  replays VJPs in reverse topological order, `+=`-accumulating into every
  differentiable node's gradient cell (vardiff.rs:136-140, utils.rs:152-192).
* gradients accumulate across `backward` calls until `zero_grad`.
* backward after `no_grad()` raises (gradient.rs:26-36 panics likewise).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import config
from .node import DEAD_GRADIENT_MSG, FORWARD_NOT_CALLED_MSG, Node


class LRUCache(OrderedDict):
    """Bounded trace cache: long-lived define-by-run sessions that keep
    producing *new graph structures* must not grow compiled-program caches
    monotonically. Evicts least-recently-used entries past `maxsize`
    (dropping a jitted function also releases its XLA executable)."""

    def __init__(self, maxsize: int) -> None:
        super().__init__()
        self.maxsize = int(maxsize)

    def get(self, key, default=None):
        try:
            self.move_to_end(key)
        except KeyError:
            return default
        return super().__getitem__(key)

    def __setitem__(self, key, value) -> None:
        super().__setitem__(key, value)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)


_FWD_CACHE: "LRUCache" = LRUCache(256)
_BWD_CACHE: "LRUCache" = LRUCache(256)

try:  # native tape walker (csrc/tape_walker.cpp); Python path is the oracle
    from . import _native_tape  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - extension not built
    _native_tape = None


def _plan_and_sign(root: "Node"):
    """(tape, leaves, signature) — one native pass when the extension is
    built, else the Python walk + signature."""
    if _native_tape is not None:
        tape, leaves, sig = _native_tape.plan_and_sign(root)
        return tuple(tape), leaves, sig
    tape, leaves = _plan(root)
    return tape, leaves, _signature(tape, leaves)


def cache_stats() -> Tuple[int, int]:
    return len(_FWD_CACHE), len(_BWD_CACHE)


def clear_cache() -> None:
    _FWD_CACHE.clear()
    _BWD_CACHE.clear()


# --------------------------------------------------------------------------
# tape extraction


def _plan(root: Node):
    """Return (tape, leaves) for the graph rooted at `root`: op nodes in
    topological order (ids are monotone and parents precede children, so
    sorting by id is a topo order — the same invariant the reference's
    `History` BTreeMap exploits, history.rs:9-125) and leaf nodes in
    first-use order. Identity-dedup falls out of the ancestor walk, exactly
    like the reference's merge-by-node-pointer."""
    ops: dict[int, Node] = {}
    stack = [root]
    seen = {root.id}
    while stack:
        n = stack.pop()
        if not n.is_leaf():
            ops[n.id] = n
        for p in n.parents:
            if p.id not in seen:
                seen.add(p.id)
                stack.append(p)
    tape = tuple(ops[i] for i in sorted(ops))
    leaves: List[Node] = []
    lseen = set()
    for n in tape:
        for p in n.parents:
            if p.is_leaf() and p.id not in lseen:
                lseen.add(p.id)
                leaves.append(p)
    return tape, leaves


def _signature(tape: Sequence[Node], leaves: Sequence[Node]) -> Tuple:
    """Structural key: two tapes with equal signatures compute the same
    function of their leaves, so the compiled program can be reused."""
    pos = {n.id: ("L", i) for i, n in enumerate(leaves)}
    entries = []
    for i, n in enumerate(tape):
        pos[n.id] = ("N", i)
        status = None if n.status is None else bool(n.status.value)
        entries.append(
            (
                n.op,
                n.extra,
                tuple(pos[p.id] for p in n.parents),
                n.differentiable,
                n.grad_alive,
                n.rng,
                status,
            )
        )
    leaf_sig = tuple((n.shape, str(n.dtype), n.differentiable) for n in leaves)
    return (tuple(entries), leaf_sig)


# --------------------------------------------------------------------------
# forward


def _build_forward(tape: Sequence[Node], leaves: Sequence[Node]):
    # Resolve static info (fn, extra, parent slots, train status) now; the
    # returned pure function only touches its array arguments.
    pos = {n.id: i for i, n in enumerate(leaves)}
    steps = []
    n_rng = 0
    for n in tape:
        train = None if n.status is None else bool(n.status.value)
        key_idx = None
        if n.rng:
            key_idx = n_rng
            n_rng += 1
        steps.append((n.fn, n.extra, tuple(pos[p.id] for p in n.parents), key_idx, train))
        pos[n.id] = len(leaves) + len(steps) - 1

    def run(leaf_vals, keys):
        env = list(leaf_vals)
        for fn, extra, parents, key_idx, train in steps:
            args = [env[p] for p in parents]
            if key_idx is not None:
                env.append(fn(extra, *args, key=keys[key_idx], train=train))
            else:
                env.append(fn(extra, *args))
        return env[len(leaf_vals):]

    return jax.jit(run), n_rng


def forward(root: Node) -> None:
    """Compute every node in the graph rooted at `root`, storing results in
    the node cells."""
    tape, leaves, sig = _plan_and_sign(root)
    if not tape:
        return
    entry = _FWD_CACHE.get(sig)
    if entry is None:
        entry = _build_forward(tape, leaves)
        _FWD_CACHE[sig] = entry
    fn, n_rng = entry
    keys = [config.next_key() for _ in range(n_rng)]
    # Record the keys actually consumed so backward can regenerate the same
    # stochastic draws (the reference stores the dropout noise buffer itself,
    # node/dropout/mod.rs:53-128; regenerating from the key is equivalent).
    ki = 0
    for n in tape:
        if n.rng:
            n.value_key = keys[ki]  # type: ignore[attr-defined]
            ki += 1
    leaf_vals = [l.get_value() for l in leaves]
    outs = fn(leaf_vals, keys)
    for n, v in zip(tape, outs):
        n.value = v
        n.computed = True


# --------------------------------------------------------------------------
# backward


def _build_backward(tape: Sequence[Node], leaves: Sequence[Node]):
    """Stage the reverse sweep: (all node values, rng keys, seed) ->
    gradients for every differentiable node (tape + leaves)."""
    slot = {n.id: i for i, n in enumerate(leaves)}
    for j, n in enumerate(tape):
        slot[n.id] = len(leaves) + j

    rng_nodes = [n for n in tape if n.rng]
    key_slot = {n.id: i for i, n in enumerate(rng_nodes)}

    diff_tape = [n for n in tape if n.differentiable]
    diff_leaves = [l for l in leaves if l.differentiable]
    root = tape[-1]

    specs = []
    for n in reversed(tape):
        if not n.differentiable:
            continue
        train = None if n.status is None else bool(n.status.value)
        specs.append(
            (
                n.id,
                n.vjp,
                n.extra,
                tuple((p.id, slot[p.id], p.differentiable) for p in n.parents),
                slot[n.id],
                key_slot.get(n.id),
                train,
            )
        )

    root_shape, root_dtype = root.shape, root.dtype
    # positional indices so the compiled program can be reused by any tape
    # instance with the same structural signature
    diff_tape_idx = [j for j, n in enumerate(tape) if n.differentiable]
    diff_leaf_idx = [i for i, l in enumerate(leaves) if l.differentiable]

    def run(values, keys, seed):
        grads: Dict[int, jax.Array] = {
            root.id: jnp.full(root_shape, seed, root_dtype)
        }
        for nid, vjp, extra, parents, out_slot, kidx, train in specs:
            g = grads.get(nid)
            if g is None:
                continue
            primals = [values[s] for _, s, _ in parents]
            out_val = values[out_slot]
            if kidx is not None:
                pgrads = vjp(extra, primals, out_val, g, key=keys[kidx], train=train)
            else:
                pgrads = vjp(extra, primals, out_val, g)
            for (pid, _, pdiff), pg in zip(parents, pgrads):
                if pg is None or not pdiff:
                    continue
                acc = grads.get(pid)
                grads[pid] = pg if acc is None else acc + pg
        return [
            grads.get(i, jnp.zeros(shape, dtype))
            for i, shape, dtype in [
                (n.id, n.shape, n.dtype) for n in diff_tape + diff_leaves
            ]
        ]

    return jax.jit(run), (diff_tape_idx, diff_leaf_idx)


def backward(root: Node, seed: float) -> None:
    tape, leaves, sig = _plan_and_sign(root)
    if not tape:
        # Backward on a differentiable leaf: the root gradient is FILLED
        # with the seed, not accumulated (vardiff.rs:133 grad_mut().fill).
        if root.differentiable:
            if not root.grad_alive:
                raise RuntimeError(DEAD_GRADIENT_MSG)
            root.grad = jnp.full(root.shape, seed, root.dtype)
        return
    for n in tape:
        if not n.computed:
            raise RuntimeError(FORWARD_NOT_CALLED_MSG)
        if n.differentiable and not n.grad_alive:
            raise RuntimeError(DEAD_GRADIENT_MSG)
    for l in leaves:
        if l.differentiable and not l.grad_alive:
            raise RuntimeError(DEAD_GRADIENT_MSG)

    entry = _BWD_CACHE.get(sig)
    if entry is None:
        entry = _build_backward(tape, leaves)
        _BWD_CACHE[sig] = entry
    fn, (diff_tape_idx, diff_leaf_idx) = entry

    values = [l.get_value() for l in leaves] + [n.get_value() for n in tape]
    keys = [n.value_key for n in tape if n.rng]
    seed_arr = jnp.asarray(seed, dtype=root.dtype)
    grads = fn(values, keys, seed_arr)

    targets = [tape[j] for j in diff_tape_idx] + [leaves[i] for i in diff_leaf_idx]
    for node, g in zip(targets, grads):
        if node is root:
            # the root gradient is seeded by FILL, not accumulation
            # (vardiff.rs:133)
            node.grad = g
        else:
            node.accumulate_grad(g)


# --------------------------------------------------------------------------
# fused train step: forward + backward + optimizer update in ONE program
#
# The perf mode for static training loops: interior node values and
# gradients never touch HBM (XLA dead-code-eliminates everything but the
# loss and the parameter updates). Semantics intentionally condensed vs the
# step-by-step path: gradients do not accumulate across calls (each fused
# step is forward → zero fresh grads → update, i.e. the quickstart pattern
# with zero_grad after every step), and interior `.data()`/.grad()` cells
# are not populated.


def _build_fused(tape, leaves, param_pos, optimizer, donate=False):
    slotted = list(leaves) + list(tape)
    slot = {n.id: i for i, n in enumerate(slotted)}
    rng_nodes = [n for n in tape if n.rng]
    key_slot = {n.id: i for i, n in enumerate(rng_nodes)}
    root = tape[-1]

    fwd_steps = []
    for n in tape:
        train = None if n.status is None else bool(n.status.value)
        fwd_steps.append(
            (n.fn, n.extra, tuple(slot[p.id] for p in n.parents),
             key_slot.get(n.id), train)
        )

    bwd_specs = []
    for n in reversed(tape):
        if not n.differentiable:
            continue
        train = None if n.status is None else bool(n.status.value)
        bwd_specs.append(
            (n.id, n.vjp, n.extra,
             tuple((p.id, slot[p.id], p.differentiable) for p in n.parents),
             slot[n.id], key_slot.get(n.id), train)
        )

    penalty = optimizer.penalty
    update = optimizer._update
    n_leaves = len(leaves)
    param_ids = [leaves[i].id for i in param_pos]
    param_set = set(param_pos)
    nonparam_pos = [i for i in range(n_leaves) if i not in param_set]
    root_shape, root_dtype = root.shape, root.dtype

    def run(nonparam_vals, param_vals, keys, seed, states, hyper, step):
        leaf_vals = [None] * n_leaves
        for i, v in zip(nonparam_pos, nonparam_vals):
            leaf_vals[i] = v
        for i, v in zip(param_pos, param_vals):
            leaf_vals[i] = v
        env = list(leaf_vals)
        for fn, extra, parents, kidx, train in fwd_steps:
            args = [env[p] for p in parents]
            if kidx is not None:
                env.append(fn(extra, *args, key=keys[kidx], train=train))
            else:
                env.append(fn(extra, *args))
        loss = env[-1]

        grads: Dict[int, jax.Array] = {
            root.id: jnp.full(root_shape, seed, root_dtype)
        }
        for nid, vjp, extra, parents, out_slot, kidx, train in bwd_specs:
            g = grads.get(nid)
            if g is None:
                continue
            primals = [env[s] for _, s, _ in parents]
            if kidx is not None:
                pgrads = vjp(extra, primals, env[out_slot], g,
                             key=keys[kidx], train=train)
            else:
                pgrads = vjp(extra, primals, env[out_slot], g)
            for (pid, _, pdiff), pg in zip(parents, pgrads):
                if pg is None or not pdiff:
                    continue
                acc = grads.get(pid)
                grads[pid] = pg if acc is None else acc + pg

        new_datas, new_states = [], []
        for pos, pid, state in zip(param_pos, param_ids, states):
            data = leaf_vals[pos]
            g = grads.get(pid)
            if g is None:
                g = jnp.zeros_like(data)
            g = g + penalty.penalize(data)
            # f32 update math + cast-back, same contract as
            # Optimizer._build (bf16 params would otherwise promote)
            nd, ns = update(
                data.astype(jnp.float32), g.astype(jnp.float32),
                jax.tree.map(lambda x: x.astype(jnp.float32), state),
                hyper, step,
            )
            new_datas.append(nd.astype(data.dtype))
            new_states.append(jax.tree.map(
                lambda x, ref: x.astype(ref.dtype), ns, state
            ))
        return loss, new_datas, new_states

    donate_argnums = (1, 4) if donate else ()
    return jax.jit(run, donate_argnums=donate_argnums), (nonparam_pos, param_pos)


def fused_train_step(root: Node, optimizer, seed: float = 1.0,
                     donate: bool = False, block: bool = True):
    """Run one fused (fwd + bwd + update) step on the graph rooted at
    `root`, updating the optimizer's registered parameters in place.
    Returns the loss value.

    `donate=True` donates the parameter and optimizer-state buffers to the
    program (true in-place updates, halves their HBM footprint) — any array
    snapshot of a parameter taken BEFORE the step becomes invalid."""
    tape, leaves, base_sig = _plan_and_sign(root)
    if not tape:
        raise ValueError("fused step requires a non-leaf loss variable")
    leaf_index = {l.id: i for i, l in enumerate(leaves)}
    param_pos = []
    for p in optimizer._params:
        if p.node.id in leaf_index:
            param_pos.append(leaf_index[p.node.id])
        else:
            raise ValueError(
                "all registered parameters must be leaves of the loss graph "
                "for a fused step"
            )

    # Key on the pallas flags too: enable_pallas() clears the module-level
    # trace caches but cannot see per-optimizer caches, so the kernel tier
    # must be part of the signature for the toggle to apply to fused steps.
    sig = (base_sig, tuple(param_pos), donate,
           config.use_pallas, config.pallas_interpret)
    cache = optimizer._fused_cache
    entry = cache.get(sig)
    if entry is None:
        entry = _build_fused(tape, leaves, param_pos, optimizer, donate)
        cache[sig] = entry
    fn, (nonparam_pos, _) = entry

    keys = [config.next_key() for _ in range(sum(1 for n in tape if n.rng))]
    leaf_vals = [l.get_value() for l in leaves]
    nonparam_vals = [leaf_vals[i] for i in nonparam_pos]
    param_vals = [leaf_vals[i] for i in param_pos]
    optimizer._step_count += 1
    hyper = tuple(jnp.asarray(h, jnp.float32) for h in optimizer._hyper())
    step = jnp.asarray(optimizer._step_count, jnp.float32)
    states = optimizer._state
    seed_arr = jnp.asarray(seed, root.dtype)
    loss, new_datas, new_states = fn(
        nonparam_vals, param_vals, keys, seed_arr, states, hyper, step
    )

    for p, d in zip(optimizer._params, new_datas):
        p.node.value = d
        p.node.computed = True
        p.node.grad = None
    optimizer._state = list(new_states)
    root.value = loss
    root.computed = True
    if not block:
        # async dispatch: read the loss later via root.item()/.data()
        return None
    return float(loss)
