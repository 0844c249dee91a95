"""Compiled-HLO regression guards for the sharded train step (VERDICT r2
#5): the tp "one all-reduce per sub-layer" property and the sp
embedding-gather fix (commit e5fa29a — all-gather the small (V, D) wte
once instead of GSPMD full-rematerialising the D-sharded gather output)
are asserted against the post-SPMD-partitioning HLO on the virtual 8-CPU
mesh, so a sharding regression fails a test instead of silently slowing
multichip training.

The counts are snapshots of the current partitioner output; FEWER
collectives is an improvement (bounds are upper bounds), more is a
regression. If a JAX upgrade legitimately shifts the partitioning,
re-baseline the bounds here with the probe printed in the assert message.
"""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from neuronika_tpu import parallel
from neuronika_tpu.models import transformer as T

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

_COLL = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\("
)
_AG_SHAPE = re.compile(r"= \w+\[([0-9,]*)\][^ ]* all-gather\(")


def _counts(txt: str) -> Counter:
    return Counter(_COLL.findall(txt))


def _all_gather_numels(txt: str):
    out = []
    for m in _AG_SHAPE.finditer(txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        out.append(n)
    return out


def _cfg(**kw):
    base = dict(vocab_size=64, n_layer=2, n_head=2, d_model=32, d_ff=64,
                max_seq=16, dtype=jnp.float32, flash="off")
    base.update(kw)
    return T.GPTConfig(**base)


def _lower_fwd(cfg, mesh, B, S):
    params = jax.device_put(
        T.init_params(jax.random.key(0), cfg), T.param_shardings(mesh, cfg)
    )
    toks = jax.device_put(
        jnp.zeros((B, S), jnp.int32), NamedSharding(mesh, P("dp", None))
    )
    return (
        jax.jit(lambda p, t: T.loss_fn(p, t, t, cfg, mesh=mesh))
        .lower(params, toks)
        .compile()
        .as_text()
    )


def test_tp_forward_all_reduce_budget():
    """Megatron tp forward: the partial-sum all-reduces are bounded by the
    sub-layer count — 2 per block (attention proj + fc_out) plus the lm
    head, with a 2x partitioner slack. A broken sharding annotation that
    reshards activations mid-block blows straight through this."""
    cfg = _cfg()
    mesh = parallel.make_mesh([("dp", 4), ("tp", 2)])
    c = _counts(_lower_fwd(cfg, mesh, 8, 16))
    budget = 2 * (2 * cfg.n_layer + 1)
    assert c["all-reduce"] <= budget, (c, budget)
    assert c["all-gather"] <= 2, c
    assert c["all-to-all"] == 0, c


def test_sp_embedding_gather_stays_small():
    """Sequence parallelism: the forward's all-gathers are (a) the one
    replicated-wte gather from the e5fa29a fix and (b) the per-sub-layer
    Megatron-sp activation gathers, each at most one local (B/dp, S, D)
    activation. The regressions this guards against: GSPMD falling back
    to vocab-scale (B, S, V) gathers for the D-sharded embedding lookup
    (involuntary full remat), or extra per-sub-layer reshards."""
    cfg = _cfg(vocab_size=512, max_seq=64, seq_parallel=True)
    mesh = parallel.make_mesh([("dp", 4), ("tp", 2)])
    txt = _lower_fwd(cfg, mesh, 16, 64)
    numels = _all_gather_numels(txt)
    act = (16 // 4) * 64 * cfg.d_model          # one local activation
    wte = cfg.vocab_size * cfg.d_model
    assert numels, "sp forward should all-gather the replicated wte"
    assert max(numels) <= max(act, wte), (
        sorted(numels, reverse=True)[:5], act, wte)
    assert len(numels) <= 2 * (2 * cfg.n_layer + 1) + 2, len(numels)


def test_train_step_collective_snapshot():
    """Whole fused train step (fwd + bwd + adam) on dp4 x tp2: collective
    counts stay at the snapshot taken when the sharding layout was tuned.
    More collectives = a resharding crept into the step."""
    cfg = _cfg()
    mesh = parallel.make_mesh([("dp", 4), ("tp", 2)])
    step = T.make_sharded_train_step(mesh, cfg)
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.adam_init(params)
    toks = jnp.zeros((8, 16), jnp.int32)
    txt = (
        jax.jit(
            lambda p, o, t: step(p, o, t, t, jnp.float32(1e-3),
                                 jax.random.key(0))
        )
        .lower(params, opt, toks)
        .compile()
        .as_text()
    )
    c = _counts(txt)
    assert c["all-reduce"] <= 24, c
    assert c["all-gather"] <= 24, c
    assert c["all-to-all"] == 0, c


def test_fsdp_step_reduce_scatters():
    """ZeRO-3 (fsdp=True): the compiled train step must carry
    reduce-scatter(s) for the dp-sharded gradients (or the partitioner's
    all-reduce+dynamic-slice canonicalisation of one) and stay within the
    collective budget — params being re-gathered per use site is the
    design, but an unbounded gather count means GSPMD gave up and went
    replicated."""
    cfg = _cfg()
    mesh = parallel.make_mesh([("dp", 4), ("tp", 2)])
    step = T.make_sharded_train_step(mesh, cfg, fsdp=True, fsdp_min_size=0)
    params = T.init_params(jax.random.key(0), cfg)
    opt = T.adam_init(params)
    toks = jnp.zeros((8, 16), jnp.int32)
    txt = (
        jax.jit(
            lambda p, o, t: step(p, o, t, t, jnp.float32(1e-3),
                                 jax.random.key(0))
        )
        .lower(params, opt, toks)
        .compile()
        .as_text()
    )
    c = _counts(txt)
    assert c["reduce-scatter"] + c["all-reduce"] >= 1, c
    # weight re-gathers: ≤ 2 per matmul use site (fwd + bwd) for ~10 big
    # leaves, plus tp activation gathers — snapshot with slack. Unlike the
    # pure-tp step, a bounded number of all-to-alls is EXPECTED here: the
    # partitioner reshards weight-shaped tensors between the stored
    # (dp-on-d_model) layout and the contraction layout via all-to-all,
    # which moves the fewest bytes of any reshard. Snapshot: ar30 ag16
    # a2a8 cp7.
    assert c["all-gather"] <= 32, c
    assert c["all-reduce"] <= 45, c
    assert c["all-to-all"] <= 12, c
    assert c["collective-permute"] <= 12, c
    # the output params really are stored dp-sharded
    sh = T.fsdp_param_shardings(mesh, cfg, min_size=0)
    assert "dp" in sh["blocks"]["fc_in"].spec
