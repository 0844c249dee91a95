"""Ring attention (context parallelism): the sequence axis of attention
sharded over a mesh axis, k/v blocks rotating via ppermute.

Oracle: the single-device flash/reference kernels on the gathered
arrays — the ring combine is exact, so tolerances are kernel-level.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuronika_tpu import parallel
from neuronika_tpu.ops.pallas.attention import reference_attention
from neuronika_tpu.parallel.mesh import shard_map_compat
from neuronika_tpu.parallel.ring import ring_flash_attention

from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 devices"
)

SPEC = P(None, None, "cp", None)


def _qkv(S=512, D=64, B=2, H=2, dtype=jnp.float32):
    q, k, v = jax.random.normal(jax.random.key(0), (3, B, H, S, D), dtype)
    return q, k, v


def _ring(mesh, n, causal, block=64):
    def f(q, k, v):
        return ring_flash_attention(q, k, v, "cp", n, causal, None,
                                    block, block, True)

    return shard_map_compat(f, mesh=mesh, in_specs=(SPEC, SPEC, SPEC),
                            out_specs=SPEC, check_rep=False)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    mesh = parallel.make_mesh([("cp", 8)])
    q, k, v = _qkv()
    out = _ring(mesh, 8, causal)(q, k, v)
    ref = reference_attention(q, k, v, causal)
    assert float(jnp.abs(out - ref).max()) < 2e-5


def test_forward_uneven_ring_of_4():
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
    q, k, v = _qkv(S=256)
    out = _ring(mesh, 4, True)(q, k, v)
    ref = reference_attention(q, k, v, True)
    assert float(jnp.abs(out - ref).max()) < 2e-5


@pytest.mark.parametrize("causal", [True, False])
def test_gradients_match_reference(causal):
    mesh = parallel.make_mesh([("cp", 8)])
    q, k, v = _qkv(S=256)
    w = jax.random.normal(jax.random.key(1), q.shape)

    ring = _ring(mesh, 8, causal, block=32)

    def loss(fn):
        return jax.grad(
            lambda q_, k_, v_: (fn(q_, k_, v_) * w).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)

    gr = loss(ring)
    go = loss(lambda a, b, c: reference_attention(a, b, c, causal))
    for a, b in zip(gr, go):
        assert float(jnp.abs(a - b).max()) < 2e-4


def test_no_full_sequence_gather_in_hlo():
    """The ring must move k/v with neighbour ppermutes — the compiled
    module may not contain an all-gather of the sequence axis."""
    mesh = parallel.make_mesh([("cp", 8)])
    q, k, v = _qkv(S=512)
    sh = NamedSharding(mesh, SPEC)
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    ring = _ring(mesh, 8, True)
    txt = (
        jax.jit(lambda a, b, c: ring(a, b, c).sum())
        .lower(q, k, v)
        .compile()
        .as_text()
    )
    assert "collective-permute" in txt
    assert "all-gather" not in txt


def test_bf16_inputs():
    mesh = parallel.make_mesh([("cp", 8)])
    q, k, v = _qkv(S=512, dtype=jnp.bfloat16)
    out = _ring(mesh, 8, True)(q, k, v)
    ref = reference_attention(q, k, v, True)
    assert out.dtype == jnp.bfloat16
    assert float(jnp.abs(out.astype(jnp.float32)
                         - ref.astype(jnp.float32)).max()) < 2e-2


def _train_pair(cfg, mesh, B=4, S=128):
    """Run the sharded and unsharded train steps on the same data."""
    from neuronika_tpu.config import config
    from neuronika_tpu.models import transformer as T

    toks = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    tgts = jnp.roll(toks, -1, axis=1)
    config.pallas_interpret = True
    try:
        params = T.init_params(jax.random.key(0), cfg)
        sh = T.make_sharded_train_step(mesh, cfg)
        p_a, _, loss_a = sh(jax.tree.map(jnp.copy, params),
                            T.adam_init(params), toks, tgts,
                            jnp.float32(1e-3), jax.random.key(2))
        st = T.make_train_step(cfg)
        p_b, _, loss_b = st(jax.tree.map(jnp.copy, params),
                            T.adam_init(params), toks, tgts,
                            jnp.float32(1e-3), jax.random.key(2))
    finally:
        config.pallas_interpret = False
    return (p_a, loss_a), (p_b, loss_b)


class TestContextParallelModel:
    """cp mesh axis: the whole GPT body runs S-sharded with ring
    attention; the step must equal the single-chip step."""

    def test_dp_cp_train_step_matches_unsharded(self):
        from neuronika_tpu.models import transformer as T

        cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=4, d_model=32,
                          d_ff=64, max_seq=128, dtype=jnp.float32,
                          flash="on", flash_block=128)
        mesh = parallel.make_mesh([("dp", 2), ("cp", 4)])
        (p_a, loss_a), (p_b, loss_b) = _train_pair(cfg, mesh)
        assert abs(float(loss_a) - float(loss_b)) < 1e-4
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), p_a, p_b)
        assert max(jax.tree.leaves(d)) < 1e-4

    def test_dp_tp_cp_train_step_matches_unsharded(self):
        from neuronika_tpu.models import transformer as T

        cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=4, d_model=32,
                          d_ff=64, max_seq=128, dtype=jnp.float32,
                          flash="on", flash_block=128, pos_emb="rope")
        mesh = parallel.make_mesh([("dp", 2), ("tp", 2), ("cp", 2)])
        (p_a, loss_a), (p_b, loss_b) = _train_pair(cfg, mesh)
        assert abs(float(loss_a) - float(loss_b)) < 1e-4

    def test_dropout_with_cp_raises(self):
        from neuronika_tpu.config import config
        from neuronika_tpu.models import transformer as T

        cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                          d_ff=64, max_seq=64, dtype=jnp.float32,
                          flash="on", flash_block=64, dropout=0.1)
        mesh = parallel.make_mesh([("dp", 2), ("cp", 4)])
        toks = jax.random.randint(jax.random.key(1), (4, 64), 0, 32)
        config.pallas_interpret = True
        try:
            params = T.init_params(jax.random.key(0), cfg)
            sh = T.make_sharded_train_step(mesh, cfg)
            with pytest.raises(ValueError, match="dropout"):
                sh(params, T.adam_init(params), toks,
                   jnp.roll(toks, -1, 1), jnp.float32(1e-3),
                   jax.random.key(2))
        finally:
            config.pallas_interpret = False


def test_extreme_scores_gradients_finite():
    """Future-block hops push s - lse far past the f32 exp2 range; the
    clamped backward must stay finite AND correct (regression for the
    inf * 0 = NaN in the ring backward)."""
    mesh = parallel.make_mesh([("cp", 8)])
    q, k, v = (30.0 * x for x in _qkv_helper())
    w = jax.random.normal(jax.random.key(1), q.shape)
    ring = _ring(mesh, 8, True, block=32)
    gr = jax.grad(lambda a, b, c: (ring(a, b, c) * w).sum(),
                  (0, 1, 2))(q, k, v)
    go = jax.grad(
        lambda a, b, c: (reference_attention(a, b, c, True) * w).sum(),
        (0, 1, 2))(q, k, v)
    for a, b in zip(gr, go):
        assert bool(jnp.isfinite(a).all())
        # saturated-softmax regime: compare relative to grad magnitude
        scale = float(jnp.abs(b).max()) + 1.0
        assert float(jnp.abs(a - b).max()) / scale < 5e-3


def _qkv_helper(S=256, D=64, B=1, H=2):
    q, k, v = jax.random.normal(jax.random.key(0), (3, B, H, S, D))
    return q, k, v


def test_cp_block_not_dividing_local_seq():
    """flash_block that doesn't divide the per-chip sequence must fall
    back to a gcd block, not crash (S=384, cp=4 -> S_local=96, fb=64)."""
    from neuronika_tpu.config import config
    from neuronika_tpu.models import transformer as T

    cfg = T.GPTConfig(vocab_size=32, n_layer=1, n_head=2, d_model=32,
                      d_ff=64, max_seq=384, dtype=jnp.float32,
                      flash="on", flash_block=64)
    mesh = parallel.make_mesh([("dp", 2), ("cp", 4)])
    toks = jax.random.randint(jax.random.key(1), (4, 384), 0, 32)
    config.pallas_interpret = True
    try:
        params = T.init_params(jax.random.key(0), cfg)
        sh = T.make_sharded_train_step(mesh, cfg)
        _, _, loss = sh(params, T.adam_init(params), toks,
                        jnp.roll(toks, -1, 1), jnp.float32(1e-3),
                        jax.random.key(2))
    finally:
        config.pallas_interpret = False
    assert np.isfinite(float(loss))


def test_bert_encoder_under_cp():
    """Long-document encoder: causal=False body S-sharded over cp, the
    ring runs non-causal (every hop contributes). MLM loss must match
    the single-chip encoder."""
    from neuronika_tpu.config import config
    from neuronika_tpu.models import bert as BT
    from neuronika_tpu.models import transformer as T

    cfg = BT.bert_config(vocab_size=32, n_layer=2, n_head=2, d_model=32,
                         d_ff=64, max_seq=128, dtype=jnp.float32,
                         flash="on", flash_block=32)
    mesh = parallel.make_mesh([("dp", 2), ("cp", 4)])
    toks = jax.random.randint(jax.random.key(1), (4, 128), 0, 32)
    labels = toks
    w = (jax.random.uniform(jax.random.key(2), toks.shape) < 0.2
         ).astype(jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    config.pallas_interpret = True
    try:
        sharded = jax.jit(
            lambda p, t: BT.mlm_loss_fn(p, t, labels, w, cfg,
                                        mesh=mesh),
            in_shardings=(jax.sharding.NamedSharding(mesh, P()),
                          jax.sharding.NamedSharding(mesh, P("dp", "cp"))),
        )
        a = float(sharded(params, toks))
        b = float(BT.mlm_loss_fn(params, toks, labels, w, cfg))
    finally:
        config.pallas_interpret = False
    assert abs(a - b) < 1e-4
