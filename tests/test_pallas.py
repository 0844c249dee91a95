"""Pallas kernel tier tests (interpreter mode on CPU; the same kernels
compile natively on TPU). Every kernel is checked against its XLA
composite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuronika_tpu.ops.pallas.attention import flash_attention, reference_attention
from neuronika_tpu.ops.pallas.matmul import matmul
from neuronika_tpu.ops.pallas.softmax import softmax_last_axis
from tests.conftest import assert_close


@pytest.mark.parametrize(
    "m,k,n", [(128, 128, 128), (300, 200, 150), (64, 512, 256), (8, 128, 128)]
)
def test_pallas_matmul(m, k, n):
    a = np.random.randn(m, k).astype(np.float32)
    b = np.random.randn(k, n).astype(np.float32)
    out = matmul(jnp.asarray(a), jnp.asarray(b), interpret=True)
    assert_close(out, a @ b, tol=1e-4)


def test_pallas_matmul_bf16():
    a = jnp.asarray(np.random.randn(128, 256), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(256, 128), jnp.bfloat16)
    out = matmul(a, b, interpret=True)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    assert_close(out.astype(np.float32), np.asarray(ref, np.float32), tol=2e-2)


@pytest.mark.parametrize("log", [False, True])
@pytest.mark.parametrize("shape", [(16, 64), (3, 5, 40), (300, 128)])
def test_pallas_softmax(log, shape):
    x = jnp.asarray(np.random.randn(*shape).astype(np.float32) * 3)
    out = softmax_last_axis(x, log=log, interpret=True)
    ref = jax.nn.log_softmax(x, -1) if log else jax.nn.softmax(x, -1)
    assert_close(out, ref, tol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("S,D", [(256, 64), (128, 128)])
def test_flash_attention_forward(causal, S, D):
    q, k, v = [
        jax.random.normal(jax.random.key(i), (2, 2, S, D), jnp.float32)
        for i in range(3)
    ]
    out = flash_attention(q, k, v, causal, None, 128, 128, True)
    ref = reference_attention(q, k, v, causal)
    assert_close(out, ref, tol=1e-5)


def test_flash_attention_backward():
    B, H, S, D = 1, 2, 256, 64
    q, k, v = [
        jax.random.normal(jax.random.key(i), (B, H, S, D), jnp.float32)
        for i in range(3)
    ]
    w = jnp.cos(jnp.arange(D))

    def f(q, k, v):
        return (flash_attention(q, k, v, True, None, 128, 128, True) * w).sum()

    def g(q, k, v):
        return (reference_attention(q, k, v, True) * w).sum()

    ours = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(ours, ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name}",
        )


def test_flash_attention_nondivisible_seq_raises():
    q = jnp.zeros((1, 1, 100, 64))
    with pytest.raises(ValueError, match="divisible"):
        flash_attention(q, q, q, True, None, 64, 64, True)


def test_ops_pallas_gate():
    """config.use_pallas routes mm/softmax through the kernels (interpret
    mode here) and produces identical numbers."""
    import neuronika_tpu as nk
    from neuronika_tpu.config import enable_pallas

    a = np.random.randn(64, 32).astype(np.float32)
    b = np.random.randn(32, 48).astype(np.float32)
    x = nk.from_ndarray(a).requires_grad()
    y = x.mm(nk.from_ndarray(b)).softmax(1).sum()
    y.forward()
    base = np.asarray(y.data())
    try:
        enable_pallas(True, interpret=True)
        x2 = nk.from_ndarray(a).requires_grad()
        y2 = x2.mm(nk.from_ndarray(b)).softmax(1).sum()
        y2.forward()
        assert_close(y2.data(), base, tol=1e-5)
        y2.backward(1.0)
        assert np.isfinite(np.asarray(x2.grad())).all()
    finally:
        enable_pallas(False)


@pytest.mark.parametrize(
    "xs,ws,dil",
    [
        ((2, 3, 10, 10), (4, 3, 3, 3), (1, 1)),
        ((1, 2, 9, 11), (2, 2, 2, 3), (2, 2)),
        ((1, 4, 16, 12), (8, 4, 5, 5), (1, 1)),
    ],
)
def test_pallas_direct_conv2d(xs, ws, dil):
    from neuronika_tpu.ops.functional import OPS
    from neuronika_tpu.ops.pallas.conv import conv2d_direct

    x = jnp.asarray(np.random.randn(*xs), jnp.float32)
    w = jnp.asarray(np.random.randn(*ws), jnp.float32)
    out = conv2d_direct(x, w, dil, interpret=True)
    ref = OPS["convolution"].fwd(((1, 1), dil, 1), w, x)
    assert_close(out, ref, tol=1e-4)


def test_fused_linear_cross_entropy():
    from neuronika_tpu.ops.pallas.cross_entropy import (
        fused_linear_cross_entropy,
        reference_linear_cross_entropy,
    )

    N, D, V = 512, 64, 1024
    x = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (V, D), jnp.float32) * 0.05
    t = jax.random.randint(jax.random.key(2), (N,), 0, V)
    ours = fused_linear_cross_entropy(x, w, t, 128, 256, True)
    ref = reference_linear_cross_entropy(x, w, t)
    assert_close(ours, ref, tol=1e-5)

    g1 = jax.grad(
        lambda a, b: fused_linear_cross_entropy(a, b, t, 128, 256, True),
        argnums=(0, 1),
    )(x, w)
    g2 = jax.grad(
        lambda a, b: reference_linear_cross_entropy(a, b, t), argnums=(0, 1)
    )(x, w)
    assert_close(g1[0], g2[0], tol=1e-5)
    assert_close(g1[1], g2[1], tol=1e-5)


def test_fused_ce_block_validation():
    from neuronika_tpu.ops.pallas.cross_entropy import fused_linear_cross_entropy

    x = jnp.zeros((100, 64))
    w = jnp.zeros((1000, 64))
    t = jnp.zeros((100,), jnp.int32)
    with pytest.raises(ValueError, match="divisible"):
        fused_linear_cross_entropy(x, w, t, 64, 256, True)


def _lax_conv_loss(x, w, dil):
    from neuronika_tpu.ops.functional import OPS

    return (OPS["convolution"].fwd(((1, 1), dil, 1), w, x) * 0.5).sum()


@pytest.mark.parametrize("dil", [(1, 1), (2, 2)])
def test_pallas_conv_backward_composition(dil):
    """Conv cotangents computed on the direct Pallas kernel (input-grad as
    a flipped-kernel conv; kernel-grad as a batch-contracting correlation)
    match jax.grad of the XLA conv."""
    from neuronika_tpu.ops.pallas.conv import conv2d_pallas

    x = jnp.asarray(np.random.randn(2, 3, 11, 11), jnp.float32)
    w = jnp.asarray(np.random.randn(4, 3, 3, 3), jnp.float32)

    def f(x, w):
        return (conv2d_pallas(x, w, dil, True) * 0.5).sum()

    ours = jax.grad(f, argnums=(0, 1))(x, w)
    oracle = jax.grad(lambda a, b: _lax_conv_loss(a, b, dil), argnums=(0, 1))(x, w)
    assert_close(ours[0], oracle[0], tol=1e-4)
    assert_close(ours[1], oracle[1], tol=1e-4)


def test_ops_pallas_conv_gate():
    """config.use_pallas routes stride-1 conv2d through the direct kernel
    with identical numbers fwd+bwd."""
    import neuronika_tpu as nk
    from neuronika_tpu.config import enable_pallas

    kv = np.random.randn(4, 3, 3, 3).astype(np.float32)
    xv = np.random.randn(2, 3, 8, 8).astype(np.float32)

    def run():
        k = nk.from_ndarray(kv).requires_grad()
        loss = k.convolution(nk.from_ndarray(xv), (1, 1), (1, 1)).pow(2).mean()
        loss.forward()
        loss.backward(1.0)
        return np.asarray(loss.data()).copy(), np.asarray(k.grad()).copy()

    base_loss, base_grad = run()
    try:
        enable_pallas(True, interpret=True)
        pl_loss, pl_grad = run()
    finally:
        enable_pallas(False)
    assert_close(pl_loss, base_loss, tol=1e-5)
    assert_close(pl_grad, base_grad, tol=1e-4)


# ---------------------------------------------------------------------------
# attention dropout inside the flash kernel (kernel-side PRNG)


def test_flash_dropout_rate0_identity():
    from neuronika_tpu.ops.pallas.attention import flash_attention_dropout

    q, k, v = (jax.random.normal(jax.random.key(i), (1, 2, 256, 64))
               for i in range(3))
    plain = flash_attention(q, k, v, True, None, 128, 128, True)
    d0 = flash_attention_dropout(q, k, v, jnp.float32(5.0), True, None,
                                 128, 128, True, 0.0)
    assert_close(d0, plain, tol=1e-6)


def test_flash_dropout_deterministic_and_seeded():
    from neuronika_tpu.ops.pallas.attention import flash_attention_dropout

    q, k, v = (jax.random.normal(jax.random.key(i), (1, 2, 256, 64))
               for i in range(3))
    a = flash_attention_dropout(q, k, v, jnp.float32(1.0), True, None,
                                128, 128, True, 0.3)
    b = flash_attention_dropout(q, k, v, jnp.float32(1.0), True, None,
                                128, 128, True, 0.3)
    c = flash_attention_dropout(q, k, v, jnp.float32(2.0), True, None,
                                128, 128, True, 0.3)
    assert_close(a, b, tol=0)
    assert float(jnp.abs(a - c).max()) > 1e-4


def test_flash_dropout_unbiased_in_distribution():
    """E_seed[dropout attention] == plain attention (the 1/(1-p) scaling
    makes dropout unbiased); matches the composite path in distribution."""
    from neuronika_tpu.ops.pallas.attention import flash_attention_dropout

    q, k, v = (jax.random.normal(jax.random.key(i), (1, 2, 256, 64))
               for i in range(3))
    plain = flash_attention(q, k, v, True, None, 128, 128, True)
    outs = jnp.stack([
        flash_attention_dropout(q, k, v, jnp.float32(13 * i + 1), True,
                                None, 128, 128, True, 0.3)
        for i in range(32)
    ])
    rel = float(jnp.abs(outs.mean(0) - plain).mean()) / float(
        jnp.abs(plain).mean())
    assert rel < 0.25, rel


def test_flash_dropout_custom_vjp_matches_fd():
    """Backward kernels regenerate the SAME masks as forward — the custom
    VJP of the (deterministic, seeded) function matches finite
    differences."""
    from jax.test_util import check_grads

    from neuronika_tpu.ops.pallas.attention import flash_attention_dropout

    q, k, v = (jax.random.normal(jax.random.key(i), (1, 1, 128, 32))
               for i in range(3))

    def f(q, k, v):
        return flash_attention_dropout(
            q, k, v, jnp.float32(42.0), True, None, 128, 128, True, 0.3
        ).sum()

    check_grads(f, (q, k, v), order=1, modes=("rev",), atol=2e-2, rtol=2e-2)


def test_transformer_trains_with_flash_dropout():
    """cfg.dropout > 0 no longer silently disables the flash kernel."""
    from neuronika_tpu.config import config
    from neuronika_tpu.models import transformer as T

    old = config.pallas_interpret
    config.pallas_interpret = True
    try:
        cfg = T.GPTConfig(vocab_size=32, n_layer=2, n_head=2, d_model=64,
                          d_ff=128, max_seq=128, dtype=jnp.float32,
                          flash="on", dropout=0.2, remat=False)
        params = T.init_params(jax.random.key(0), cfg)
        step = T.make_train_step(cfg)
        opt = T.adam_init(params)
        toks = jax.random.randint(jax.random.key(1), (2, 128), 0, 32)
        tgts = jnp.roll(toks, -1, axis=1)
        losses = []
        for i in range(5):
            params, opt, loss = step(params, opt, toks, tgts,
                                     jnp.float32(1e-2), jax.random.key(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)
    finally:
        config.pallas_interpret = old


def test_flash_qkv_fast_softmax_matches_safe():
    from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

    qkv = jax.random.normal(jax.random.key(0), (1, 256, 2 * 3 * 64))
    a = flash_attention_qkv(qkv, None, 2, 0, True, None, 128, 128, True,
                            0.0, False)
    b = flash_attention_qkv(qkv, None, 2, 0, True, None, 128, 128, True,
                            0.0, True)
    assert_close(a, b, tol=1e-5)


@pytest.mark.parametrize("kv,drop", [(4, 0.0), (2, 0.0), (2, 0.3)])
def test_flash_qkv_fused_bwd_matches_split(kv, drop):
    """The single-pass fused backward (dq+dk+dv in one tile walk) is
    bit-equal to the split dq / dkv passes, incl. GQA and dropout."""
    from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

    H, hd, B, S = 4, 64, 2, 256
    qkv = jax.random.normal(jax.random.key(0), (B, S, (H + 2 * kv) * hd))
    seed = jnp.float32(9.0) if drop else None

    def loss(x, fused):
        return (flash_attention_qkv(
            x, seed, H, kv, True, None, 128, 128, True, drop, False, fused,
        ) ** 2).sum()

    g_split = jax.grad(lambda x: loss(x, False))(qkv)
    g_fused = jax.grad(lambda x: loss(x, True))(qkv)
    assert_close(g_fused, g_split, tol=1e-6)


@pytest.mark.parametrize("kv", [4, 2, 1])
def test_flash_qkv_group_major_layout_vs_reference(kv):
    """Pins the packed-qkv layout convention: kv-group-major — KV groups
    of (G+2) hd-wide chunks, group g = [q_{gG} … q_{gG+G-1} | k_g | v_g].
    The kernel on the packed tensor must equal reference attention on the
    unpacked heads, with GQA repeating kv head g over q heads gG..gG+G-1
    (the convention models/transformer._unpack_qkv also follows)."""
    from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

    H, hd, B, S = 4, 64, 2, 256
    G = H // kv
    W = (H + 2 * kv) * hd
    qkv = jax.random.normal(jax.random.key(0), (B, S, W), jnp.float32)

    parts = qkv.reshape(B, S, kv, G + 2, hd)
    q = parts[:, :, :, :G].reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = parts[:, :, :, G].transpose(0, 2, 1, 3)
    v = parts[:, :, :, G + 1].transpose(0, 2, 1, 3)
    k = jnp.repeat(k, G, axis=1)
    v = jnp.repeat(v, G, axis=1)

    out = flash_attention_qkv(qkv, None, H, kv, True, None, 128, 128, True)
    ref = reference_attention(q, k, v, True)          # (B, H, S, hd)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
    assert_close(out, ref, tol=2e-5)


@pytest.mark.parametrize("kv", [4, 2])
def test_flash_qkv_group_major_gradients_vs_reference(kv):
    """Backward parity of the packed kernels against autodiff through the
    unpack + reference composite, mapped back into the packed layout."""
    from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

    H, hd, B, S = 4, 64, 1, 128
    G = H // kv
    W = (H + 2 * kv) * hd
    qkv = jax.random.normal(jax.random.key(3), (B, S, W), jnp.float32)
    w = jax.random.normal(jax.random.key(4), (B, S, H * hd), jnp.float32)

    def via_kernel(x):
        return (flash_attention_qkv(
            x, None, H, kv, True, None, 128, 128, True) * w).sum()

    def via_reference(x):
        parts = x.reshape(B, S, kv, G + 2, hd)
        q = parts[:, :, :, :G].reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        k = jnp.repeat(parts[:, :, :, G].transpose(0, 2, 1, 3), G, axis=1)
        v = jnp.repeat(parts[:, :, :, G + 1].transpose(0, 2, 1, 3), G,
                       axis=1)
        o = reference_attention(q, k, v, True)
        return (o.transpose(0, 2, 1, 3).reshape(B, S, H * hd) * w).sum()

    g_a = jax.grad(via_kernel)(qkv)
    g_b = jax.grad(via_reference)(qkv)
    assert_close(g_a, g_b, tol=5e-5)


class TestDirectConv:
    """The r3 flat-window direct conv tier: stride-1 kernel, phase-
    decomposed strided path, NHWC custom VJP, accumulating dw kernel —
    all vs the lax composite (interpret mode; same kernels compile on
    TPU, measured in BENCH kernel_rooflines)."""

    def _ref(self, x, w, stride, padding, dilation=(1, 1)):
        return jax.lax.conv_general_dilated(
            x, w, stride, padding, rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @pytest.mark.parametrize("stride", [(1, 1), (2, 2), (3, 2)])
    def test_forward_valid(self, stride):
        from neuronika_tpu.ops.pallas.conv import conv2d_direct_nhwc

        x = jnp.asarray(np.random.randn(2, 13, 12, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 3, 8, 16), jnp.float32) * 0.1
        a = conv2d_direct_nhwc(x, w, (1, 1), stride, interpret=True)
        b = self._ref(x, w, stride, "VALID")
        assert a.shape == b.shape
        assert_close(a, b, tol=1e-5)

    def test_forward_dilated_and_co_tiling(self):
        from neuronika_tpu.ops.pallas.conv import conv2d_direct_nhwc

        x = jnp.asarray(np.random.randn(1, 14, 14, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 3, 8, 300), jnp.float32) * 0.1
        a = conv2d_direct_nhwc(x, w, (2, 2), (1, 1), interpret=True)
        b = self._ref(x, w, (1, 1), "VALID", (2, 2))
        assert_close(a, b, tol=1e-5)

    @pytest.mark.parametrize("stride,pad", [
        ((1, 1), "SAME"), ((1, 1), "VALID"),
        ((2, 2), "SAME"), ((2, 2), "VALID")])
    def test_nhwc_vjp(self, stride, pad):
        """Forward + input/kernel grads of the NHWC custom-VJP entry
        (stride-1 backward runs the Pallas dx/dw kernels; strided falls
        back to the XLA transpose). SAME padding follows lax's
        input-size-dependent strided split."""
        from neuronika_tpu.ops.pallas.conv import conv2d_pallas_nhwc

        x = jnp.asarray(np.random.randn(2, 11, 10, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 3, 8, 16), jnp.float32) * 0.1
        a = conv2d_pallas_nhwc(x, w, stride, pad, True)
        b = self._ref(x, w, stride, pad)
        assert_close(a, b, tol=1e-5)

        ga = jax.grad(lambda x, w: jnp.tanh(
            conv2d_pallas_nhwc(x, w, stride, pad, True)).sum(), (0, 1))(x, w)
        gb = jax.grad(lambda x, w: jnp.tanh(
            self._ref(x, w, stride, pad)).sum(), (0, 1))(x, w)
        assert_close(ga[0], gb[0], tol=1e-4)
        assert_close(ga[1], gb[1], tol=1e-4)

    def test_dw_kernel_channel_blocking(self):
        """The accumulating dw GEMM kernel with Ci/Co bigger than one
        channel block (padded lanes must not leak into the result)."""
        from neuronika_tpu.ops.pallas.conv import conv2d_dw_nhwc

        x = jnp.asarray(np.random.randn(3, 10, 10, 200), jnp.float32)
        g = jnp.asarray(np.random.randn(3, 8, 8, 140), jnp.float32)
        dw = conv2d_dw_nhwc(x, g, 3, 3, interpret=True)
        ref = jax.grad(lambda w: (self._ref(x, w, (1, 1), "VALID")
                                  * g).sum())(
            jnp.zeros((3, 3, 200, 140), jnp.float32))
        assert_close(dw, ref, tol=1e-4)


@pytest.mark.parametrize("rank,stride", [(1, 1), (1, 2), (2, 2), (3, 1)])
def test_ops_pallas_conv_gate_ranks(rank, stride):
    """config.use_pallas now routes conv1d (any stride), strided conv2d,
    and stride-1 conv3d through the direct kernels — Var-tier numbers
    must match the XLA path fwd+bwd."""
    import neuronika_tpu as nk
    from neuronika_tpu.config import enable_pallas

    spatial_k = {1: (3,), 2: (3, 3), 3: (2, 2, 2)}[rank]
    spatial_x = {1: (12,), 2: (9, 9), 3: (5, 6, 7)}[rank]
    kv = np.random.randn(4, 3, *spatial_k).astype(np.float32)
    xv = np.random.randn(2, 3, *spatial_x).astype(np.float32)
    s = (stride,) * rank
    d = (1,) * rank

    def run():
        k = nk.from_ndarray(kv).requires_grad()
        loss = k.convolution(nk.from_ndarray(xv), s, d).pow(2).mean()
        loss.forward()
        loss.backward(1.0)
        return np.asarray(loss.data()).copy(), np.asarray(k.grad()).copy()

    base_loss, base_grad = run()
    try:
        enable_pallas(True, interpret=True)
        pl_loss, pl_grad = run()
    finally:
        enable_pallas(False)
    assert_close(pl_loss, base_loss, tol=1e-5)
    assert_close(pl_grad, base_grad, tol=1e-4)


class TestDirectConvRanks:
    """Rank-generic direct conv tier: 1-d (2-d kernel specialisation),
    3-d (one rank up on the same flat-window scheme), grouped 2-d
    (per-group lane slices via the co-block grid index)."""

    @pytest.mark.parametrize("d,s", [(1, 1), (2, 1), (1, 2)])
    def test_conv1d(self, d, s):
        from neuronika_tpu.ops.pallas.conv import conv1d_direct_nwc

        x = jnp.asarray(np.random.randn(2, 33, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 8, 16), jnp.float32) * 0.1
        a = conv1d_direct_nwc(x, w, d, s, interpret=True)
        b = jax.lax.conv_general_dilated(
            x, w, (s,), "VALID", rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        assert a.shape == b.shape
        assert_close(a, b, tol=1e-5)

    @pytest.mark.parametrize("d", [1, 2])
    def test_conv1d_stacked_taps(self, d):
        # the r5 deep-K variant: the (bl, k*Ci) patch built in VMEM and
        # ONE K=k*Ci dot must equal the k-shallow-dot path exactly
        from neuronika_tpu.ops.pallas.conv import _conv1d_s1_nwc

        x = jnp.asarray(np.random.randn(2, 33, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 8, 16), jnp.float32) * 0.1
        a = _conv1d_s1_nwc(x, w, d, stack_taps=True, interpret=True)
        b = _conv1d_s1_nwc(x, w, d, interpret=True)
        assert a.shape == b.shape
        assert_close(a, b, tol=1e-5)

    @pytest.mark.parametrize("d,s", [(1, 1), (2, 1), (1, 2)])
    def test_conv1d_out_ncw(self, d, s):
        # NCW-layout output produced in-kernel (VMEM block transpose)
        # must equal the NWC result transposed on the host side
        from neuronika_tpu.ops.pallas.conv import conv1d_direct_nwc

        x = jnp.asarray(np.random.randn(2, 33, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 8, 16), jnp.float32) * 0.1
        a = conv1d_direct_nwc(x, w, d, s, out_ncw=True, interpret=True)
        b = conv1d_direct_nwc(x, w, d, s, interpret=True)
        assert a.shape == (b.shape[0], b.shape[2], b.shape[1])
        assert_close(a, b.transpose(0, 2, 1), tol=1e-5)

    @pytest.mark.parametrize("k,dil", [
        ((3, 3, 3), (1, 1, 1)), ((2, 3, 2), (1, 1, 1)),
        ((2, 2, 2), (2, 2, 2))])
    def test_conv3d(self, k, dil):
        from neuronika_tpu.ops.pallas.conv import conv3d_direct_ndhwc

        x = jnp.asarray(np.random.randn(2, 6, 7, 9, 8), jnp.float32)
        w = jnp.asarray(np.random.randn(*k, 8, 16), jnp.float32) * 0.1
        a = conv3d_direct_ndhwc(x, w, dil, interpret=True)
        b = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID", rhs_dilation=dil,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        assert a.shape == b.shape
        assert_close(a, b, tol=1e-5)

    @pytest.mark.parametrize("G,stride", [(2, (1, 1)), (4, (1, 1)),
                                          (2, (2, 2))])
    def test_grouped(self, G, stride):
        from neuronika_tpu.ops.pallas.conv import conv2d_direct_nhwc

        Ci, Co = 8, 12 if G == 2 else 8
        x = jnp.asarray(np.random.randn(2, 10, 10, Ci), jnp.float32)
        w = jnp.asarray(np.random.randn(3, 3, Ci // G, Co),
                        jnp.float32) * 0.1
        a = conv2d_direct_nhwc(x, w, (1, 1), stride, groups=G,
                               interpret=True)
        b = jax.lax.conv_general_dilated(
            x, w, stride, "VALID", feature_group_count=G,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert_close(a, b, tol=1e-5)


class TestSlidingWindow:
    """window > 0: banded causal attention (each query sees the last
    `window` keys including itself). The kernels skip tiles outside the
    band, so these also regression-guard the traced loop bounds."""

    def _qkv(self, S=256, D=64):
        import jax

        return jax.random.normal(jax.random.key(0), (3, 2, 2, S, D))

    @pytest.mark.parametrize("W", [1, 7, 64, 100, 200, 256, 999])
    def test_forward_matches_reference(self, W):
        q, k, v = self._qkv()
        out = flash_attention(q, k, v, True, None, 64, 64, True, W)
        ref = reference_attention(q, k, v, True, None, W)
        assert float(jnp.abs(out - ref).max()) < 2e-5

    @pytest.mark.parametrize("W", [7, 100, 256])
    def test_gradients_match_reference(self, W):
        import jax

        q, k, v = self._qkv(S=128)
        w = jax.random.normal(jax.random.key(1), q.shape)

        def f(fn):
            return jax.grad(
                lambda q_, k_, v_: (fn(q_, k_, v_) * w).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)

        gf = f(lambda *a: flash_attention(*a, True, None, 64, 64, True, W))
        gr = f(lambda *a: reference_attention(*a, True, None, W))
        for a, b in zip(gf, gr):
            assert float(jnp.abs(a - b).max()) < 2e-4

    def test_window_geq_seq_equals_causal(self):
        q, k, v = self._qkv(S=128)
        full = flash_attention(q, k, v, True, None, 64, 64, True, 0)
        wide = flash_attention(q, k, v, True, None, 64, 64, True, 4096)
        assert float(jnp.abs(full - wide).max()) == 0.0

    def test_dropout_variant_rate0_identity(self):
        from neuronika_tpu.ops.pallas.attention import (
            flash_attention_dropout,
        )

        q, k, v = self._qkv(S=128)
        od = flash_attention_dropout(q, k, v, jnp.float32(3), True, None,
                                     64, 64, True, 0.0, 50)
        ow = flash_attention(q, k, v, True, None, 64, 64, True, 50)
        assert float(jnp.abs(od - ow).max()) == 0.0


class TestCrossShapeFlash:
    """Sq != Skv (cross-attention): block sizes are per-axis — q blocks
    divide Sq, kv blocks divide Skv, never cross-checked."""

    def test_indivisible_cross_lengths(self):
        # Sq=64 with Skv=96: old code validated 64 % min(bk, 64) AND
        # 96 % bq and crashed; per-axis sizing must run and be exact
        import jax

        q = jax.random.normal(jax.random.key(0), (1, 2, 64, 32))
        k = jax.random.normal(jax.random.key(1), (1, 2, 96, 32))
        v = jax.random.normal(jax.random.key(2), (1, 2, 96, 32))
        out = flash_attention(q, k, v, False, None, 64, 96, True)
        ref = reference_attention(q, k, v, False)
        assert float(jnp.abs(out - ref).max()) < 2e-5

    def test_cross_gradients(self):
        import jax

        q = jax.random.normal(jax.random.key(0), (1, 2, 64, 32))
        k = jax.random.normal(jax.random.key(1), (1, 2, 128, 32))
        v = jax.random.normal(jax.random.key(2), (1, 2, 128, 32))
        w = jax.random.normal(jax.random.key(3), q.shape)
        gf = jax.grad(lambda *a: (flash_attention(*a, False, None, 32, 32,
                                                  True) * w).sum(),
                      (0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: (reference_attention(*a, False) * w).sum(),
                      (0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            assert float(jnp.abs(a - b).max()) < 2e-4

    def test_causal_mismatch_raises(self):
        import jax

        q = jax.random.normal(jax.random.key(0), (1, 1, 64, 32))
        k = jax.random.normal(jax.random.key(1), (1, 1, 128, 32))
        with pytest.raises(ValueError, match="matching q/kv"):
            flash_attention(q, k, k, True, None, 32, 32, True)

    def test_window_without_causal_raises(self):
        import jax

        q = jax.random.normal(jax.random.key(0), (1, 1, 64, 32))
        with pytest.raises(ValueError, match="requires causal"):
            flash_attention(q, q, q, False, None, 32, 32, True, 8)


class TestPagedAttention:
    """Paged-attention decode kernel (ops/pallas/paged_attention.py):
    block-table walk fused into the attention dots. Reference is the
    dense gather + masked softmax the XLA path materialises."""

    @staticmethod
    def _ref(q, pk, pv, table, pos, window=0):
        B, KV, G, hd = q.shape
        MB = table.shape[1]
        BS = pk.shape[2]
        lk = pk[table].transpose(0, 2, 1, 3, 4).reshape(B, KV, MB * BS, hd)
        lv = pv[table].transpose(0, 2, 1, 3, 4).reshape(B, KV, MB * BS, hd)
        s = jnp.einsum("bkgd,bksd->bkgs", q, lk) / np.sqrt(hd)
        idx = jnp.arange(MB * BS)[None, None, None, :]
        keep = idx <= pos[:, None, None, None]
        if window:
            keep &= pos[:, None, None, None] - idx < window
        s = jnp.where(keep, s, -1e30)
        return jnp.einsum("bkgs,bksd->bkgd", jax.nn.softmax(s, -1), lv)

    def _case(self, B=3, KV=2, G=2, hd=128, NB=16, BS=16, MB=4, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, KV, G, hd)).astype(np.float32))
        pk = jnp.asarray(
            rng.normal(size=(NB, KV, BS, hd)).astype(np.float32))
        pv = jnp.asarray(
            rng.normal(size=(NB, KV, BS, hd)).astype(np.float32))
        # non-contiguous, per-sequence shuffled block tables
        table = jnp.asarray(rng.permutation(
            np.arange(1, NB))[: B * MB].reshape(B, MB).astype(np.int32))
        pos = jnp.asarray(np.array([5, 37, MB * BS - 1], np.int32)[:B])
        return q, pk, pv, table, pos

    @pytest.mark.parametrize("window", [0, 9])
    def test_matches_gather_reference(self, window):
        from neuronika_tpu.ops.pallas.paged_attention import paged_attention

        q, pk, pv, table, pos = self._case()
        out = paged_attention(q, pk, pv, table, pos, window=window,
                              interpret=True)
        ref = self._ref(q, pk, pv, table, pos, window)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    def test_mha_single_group(self):
        # G=1 (plain MHA): the degenerate query-group shape
        from neuronika_tpu.ops.pallas.paged_attention import paged_attention

        q, pk, pv, table, pos = self._case(KV=4, G=1, seed=1)
        out = paged_attention(q, pk, pv, table, pos, interpret=True)
        ref = self._ref(q, pk, pv, table, pos)
        assert float(jnp.abs(out - ref).max()) < 1e-5


class TestConvRouting:
    """VERDICT r3 #2c: with `use_pallas` on, conv tier selection consults
    the measured route table so the flag never pessimises; "force" keeps
    the direct kernels reachable."""

    def test_auto_routes_conv_to_xla(self):
        from neuronika_tpu.ops.pallas.conv import route_conv2d

        # large-batch / strided / 1d / 3d configurations route to XLA
        # (r4 sweep); batch defaults to 0 = unknown -> XLA
        for nd, s, d in ((2, (1, 1), (1, 1)), (2, (2, 2), (1, 1)),
                         ((1), (1,), (1,)), (3, (1, 1, 1), (1, 1, 1))):
            assert route_conv2d(nd, s, d, 1) == "xla"
        assert route_conv2d(2, (1, 1), (1, 1), 1, batch=64) == "xla"
        assert route_conv2d(2, (1, 1), (1, 1), 1, batch=8) == "xla"

    def test_auto_routes_small_batch_s1_to_pallas(self, monkeypatch):
        """r5 probe: the direct NHWC kernel beats XLA's emitter at every
        stride-1 k3 forward with batch <= 4 (+10-22%); the route sends
        exactly that regime to pallas (on TPU — CPU stays on XLA)."""
        import sys

        from neuronika_tpu.ops.pallas.conv import route_conv2d

        # the package re-exports `config` (the object) under the same
        # name, shadowing the module attr — fetch the module itself
        C = sys.modules["neuronika_tpu.config"]
        monkeypatch.setattr(C, "on_tpu", lambda: True)
        # the probed winning cell: B<=4, 3x3, 28x28x512 bf16 footprints
        cell = dict(ksize=3, sample_bytes=30 * 28 * 512 * 2,
                    weight_bytes=9 * 512 * 512 * 2)
        for b in (1, 2, 4):
            assert route_conv2d(2, (1, 1), (1, 1), 1, batch=b,
                                **cell) == "pallas"
        # strided / dilated / grouped small-batch still XLA
        assert route_conv2d(2, (2, 2), (1, 1), 1, batch=4,
                            **cell) == "xla"
        assert route_conv2d(2, (1, 1), (2, 2), 1, batch=4,
                            **cell) == "xla"
        assert route_conv2d(2, (1, 1), (1, 1), 4, batch=4,
                            **cell) == "xla"
        # outside the probed envelope: big sample (224^2x256 f32),
        # non-3x3 kernel, or missing sizes -> XLA (the route must
        # never turn a working XLA conv into a Mosaic compile error)
        assert route_conv2d(2, (1, 1), (1, 1), 1, batch=1, ksize=3,
                            sample_bytes=226 * 224 * 256 * 4,
                            weight_bytes=9 * 256 * 256 * 4) == "xla"
        assert route_conv2d(2, (1, 1), (1, 1), 1, batch=4,
                            **dict(cell, ksize=5)) == "xla"
        assert route_conv2d(2, (1, 1), (1, 1), 1, batch=4) == "xla"
        # off-TPU the same winning cell keeps XLA
        monkeypatch.setattr(C, "on_tpu", lambda: False)
        assert route_conv2d(2, (1, 1), (1, 1), 1, batch=4,
                            **cell) == "xla"

    def test_auto_routes_small_batch_conv1d_to_pallas(self, monkeypatch):
        """r5 probe: conv1d shares the thin-batch regime — the NCW
        framework path measures 0.71-0.79 vs XLA's 0.44-0.49 at B<=4
        (k3 C256 L3136 bf16); XLA flips ahead at B8."""
        import sys

        from neuronika_tpu.ops.pallas.conv import route_conv2d

        C = sys.modules["neuronika_tpu.config"]
        monkeypatch.setattr(C, "on_tpu", lambda: True)
        cell = dict(ksize=3, sample_bytes=3139 * 256 * 2,
                    weight_bytes=3 * 256 * 256 * 2)
        for b in (1, 2, 4):
            assert route_conv2d(1, (1,), (1,), 1, batch=b,
                                **cell) == "pallas"
        # B8/B64 are XLA's (measured crossover), as are dilated,
        # grouped, non-k3, oversize-sample, and missing-size callers
        assert route_conv2d(1, (1,), (1,), 1, batch=8, **cell) == "xla"
        assert route_conv2d(1, (1,), (2,), 1, batch=4, **cell) == "xla"
        assert route_conv2d(1, (1,), (1,), 2, batch=4, **cell) == "xla"
        assert route_conv2d(1, (1,), (1,), 1, batch=4,
                            **dict(cell, ksize=5)) == "xla"
        assert route_conv2d(1, (1,), (1,), 1, batch=4,
                            **dict(cell, sample_bytes=int(4e6))) == "xla"
        assert route_conv2d(1, (1,), (1,), 1, batch=4) == "xla"
        monkeypatch.setattr(C, "on_tpu", lambda: False)
        assert route_conv2d(1, (1,), (1,), 1, batch=4, **cell) == "xla"

    def test_force_selects_pallas(self):
        from neuronika_tpu.config import config
        from neuronika_tpu.ops.pallas.conv import route_conv2d

        config.pallas_conv_route = "force"
        try:
            assert route_conv2d(2, (1, 1), (1, 1), 1) == "pallas"
        finally:
            config.pallas_conv_route = "auto"

    def test_use_pallas_auto_conv_matches_lax(self):
        """conv through the Var op with use_pallas on (auto route, no
        interpret): runs the XLA tier and matches the flag-off result."""
        import numpy as np

        import neuronika_tpu as nk
        from neuronika_tpu.config import enable_pallas

        x = np.random.rand(2, 3, 8, 8).astype(np.float32)
        w = np.random.rand(4, 3, 3, 3).astype(np.float32)
        # kernel-as-receiver, matching the reference (var.rs:704-724)
        v = nk.from_ndarray(w).convolution(nk.from_ndarray(x), 1, 1)
        v.forward()
        base = v.data()
        enable_pallas(True)  # interpret=False: auto routing active
        try:
            v2 = nk.from_ndarray(w).convolution(nk.from_ndarray(x), 1, 1)
            v2.forward()
            out = v2.data()
        finally:
            enable_pallas(False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kv,drop,causal", [(4, 0.0, True), (2, 0.0, True),
                                            (2, 0.3, True), (1, 0.0, True),
                                            (4, 0.0, False)])
def test_flash_qkv_blocked_fused_bwd_matches_split(kv, drop, causal):
    """The i-BLOCKED fused backward (grid (B, KV, n_q), q/do/o as q-tile
    blocks, dk/dv in scratch across the sequential axis — the long-S
    route where the whole-S slab kernel overflows scoped VMEM) matches
    the split dq/dkv passes, incl. GQA and dropout."""
    from neuronika_tpu.ops.pallas import attention as A

    H, hd, B, S = 4, 64, 2, 256
    qkv = jax.random.normal(jax.random.key(0), (B, S, (H + 2 * kv) * hd))
    seed = jnp.float32(9.0) if drop else None
    sc = 1.0 / hd ** 0.5
    out, lse = A._fwd_call_qkv(qkv, H, kv, sc, causal, 128, 128, True,
                               drop, seed)
    do = jax.random.normal(jax.random.key(1), out.shape)
    g_split = A._bwd_call_qkv(qkv, H, kv, out, lse, do, sc, causal,
                              128, 128, True, drop, seed)
    g_blk = A._bwd_call_qkv_fused_blocked(qkv, H, kv, out, lse, do, sc,
                                          causal, 128, 128, True, drop,
                                          seed)
    assert_close(g_blk, g_split, tol=1e-6)
