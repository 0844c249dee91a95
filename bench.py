"""Headline benchmark: mini GPT-2 training throughput on one TPU chip.

The reference publishes no numbers (BASELINE.md), so the target is the TPU
roofline: BASELINE.json's north star asks for >=80% of roofline on the
matmul-dominated path. This bench times the flagship fused train step
(fwd + bwd + Adam, bf16 matmuls / f32 accumulate) and reports:

  value        = training throughput, tokens/sec
  vs_baseline  = measured model-FLOPs utilisation (MFU) divided by the 0.80
                 roofline target — >= 1.0 means the target is met.

Timing methodology: this chip sits behind a network tunnel, so each synced
step pays a host<->device round trip. We time fully-synced steps
(float(loss) forces the round trip) and subtract the median RTT of an empty
fetch; the async enqueue-then-block pattern under-reports on this
experimental PJRT platform.

Config fallbacks: if the preferred configuration fails (backend
FailedPrecondition / OOM through the tunnel), progressively smaller or
flash-off configs are tried so a JSON line is always produced.

Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp


# v5e (TPU v5 lite) bf16 peak; other platforms fall back to a conservative
# figure so the script still runs on CPU test boxes.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5": 197e12,
    "TPU v4": 275e12,
}


def _device_peak() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 1e12  # CPU fallback — numbers then only meaningful relatively


def _bench_quickstart_mlp(steps: int = 50) -> float:
    """BASELINE configs[0]: quickstart MLP (Linear+ReLU, MSE, SGD) through
    the define-by-run API with the fused train step. Returns steps/sec."""
    import numpy as np

    import neuronika_tpu as nk
    from neuronika_tpu import models, optim

    nk.seed(0)
    mlp = models.MLP((3, 5, 5, 1))
    opt = optim.SGD(0.01, optim.L2(0.0))
    opt.register_all(mlp.parameters())
    X = np.random.rand(64, 3).astype("float32")
    Y = np.random.rand(64, 1).astype("float32")

    def one_step(block=False):
        loss = mlp.forward(nk.from_ndarray(X)).mse(
            nk.from_ndarray(Y), nk.Reduction.Mean
        )
        opt.train_step(loss, block=block)
        return loss

    one_step(block=True)  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = one_step()
    loss.item()  # drain the pipelined steps
    return steps / (time.perf_counter() - t0)


def _measure_rtt():
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(tiny(z))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(tiny(z))
        rtts.append(time.perf_counter() - t0)
    return sorted(rtts)[len(rtts) // 2]


def _timed_chain(step_fn, x0, rtt, iters=32, reps=5):
    """Per-iteration time of a self-chaining kernel: y = step_fn(x) with
    y.shape == x.shape (pytrees ok), run inside ONE jitted fori_loop (the
    sequential dependency defeats both XLA constant-folding and overlap).
    Two-length difference method: RTT and all per-call constants cancel
    exactly (subtracting a separately measured RTT leaves ±10 ms tunnel
    jitter that poisons sub-ms kernels). `rtt` is unused, kept for
    signature stability."""
    from jax import lax

    def loop(n):
        return jax.jit(lambda x: lax.fori_loop(
            0, n, lambda i, x: step_fn(x), x))

    f1, f4 = loop(iters), loop(4 * iters)

    def run(f, x):
        leaf = jax.tree.leaves(f(x))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(f1, x0)
    run(f4, x0)  # compile both
    t1s, t4s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(f1, x0)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(f4, x0)
        t4s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[len(t1s) // 2]
    t4 = sorted(t4s)[len(t4s) // 2]
    return max(t4 - t1, 1e-9) / (3 * iters)


def _kernel_rooflines(peak: float) -> dict:
    """Roofline fractions for the hot kernels (VERDICT r1 #3: these belong
    in the driver-captured artifact, not in docstrings). Loop-amortised
    verified-sync timing (see _timed_chain)."""
    out = {}
    rtt = _measure_rtt()
    try:
        from neuronika_tpu.ops.pallas.matmul import matmul as pmm

        M = N = K = 4096
        a = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
        b = jax.random.normal(jax.random.key(1), (K, N),
                              jnp.bfloat16) / (K ** 0.5)
        dt = _timed_chain(lambda x: pmm(
            x, b, bm=512, bn=1024, bk=512).astype(jnp.bfloat16), a, rtt)
        out["matmul_mfu"] = round(2 * M * N * K / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    try:
        from neuronika_tpu.ops.pallas.attention import flash_attention

        B, H, S, D = 4, 8, 2048, 128
        q, k, v = (
            jax.random.normal(jax.random.key(i), (B, H, S, D), jnp.bfloat16)
            for i in range(3)
        )
        fl = 2 * B * H * S * S * D  # causal
        dt = _timed_chain(
            lambda x: flash_attention(x, k, v, True, None, 512, 512), q, rtt)
        out["flash_fwd_mfu"] = round(fl / dt / peak, 4)
        g = jax.grad(
            lambda q, k, v: flash_attention(
                q, k, v, True, None, 512, 512).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))

        def chain(x):
            dq, dk, dv = g(x, k, v)  # consume ALL grads (else DCE)
            return jnp.tanh(dq + dk + dv).astype(jnp.bfloat16)

        dt = _timed_chain(chain, q, rtt, iters=16)
        out["flash_fwdbwd_mfu"] = round((fl * 9 // 2) / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    try:
        from jax import lax

        B, C, HW = 64, 256, 56
        x = jax.random.normal(jax.random.key(0), (B, C, HW, HW), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (C, C, 3, 3),
                              jnp.bfloat16) / (C * 9) ** 0.5

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        fl = 2 * B * C * C * 9 * HW * HW
        dt = _timed_chain(lambda x: conv(x, w), x, rtt)
        out["conv2d_fwd_mfu"] = round(fl / dt / peak, 4)
        g = jax.grad(lambda x, w: conv(x, w).astype(jnp.float32).sum(),
                     argnums=(0, 1))

        def chain(state):
            # carry BOTH grads: consuming dw via a scalar lets XLA's
            # simplifier collapse the weight-grad conv (MFU read > 1)
            x_, wa = state
            dx, dw = g(x_, w)
            return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw

        dt = _timed_chain(chain, (x, jnp.zeros_like(w, jnp.float32)), rtt,
                          iters=16)
        out["conv2d_fwdbwd_mfu"] = round(3 * fl / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    try:
        from neuronika_tpu.ops.pallas.conv import conv2d_direct_nhwc

        B, C, HW = 64, 256, 56
        xh = jax.random.normal(jax.random.key(0), (B, HW, HW, C),
                               jnp.bfloat16)
        wh = jax.random.normal(jax.random.key(1), (3, 3, C, C),
                               jnp.bfloat16) / (C * 9) ** 0.5
        flv = 2 * B * C * C * 9 * (HW - 2) * (HW - 2)

        def chain(x):
            y = conv2d_direct_nhwc(x, wh)  # VALID: (HW-2)^2
            return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))

        dt = _timed_chain(chain, xh, rtt)
        out["pallas_conv2d_fwd_mfu"] = round(flv / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    return out


def _run_config(T, cfg, B, S, steps):
    key = jax.random.key(0)
    params = T.init_params(key, cfg)
    opt_state = T.opt_init(params, cfg)
    step = T.make_train_step(cfg)

    tokens = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    targets = jax.random.randint(jax.random.key(2), (B, S), 0, cfg.vocab_size)
    lr = jnp.float32(3e-4)

    params, opt_state, loss = step(params, opt_state, tokens, targets, lr, key)
    float(loss)  # warmup / compile / first full round trip

    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(tiny(z))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(tiny(z))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        params, opt_state, loss = step(
            params, opt_state, tokens, targets, lr, jax.random.fold_in(key, i)
        )
        lv = float(loss)
        times.append(time.perf_counter() - t0)
    dt = max(sorted(times)[len(times) // 2] - rtt, 1e-6)
    return dt, rtt, lv


def main() -> None:
    from neuronika_tpu.models import transformer as T

    on_tpu = jax.devices()[0].platform != "cpu"
    # head_dim 128 (n_head=6) fills the MXU lanes — measured +34% MFU over
    # head_dim 64; flash_block 512 is another ~+8% (stage sweeps, v5e).
    base = dict(
        vocab_size=16384, n_layer=8, n_head=6, d_model=768, d_ff=3072,
        max_seq=1024, dropout=0.0, dtype=jnp.bfloat16,
    )
    if on_tpu:
        # r2 sweep winners (tools/sweep_r2.py): unrolled layers (the scan's
        # residual stacking cost ~29% of the step in the profile) + no
        # remat at B48, packed-qkv flash @ block 1024, compute-dtype
        # matmul outputs. Scan/remat variants as fallbacks.
        champion = dict(
            flash="auto", remat=False, scan_layers=False, flash_block=1024,
            matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
        )
        candidates = [
            (T.GPTConfig(**base, **champion),
             48, 1024, 16,
             "d768 L8 H6 S1024 B48 bf16 unroll+noremat+fastsm+fusedbwd"),
            (T.GPTConfig(**base, flash="auto", remat=False,
                         scan_layers=False, flash_block=1024,
                         matmul_out="compute"),
             48, 1024, 16, "d768 L8 H6 S1024 B48 bf16 unroll+noremat"),
            (T.GPTConfig(**base, flash="auto", remat=True, flash_block=1024,
                         remat_policy="names", matmul_out="compute"),
             64, 1024, 12, "d768 L8 H6 S1024 B64 bf16 scan+names"),
            (T.GPTConfig(**base, flash="off", remat=False), 8, 1024, 20,
             "d768 L8 H6 S1024 B8 bf16 xla-attn"),
        ]
    else:
        cpu_cfg = T.GPTConfig(
            vocab_size=256, n_layer=2, n_head=4, d_model=128, d_ff=512,
            max_seq=128, dropout=0.0, dtype=jnp.float32,
        )
        candidates = [(cpu_cfg, 2, 128, 3, "cpu-smoke")]

    dt = rtt = lv = None
    label = "none"
    errors = []
    cfg = B = S = None
    for cfg, B, S, steps, label in candidates:
        try:
            dt, rtt, lv = _run_config(T, cfg, B, S, steps)
            break
        except Exception as e:  # noqa: BLE001 - fall to next config
            errors.append(f"{label}: {type(e).__name__}")
            traceback.print_exc()
            dt = None
    if dt is None:
        print(json.dumps({
            "metric": "gpt2_mini_train_tokens_per_sec",
            "value": 0.0, "unit": "tokens/s", "vs_baseline": 0.0,
            "detail": {"error": "; ".join(errors)},
        }))
        return

    tokens_per_step = B * S
    tok_per_sec = tokens_per_step / dt
    flops_per_step = T.flops_per_token(cfg, S) * tokens_per_step
    mfu = flops_per_step / dt / _device_peak()

    try:
        mlp_sps = round(_bench_quickstart_mlp(), 1)
    except Exception:  # noqa: BLE001
        mlp_sps = None

    rooflines = _kernel_rooflines(_device_peak()) if on_tpu else {}

    # scale demo: MFU rises with d_model (the d768 body is bandwidth-bound
    # — sweep: d1024 0.597, d1536 0.623); report one larger shape so the
    # artifact shows the framework's ceiling, not just the mini config.
    scale_mfu = None
    if on_tpu:
        try:
            cfg_l = T.GPTConfig(
                vocab_size=16384, n_layer=8, n_head=12, d_model=1536,
                d_ff=6144, max_seq=1024, dropout=0.0, dtype=jnp.bfloat16,
                flash="auto", remat=False, scan_layers=False,
                flash_block=1024, matmul_out="compute",
                flash_softmax="fast", flash_bwd="fused",
            )
            dt_l, _, _ = _run_config(T, cfg_l, 24, 1024, 8)
            scale_mfu = round(
                T.flops_per_token(cfg_l, 1024) * 24 * 1024 / dt_l
                / _device_peak(), 4)
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    print(
        json.dumps(
            {
                "metric": "gpt2_mini_train_tokens_per_sec",
                "value": round(tok_per_sec, 1),
                "unit": "tokens/s",
                "vs_baseline": round(mfu / 0.80, 4),
                "detail": {
                    "mfu": round(mfu, 4),
                    "step_ms": round(dt * 1e3, 2),
                    "rtt_ms": round(rtt * 1e3, 2),
                    "quickstart_mlp_steps_per_sec": mlp_sps,
                    "kernel_rooflines": rooflines or None,
                    "scale_demo_mfu_d1536": scale_mfu,
                    "loss": lv,
                    "device": str(jax.devices()[0]),
                    "config": label,
                    "fallbacks": errors or None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
