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


def _run_config(T, cfg, B, S, steps):
    key = jax.random.key(0)
    params = T.init_params(key, cfg)
    opt_state = T.adam_init(params)
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
        candidates = [
            (T.GPTConfig(**base, flash="auto", remat=True, flash_block=512),
             64, 1024, 12, "d768 L8 H6 S1024 B64 bf16 flash512+remat"),
            (T.GPTConfig(**base, flash="auto", remat=True, flash_block=512),
             32, 1024, 20, "d768 L8 H6 S1024 B32 bf16 flash512+remat"),
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
