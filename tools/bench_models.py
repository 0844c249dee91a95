"""Model-zoo training throughput on the local TPU — covers the BASELINE
configs beyond the GPT flagship: MNIST-CNN (configs[1], define-by-run,
Adam+dropout+L2), char-LSTM (configs[2], dynamic lengths through the
trace cache), plus the functional-tier ResNet18-CIFAR and ViT-tiny.

Functional models use the two-length chain method (RTT cancels); the
define-by-run models time a dispatch loop with ONE final sync — the
per-step Python/dispatch overhead is the quantity of interest there.

Run: timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/bench_models.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def chain_time(step_fn, x0, iters=8, reps=3):
    f = jax.jit(lambda x, n: lax.fori_loop(
        0, n, lambda i, x: step_fn(x), x))

    def run(x, n):
        leaf = jax.tree.leaves(f(x, jnp.int32(n)))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(x0, iters); run(x0, 4 * iters)
    t1s, t4s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(x0, iters); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(x0, 4 * iters); t4s.append(time.perf_counter() - t0)
    return max(sorted(t4s)[len(t4s)//2] - sorted(t1s)[len(t1s)//2],
               1e-9) / (3 * iters)


def bench_resnet():
    from neuronika_tpu.models import resnet as R

    cfg = R.ResNetConfig(dtype=jnp.bfloat16)  # resnet18-cifar
    p = R.init_params(jax.random.key(0), cfg)
    buf = R.momentum_init(p)
    B = 256
    x = jax.random.uniform(jax.random.key(1), (B, 32, 32, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(2), (B,), 0, cfg.num_classes)
    step = R.make_train_step(cfg, weight_decay=5e-4)

    def one(st):
        p, buf = st
        p, buf, _ = step(p, buf, x, y, jnp.float32(0.1))
        return (p, buf)

    dt = chain_time(one, (p, buf))
    print(f"resnet18-cifar B={B}: {dt*1e3:7.2f} ms/step "
          f"({B/dt:8.0f} img/s)", flush=True)


def bench_vit():
    from neuronika_tpu.models import vit as V
    from neuronika_tpu.optim.functional import adam_init

    cfg = V.ViTConfig(dtype=jnp.bfloat16)  # vit-tiny/4 on 32x32
    p = V.init_params(jax.random.key(0), cfg)
    o = adam_init(p)
    B = 256
    x = jax.random.uniform(jax.random.key(1), (B, 32, 32, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(2), (B,), 0, cfg.num_classes)
    step = V.make_train_step(cfg)

    def one(st):
        p, o = st
        p, o, _ = step(p, o, x, y, jnp.float32(1e-3))
        return (p, o)

    dt = chain_time(one, (p, o))
    print(f"vit-tiny/4 B={B}:     {dt*1e3:7.2f} ms/step "
          f"({B/dt:8.0f} img/s)", flush=True)


def bench_mnist_cnn():
    import neuronika_tpu as nk
    from neuronika_tpu import models, optim

    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (64, 1, 28, 28)).astype(np.float32)
    Y = rng.integers(0, 10, 64).astype(np.float32)
    cnn = models.MnistCNN(channels=8, hidden=32, dropout=0.25)
    opt = optim.Adam(1e-3, penalty=optim.L2(1e-4))
    opt.register_all(cnn.parameters())

    def one_step():
        # fused fwd+bwd+Adam single program (the TPU fast path),
        # non-blocking so the loop stays pipelined through the tunnel
        logits = cnn.forward(nk.from_ndarray(X))
        loss = logits.log_softmax(1).t().nll(
            nk.from_ndarray(Y), nk.Reduction.Mean)
        opt.train_step(loss, block=False)
        return loss

    for _ in range(3):
        one_step().item()  # compile + warm
    t0 = time.perf_counter()
    n = 30
    loss = None
    for _ in range(n):
        loss = one_step()
    loss.item()  # single final sync
    dt = (time.perf_counter() - t0) / n
    print(f"mnist-cnn (define-by-run, Adam+dropout+L2) B=64: "
          f"{dt*1e3:7.2f} ms/step ({1/dt:6.1f} steps/s)", flush=True)


def bench_char_lstm():
    import neuronika_tpu as nk  # noqa: F401
    from neuronika_tpu import models, optim

    rng = np.random.default_rng(0)
    rnn = models.CharRNN(vocab=32, hidden=96, cell="lstm")
    opt = optim.Adam(1e-2)
    opt.register_all(rnn.parameters())
    lengths = [8, 12, 16]
    batches = {
        T: (rng.integers(0, 32, (8, T)), rng.integers(0, 32, (8, T)))
        for T in lengths
    }

    def one_step(T):
        b, t = batches[T]
        loss = rnn.loss(b, t)
        opt.train_step(loss, block=False)
        return loss

    for T in lengths:
        one_step(T).item()  # one compile per length (trace cache)
    t0 = time.perf_counter()
    n = 30
    loss = None
    for i in range(n):
        loss = one_step(lengths[i % 3])
    loss.item()
    dt = (time.perf_counter() - t0) / n
    print(f"char-lstm (define-by-run, 3 bucketed lengths) B=8: "
          f"{dt*1e3:7.2f} ms/step ({1/dt:6.1f} steps/s)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    for fn in (bench_resnet, bench_vit, bench_mnist_cnn, bench_char_lstm):
        try:
            fn()
        except Exception:  # noqa: BLE001
            import traceback
            traceback.print_exc()
    print("done", flush=True)


if __name__ == "__main__":
    main()
