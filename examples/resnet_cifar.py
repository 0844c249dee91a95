"""CIFAR-style ResNet training on synthetic data (models.resnet).

Functional-tier counterpart of examples/mnist_cnn.py: NHWC ResNet with
GroupNorm, fused SGD-momentum train step, cosine LR. Synthetic 32x32
"images" whose class is encoded as a colour bias, so the loss visibly
drops within a few hundred steps on CPU.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       PYTHONPATH=/root/repo python examples/resnet_cifar.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from neuronika_tpu.models import resnet as R


def synthetic_batch(key, batch, num_classes):
    """Class = position of a bright 8x8 patch on a noisy background.

    A SPATIAL pattern, deliberately: GroupNorm strips global colour/mean
    shifts per sample, so a colour-coded class would be normalised away —
    patch position survives normalisation."""
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (batch,), 0, num_classes)
    x = jax.random.uniform(kx, (batch, 32, 32, 3)) * 0.5
    row = (y % 4) * 8
    col = (y // 4) * 8
    rr = jnp.arange(32)[None, :, None]
    cc = jnp.arange(32)[None, None, :]
    patch = ((rr >= row[:, None, None]) & (rr < row[:, None, None] + 8)
             & (cc >= col[:, None, None]) & (cc < col[:, None, None] + 8))
    return jnp.clip(x + 0.5 * patch[..., None], 0.0, 1.0), y


def main(steps: int = 300, batch: int = 64, classes: int = 10):
    cfg = R.ResNetConfig(stages=(2, 2, 2), width=32, num_classes=classes)
    params = R.init_params(jax.random.key(0), cfg)
    buf = R.momentum_init(params)
    step = R.make_train_step(cfg, momentum=0.9, weight_decay=5e-4)

    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"ResNet {cfg.stages} width={cfg.width}: {n_params/1e6:.2f}M params")

    t0 = time.perf_counter()
    for i in range(steps):
        lr = jnp.float32(0.05 * 0.5 * (1 + jnp.cos(jnp.pi * i / steps)))
        x, y = synthetic_batch(jax.random.fold_in(jax.random.key(1), i),
                               batch, classes)
        params, buf, loss = step(params, buf, x, y, lr)
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.1f}s ({steps/dt:.1f} steps/s)")

    # accuracy on a fresh synthetic batch
    x, y = synthetic_batch(jax.random.key(999), 256, classes)
    acc = (R.forward(params, x, cfg).argmax(-1) == y).mean()
    print(f"synthetic eval accuracy: {float(acc):.2%}")


if __name__ == "__main__":
    main()
