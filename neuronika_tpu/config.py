"""Global configuration for neuronika-tpu.

The reference (neuronika/neuronika) configures itself through Cargo features
(`blas`, `cuda`, `matrixmultiply-threading`, `serialize` — Cargo.toml:22-26).
Here the equivalent switches are runtime flags: the Pallas kernel tier can be
toggled on/off (falling back to pure `jax.lax`), and the global PRNG used by
stochastic ops (dropout, `rand`) is seedable.
"""

from __future__ import annotations

import os
import threading

import jax


class _Config(threading.local):
    def __init__(self) -> None:
        # Use hand-written Pallas kernels for the define-by-run op tier
        # (mm / softmax). Opt-in: XLA's fused dot/softmax is already the
        # speed-of-light path for standalone ops; the kernels exist as the
        # native tier and for fusion experiments. The flash-attention kernel
        # in the transformer is gated separately (auto-on on TPU).
        self.use_pallas: bool = os.environ.get("NEURONIKA_TPU_PALLAS", "0") == "1"
        # Interpret mode for Pallas (useful on CPU test meshes).
        self.pallas_interpret: bool = (
            os.environ.get("NEURONIKA_TPU_PALLAS_INTERPRET", "0") == "1"
        )
        # Conv routing under use_pallas: "auto" consults the measured
        # per-shape route table (ops/pallas/conv.py::route_conv2d — as of
        # the r4 sweep XLA's conv emitter wins every configuration, so
        # auto never pessimises); "force" always takes the direct Pallas
        # kernels (tests / sweeps).
        self.pallas_conv_route: str = os.environ.get(
            "NEURONIKA_TPU_PALLAS_CONV", "auto")
        # Default floating dtype. The reference is f32-only
        # (neuronika-variable/src/lib.rs:43); we keep f32 as the public
        # default and use bf16 internally only where explicitly requested.
        self.default_dtype = "float32"
        self._rng_key = None
        self._rng_counter = 0

    # ------------------------------------------------------------------ rng
    def seed(self, seed: int) -> None:
        """Seed the global PRNG used by `rand`, dropout, shuffles."""
        self._rng_key = jax.random.key(seed)

    def next_key(self):
        """Split one fresh PRNG key off the global stream."""
        if self._rng_key is None:
            self._rng_key = jax.random.key(0x5EED ^ os.getpid())
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub


config = _Config()


def seed(s: int) -> None:
    """Seed the framework-global PRNG stream."""
    config.seed(s)


def enable_pallas(on: bool = True, interpret: bool = False) -> None:
    """Toggle the Pallas op tier. Clears the executor trace caches because
    the kernel choice is baked into compiled tapes."""
    config.use_pallas = bool(on)
    config.pallas_interpret = bool(interpret)
    from ._engine import executor

    executor.clear_cache()


def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. the axon tunnel)."""
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
