"""Ahead-of-time export: serialize compiled programs for serving.

The reference framework's deployment story is "ship the Rust binary" —
the graph is code, so a trained model deploys as source + weights
(reference: /root/reference/src/lib.rs:8-11, examples/quickstart.rs
loads a model from JSON). The TPU-native equivalent is an *exported
StableHLO program*: `jax.export` lowers a jitted function once,
serializes it (portable across processes, machines, and JAX versions
within the compatibility window), and a serving process calls it
without any Python model code, retracing, or recompilation risk.

Typical flow::

    gen = T.make_generate(cfg, max_new=64, quant="int8")
    blob = aot.export_fn(gen, params, prompt, key)     # trace + lower
    aot.save_exported("gpt.nkx", gen, params, prompt, key)
    ...
    call = aot.load_exported("gpt.nkx")                # no model code
    tokens = call(params, prompt, key)

Shapes are fixed at export time (XLA programs are static); export one
artifact per served (batch, prompt-length) bucket, the same bucketing a
serving frontend already does. `platforms` allows cross-platform
export (e.g. lower for TPU from a CPU host) for functions whose
primitives support it.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
from jax import export as _jx


def export_fn(fn: Callable, *example_args,
              platforms: Optional[Sequence[str]] = None) -> bytes:
    """Trace `fn` on `example_args` (concrete arrays or
    `jax.ShapeDtypeStruct`s), lower to StableHLO, and return the
    serialized artifact bytes. `fn` may already be jitted."""
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    exp = _jx.export(jitted, platforms=platforms)(*example_args)
    return bytes(exp.serialize())   # serialize() hands back a bytearray


def load_exported(src) -> Callable:
    """Rebuild a callable from `export_fn` bytes or a file path. The
    returned function runs the exported program (compiled on first
    call for the local backend) — no model code needed."""
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            src = f.read()
    exp = _jx.deserialize(src)
    return exp.call


def save_exported(path, fn: Callable, *example_args,
                  platforms: Optional[Sequence[str]] = None) -> None:
    """`export_fn` straight to a file (conventional suffix: .nkx)."""
    blob = export_fn(fn, *example_args, platforms=platforms)
    with open(path, "wb") as f:
        f.write(blob)
