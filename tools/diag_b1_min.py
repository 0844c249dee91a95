"""Minimal repro for the B=1 re-execution stall on the axon platform:
a generic scan-of-dots program, nothing from neuronika_tpu. If this
stalls on its second call at B=1 but not B=2, the pathology is the
platform's executable re-execution, not the framework's decode program.

Run: timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
       python -u tools/diag_b1_min.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax


def main():
    print("device:", jax.devices()[0], flush=True)
    D = 1536

    for B in (1, 2):
        w = jax.random.normal(jax.random.key(0), (8, D, D), jnp.bfloat16)
        x0 = jnp.ones((B, D), jnp.bfloat16)

        @jax.jit
        def f(x, w):
            def tok(x, _):
                def layer(x, wl):
                    return jnp.tanh(x @ wl), None
                x, _ = lax.scan(layer, x, w)
                return x, None
            x, _ = lax.scan(tok, x, None, length=64)
            return x

        t0 = time.perf_counter()
        out = f(x0, w); out.block_until_ready()
        print(f"B={B} call0 (compile): {time.perf_counter()-t0:6.1f}s",
              flush=True)
        for r in (1, 2):
            t0 = time.perf_counter()
            out = f(x0, w); out.block_until_ready()
            print(f"B={B} call{r}: {time.perf_counter()-t0:8.3f}s",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
