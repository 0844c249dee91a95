"""Compile-only probe: which (block_q, block_k) configs of the
packed-qkv SPLIT flash backward compile at S=4096 (the tunnel's
compile helper enforces a 16M scoped-VMEM stack; the split dkv kernel
holds whole-S slabs per program plus (bq, bk) f32 tiles). Run alone on
the TPU: python tools/probe_s4096_vmem.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

S, hd, B, H = 4096, 128, 2, 8
W = 3 * H * hd
qkv = jnp.zeros((B, S, W), jnp.bfloat16)

for bq, bk in [(512, 512), (512, 256), (256, 512), (256, 256),
               (1024, 512), (512, 1024)]:
    g = jax.grad(lambda x, bq=bq, bk=bk: flash_attention_qkv(
        x, None, H, H, True, None, bq, bk, False, 0.0, True, False,
    ).astype(jnp.float32).sum())
    try:
        jax.jit(g).lower(qkv).compile()
        print(f"bq={bq} bk={bk}: compile OK", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = msg[msg.find("Scoped allocation"):][:70] if \
            "Scoped allocation" in msg else msg[:110].replace("\n", " ")
        print(f"bq={bq} bk={bk}: FAIL {key}", flush=True)
print("DONE", flush=True)
