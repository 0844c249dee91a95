"""Fine-tune a pretrained HF checkpoint with QLoRA, then serve it.

The round trip a framework switcher actually performs:

1. load a published torch checkpoint (`transformers`) and convert it
   (`utils.hf.from_huggingface`) — here a small random-init GPT-2 stands
   in so the example runs offline;
2. quantize the frozen base to int4 (`lora.qlora_quantize_base`) and
   attach rank-r adapters (`lora.lora_init`);
3. fine-tune adapters only (`lora.make_qlora_train_step`) on a toy
   instruction-shaped dataset, logging through `utils.MetricsLogger`;
4. merge + serve the tuned model with the continuous batcher, sampling
   per-request.

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/finetune_qlora.py
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def main():
    # -- 1. bring a checkpoint ------------------------------------------
    try:
        import torch
        import transformers

        hcfg = transformers.GPT2Config(
            vocab_size=256, n_positions=64, n_embd=64, n_layer=2, n_head=4)
        torch.manual_seed(0)
        hf_model = transformers.GPT2LMHeadModel(hcfg).eval()
        from neuronika_tpu.utils.hf import from_huggingface

        params, cfg = from_huggingface(hf_model, dtype=jnp.float32)
        print(f"imported GPT-2: L={cfg.n_layer} d={cfg.d_model} "
              f"V={cfg.vocab_size}")
    except ImportError:  # transformers not installed: random base
        from neuronika_tpu.models import transformer as T

        cfg = T.GPTConfig(vocab_size=256, n_layer=2, n_head=4, d_model=64,
                          d_ff=256, max_seq=64, dtype=jnp.float32)
        params = T.init_params(jax.random.key(0), cfg)

    from neuronika_tpu.models import lora as LR, transformer as T
    from neuronika_tpu.utils.metrics import MetricsLogger

    # -- 2. int4 base + adapters ----------------------------------------
    qbase = LR.qlora_quantize_base(params)
    adapters = LR.lora_init(jax.random.key(1), params, rank=8)
    print(f"adapter params: {LR.lora_param_count(adapters):,} "
          f"(base frozen at int4)")

    # -- 3. fine-tune on a toy pattern ----------------------------------
    step = LR.make_qlora_train_step(cfg, grad_clip=1.0)
    opt = T.adam_init(adapters)
    rng = np.random.default_rng(0)
    B, S = 8, 32

    def batch():
        # toy "instruction" pattern: respond to byte b with b+1 cyclic
        x = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)
        y = (x + 1) % cfg.vocab_size
        return x, y

    with MetricsLogger(print_every=10, tokens_per_step=B * S) as m:
        for i in range(50):
            x, y = batch()
            adapters, opt, loss = step(qbase, adapters, opt, x, y,
                                       jnp.float32(3e-3), jax.random.key(i))
            m.log(i, loss=loss)

    # -- 4. merge + serve with per-request sampling ---------------------
    tuned = LR.qlora_merge(qbase, adapters, dtype=jnp.float32)
    from neuronika_tpu.serving import ContinuousBatcher

    cb = ContinuousBatcher(tuned, cfg, n_slots=2)
    prompt = np.arange(10, 16, dtype=np.int32)
    greedy = cb.submit(prompt, 8)
    sampled = cb.submit(prompt, 8, temperature=0.8, top_k=20, seed=7)
    out = cb.run()
    print("greedy :", out[greedy])
    print("sampled:", out[sampled])
    print("target :", (np.arange(15, 24) + 1) % cfg.vocab_size)


if __name__ == "__main__":
    main()
