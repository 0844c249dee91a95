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

Output protocol (VERDICT r4 #1 — BENCH_r04's single giant line outgrew
the driver's 2000-char capture tail and the flagship headline was never
machine-recorded): the FULL detail dict is printed on its own earlier
stdout line, and the LAST line is a compact headline JSON (metric /
value / unit / vs_baseline + a small summary detail) hard-capped well
under the capture window, so `parsed.vs_baseline` always exists.
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


def _bench_var_api_gpt(peak: float, steps: int = 8) -> dict:
    """VERDICT r2 #7 / r3 #1: the define-by-run (Var/VarDiff) tier's GPT
    through `Optimizer.train_step` (the fused forward+backward+Adam XLA
    program) — the reference's training loop is define-by-run, so the
    parity API's throughput belongs in the artifact next to the
    functional tier's.

    Headline: the batched bf16 path (`build_var_model_batched`, B=16) on
    the tier's TPU-native ops — fused-qkv `matmul` + the `flash_attention`
    Var op (the SAME packed-layout Pallas kernel with the fused single-pass
    backward that the functional flagship runs). A like-for-like functional
    step at the IDENTICAL shape is timed in the same process so
    `ratio_vs_functional` compares apples to apples. The r1-r3 legacy
    config (one (S,) sequence, f32, 2-d primitive-op attention — the
    reference's Ix2 vocabulary) is kept as `legacy_2d` for continuity."""
    import numpy as np

    import neuronika_tpu as nk
    from neuronika_tpu import optim
    from neuronika_tpu.models import transformer as T

    S, B = 1024, 16
    cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6, d_model=768,
                      d_ff=3072, max_seq=S, dtype=jnp.bfloat16, dropout=0.0,
                      flash="auto", flash_block=512)
    nk.seed(0)
    np.random.seed(0)
    params, fwd = T.build_var_model_batched(cfg, batch=B, seq=S)
    opt = optim.Adam(1e-4)
    opt.register_all(params)
    ids = np.random.randint(0, cfg.vocab_size, (B, S)).astype("float32")
    tgt = np.roll(ids, -1, axis=1).reshape(-1)

    # graph-reuse pattern (the reference supports re-forward on the same
    # tape): build ONCE, swap leaf data per step — isolates the fused
    # step's replay cost from Python graph construction
    xv = nk.from_ndarray(ids)
    tv = nk.from_ndarray(tgt)
    loss = fwd(xv).reshape((B * S, cfg.vocab_size)).log_softmax(1).t().nll(
        tv, nk.Reduction.Mean)

    def reuse_step(block=False):
        xv.node.value = jnp.asarray(ids)
        tv.node.value = jnp.asarray(tgt)
        opt.train_step(loss, block=block)

    reuse_step(block=True)  # trace + compile + first sync
    for _ in range(3):      # drain async compile tails before timing
        reuse_step()
    float(loss.item())
    t0 = time.perf_counter()
    for _ in range(steps):
        reuse_step()
    lv = float(loss.item())  # drain the pipelined steps
    dt = (time.perf_counter() - t0) / steps
    out = {
        "tokens_per_sec": round(B * S / dt, 1),
        "mfu": round(T.flops_per_token(cfg, S) * B * S / dt / peak, 4),
        "loss": round(lv, 4),
        "config": ("var-api batched d768 L8 H6 S1024 B16 bf16 flash "
                   "fused Adam step"),
    }

    # like-for-like functional twin at the IDENTICAL shape (same cfg/B/S)
    try:
        dt_f, _, _, _ = _run_config(T, cfg, B, S, 8)
        out["functional_same_shape_tokens_per_sec"] = round(B * S / dt_f, 1)
        out["ratio_vs_functional"] = round(dt_f / dt, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()

    # VERDICT r4 #4: the Var tape at the FLAGSHIP shape (d1536 L8 H12
    # S2048 B16 bf16, flash_block 512 — the README headline config), with
    # its functional twin timed in the same process. The r4 'no longer
    # the slow path' claim was proven at d768 only; this row proves (or
    # bounds) it at the shape the headline MFU is measured at.
    try:
        Sf, Bf = 2048, 16
        cfg_f = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=12,
                            d_model=1536, d_ff=6144, max_seq=Sf,
                            dtype=jnp.bfloat16, dropout=0.0,
                            flash="auto", flash_block=512)
        nk.seed(0)
        np.random.seed(0)
        params_f, fwd_f = T.build_var_model_batched(cfg_f, batch=Bf,
                                                    seq=Sf)
        opt_f = optim.Adam(1e-4)
        opt_f.register_all(params_f)
        ids_f = np.random.randint(0, cfg_f.vocab_size,
                                  (Bf, Sf)).astype("float32")
        tgt_f = np.roll(ids_f, -1, axis=1).reshape(-1)
        xf, tf = nk.from_ndarray(ids_f), nk.from_ndarray(tgt_f)
        loss_f = fwd_f(xf).reshape(
            (Bf * Sf, cfg_f.vocab_size)).log_softmax(1).t().nll(
            tf, nk.Reduction.Mean)

        def fstep(block=False):
            xf.node.value = jnp.asarray(ids_f)
            tf.node.value = jnp.asarray(tgt_f)
            opt_f.train_step(loss_f, block=block)

        fstep(block=True)
        for _ in range(3):
            fstep()
        float(loss_f.item())
        t0 = time.perf_counter()
        for _ in range(6):
            fstep()
        float(loss_f.item())
        dt_vf = (time.perf_counter() - t0) / 6
        flag = {
            "tokens_per_sec": round(Bf * Sf / dt_vf, 1),
            "mfu": round(T.flops_per_token(cfg_f, Sf) * Bf * Sf
                         / dt_vf / peak, 4),
            "config": "var-api batched d1536 L8 H12 S2048 B16 bf16 "
                      "fb512 flash fused Adam step",
        }
        # free the Var model's HBM before its functional twin runs:
        # with both d1536 models + Adam states co-resident the twin
        # measured 0.60 MFU vs its 0.81 standalone (r5) — the ratio
        # would flatter the Var tier. The headline `mfu` (same cfg,
        # measured first in this process) is the cross-check.
        import gc

        del params_f, opt_f, xf, tf, loss_f, fwd_f, fstep
        gc.collect()
        try:
            dt_ff, _, _, _ = _run_config(T, cfg_f, Bf, Sf, 8)
            flag["functional_same_shape_tokens_per_sec"] = round(
                Bf * Sf / dt_ff, 1)
            flag["ratio_vs_functional"] = round(dt_ff / dt_vf, 4)
        except Exception:  # noqa: BLE001
            traceback.print_exc()
        out["flagship"] = flag
    except Exception:  # noqa: BLE001
        traceback.print_exc()

    # legacy 2-d config (rounds 1-3's number): one (S,) sequence per
    # graph, f32, attention from the reference's 2-d primitive ops
    try:
        cfg2 = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6,
                           d_model=768, d_ff=3072, max_seq=S,
                           dtype=jnp.float32)
        nk.seed(0)
        np.random.seed(0)
        params2, fwd2 = T.build_var_model(cfg2, batch=1, seq=S)
        opt2 = optim.Adam(1e-4)
        opt2.register_all(params2)
        ids2 = np.random.randint(0, cfg2.vocab_size, (S,)).astype("float32")
        tgt2 = np.roll(ids2, -1)
        xv2, tv2 = nk.from_ndarray(ids2), nk.from_ndarray(tgt2)
        l2 = fwd2(xv2).log_softmax(1).t().nll(tv2, nk.Reduction.Mean)

        def step2(block=False):
            xv2.node.value = jnp.asarray(ids2)
            tv2.node.value = jnp.asarray(tgt2)
            opt2.train_step(l2, block=block)

        step2(block=True)
        for _ in range(3):
            step2()
        float(l2.item())
        t0 = time.perf_counter()
        for _ in range(steps):
            step2()
        float(l2.item())
        dt2 = (time.perf_counter() - t0) / steps
        out["legacy_2d"] = {
            "tokens_per_sec": round(S / dt2, 1),
            "mfu": round(T.flops_per_token(cfg2, S) * S / dt2 / peak, 4),
            "config": "var-api d768 L8 H6 S1024 B1 f32 2-d primitive ops",
        }
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    return out


def _bench_serving_matrix() -> dict:
    """VERDICT r3 #3: the serving tier's perf claims, measured into the
    artifact. Four comparisons, all on the batcher API the features ship
    in (multi-step decode windows amortise the tunnel's per-step round
    trip so device-side differences are visible):

      * dense (ContinuousBatcher) vs paged (PagedBatcher) new-token
        throughput at B in {8, 32} slots on a mixed workload (prompt
        lengths {32, 64, 128}, budgets {32, 48, 64, 96} — drawn from
        small bucket sets so prefill shapes compile once each);
      * the paged-attention Pallas kernel on vs off (same paged setup);
      * chunked prefill's latency SLO: a long prompt admitted mid-decode
        — the co-running request's MAX inter-token gap and the long
        request's TTFT, chunk off vs on (d1536, per-step driving:
        chunking is a latency feature, so the window amortisation is
        deliberately NOT applied here);
      * S-LoRA: mixed-adapter batches vs the base-only batcher.
    """
    import numpy as np

    from neuronika_tpu.models import transformer as T
    from neuronika_tpu.serving import ContinuousBatcher, PagedBatcher

    cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6, d_model=768,
                      d_ff=3072, max_seq=512, dropout=0.0,
                      dtype=jnp.bfloat16, flash="auto")
    params = T.init_params(jax.random.key(0), cfg)
    quant = "int8"
    out = {"config": ("d768 L8 hd128 int8 max_seq512; 24 reqs, "
                      "P in {32,64,128}, new in {32,48,64,96}, "
                      "multi_step 8, deferred burst submit (grouped "
                      "prefill on the dense batcher); timed window = "
                      "submit + prefill + decode")}

    def workload(n=24):
        rng = np.random.default_rng(0)
        return [
            (rng.integers(1, cfg.vocab_size,
                          (int(rng.choice([32, 64, 128])),)).astype(np.int32),
             int(rng.choice([32, 48, 64, 96])))
            for _ in range(n)
        ]

    def drive(batcher, adapters=False, n=24):
        rng = np.random.default_rng(1)
        toks = dt = 0
        for _ in range(2):             # pass 0 warms compiles; pass 1 times
            t0 = time.perf_counter()
            with batcher.defer_admission():   # burst arrival: the dense
                # batcher admits same-bucket prompts in grouped prefills
                for i, (p, m) in enumerate(workload(n)):
                    batcher.submit(p, m, adapter=int(rng.integers(0, 3))
                                   if adapters else 0)
            done = batcher.run(multi_step=8)
            dt = time.perf_counter() - t0
            toks = sum(len(v) for v in done.values())
        return round(toks / dt, 1)

    for B in (8, 32):
        try:
            out[f"dense_B{B}_tok_s"] = drive(
                ContinuousBatcher(params, cfg, n_slots=B, quant=quant))
        except Exception:  # noqa: BLE001
            traceback.print_exc()
        try:
            # kernel="auto" (the shipped default): routes the Pallas
            # kernel OFF inside decode windows (measured 4x slower
            # there, see paged_window_kernel below + the r5 capacity
            # probe) and ON for per-step decode. r4 forced "on", which
            # hobbled the paged rows by that same factor.
            out[f"paged_B{B}_tok_s"] = drive(PagedBatcher(
                params, cfg, n_slots=B, n_blocks=64 + 15 * B,
                block_size=16, quant=quant, kernel="auto"))
        except Exception:  # noqa: BLE001
            traceback.print_exc()
    # paged-attention kernel on vs off, measured at the PROGRAM level
    # (VERDICT r4 #6: the r4 batcher-level rows were byte-identical —
    # end-to-end batcher time is host/RTT-dominated at this scale, so the
    # comparison recorded nothing). Here the decode_many window program
    # itself is timed: 32 calls x k=8 steps, one value-fetch sync, with
    # every slot's table full to max_seq so the attention read is the
    # whole cache — the regime the kernel exists for.
    try:
        out["paged_window_kernel"] = _paged_kernel_ms(
            T, cfg, quant, B=8, BS=16, k=8)
    except Exception:  # noqa: BLE001
        traceback.print_exc()

    # S-LoRA: two rank-8 adapters over qkv/proj, requests spread across
    # {base, a1, a2} in one batch, vs the base-only number above
    try:
        from neuronika_tpu.models.lora import lora_init

        cb = ContinuousBatcher(params, cfg, n_slots=8, quant=quant)
        cb.register_adapter(lora_init(jax.random.key(1), params, 8))
        cb.register_adapter(lora_init(jax.random.key(2), params, 8))
        out["slora_mixed_B8_tok_s"] = drive(cb, adapters=True)
    except Exception:  # noqa: BLE001
        traceback.print_exc()

    # chunked prefill: d1536 so the monolithic prefill stall is well
    # above tunnel jitter; a 48-token decode is mid-flight when an
    # 896-token prompt arrives
    try:
        cfg_c = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=12,
                            d_model=1536, d_ff=6144, max_seq=1024,
                            dropout=0.0, dtype=jnp.bfloat16, flash="auto")
        params_c = T.init_params(jax.random.key(0), cfg_c)
        long_prompt = np.arange(1, 897, dtype=np.int32) % 16000 + 1
        victim_prompt = np.array([1, 2, 3, 4], np.int32)

        def chunk_case(chunk, trials=5):
            # VERDICT r4 #3: the feature bounds a ~30 ms stall while the
            # tunnel jitters at the same scale — a single arrival cannot
            # resolve the effect. One warm pass, then `trials` measured
            # arrivals; report per-trial MEDIANS plus the spread of the
            # victim's max gap so the margin is checkable against jitter.
            cb = ContinuousBatcher(params_c, cfg_c, n_slots=2,
                                   quant=quant, prefill_chunk=chunk)
            maxes, means, ttfts = [], [], []
            for trial in range(trials + 1):
                stamps, first_long = [], []
                cb.submit(victim_prompt, 48,
                          on_token=lambda rid, t: stamps.append(
                              time.perf_counter()))
                for _ in range(8):      # victim decodes alone first
                    cb.step()
                t_sub = time.perf_counter()
                cb.submit(long_prompt, 8,
                          on_token=lambda rid, t: first_long.append(
                              time.perf_counter() - t_sub))
                cb.run()
                if trial == 0:
                    continue            # warm pass: compiles
                gaps = np.diff(np.asarray(stamps))
                maxes.append(float(gaps.max()) * 1e3)
                means.append(float(gaps.mean()) * 1e3)
                ttfts.append(first_long[0])
            med = lambda v: sorted(v)[len(v) // 2]
            return {"victim_itl_max_ms": round(med(maxes), 2),
                    "victim_itl_max_spread_ms":
                        round(max(maxes) - min(maxes), 2),
                    "victim_itl_mean_ms": round(med(means), 2),
                    "long_ttft_s": round(med(ttfts), 4),
                    "trials": len(maxes)}

        out["chunked_prefill"] = {
            "off": chunk_case(None), "on_128": chunk_case(128),
            "config": "d1536 int8: 896-tok prompt admitted mid-decode, "
                      "per-step driving; medians over 5 arrivals",
        }
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    return out


def _paged_kernel_ms(T, cfg, quant, B=8, BS=16, k=8, calls=32) -> dict:
    """Per-step device time of the windowed paged-decode program with the
    block-table Pallas kernel on vs off. Full tables (pos near max_seq)
    so both paths read the whole cache; `calls` async window dispatches
    amortise the tunnel RTT into a >0.2 s measured span."""
    import numpy as np  # noqa: F401

    MB = -(-cfg.max_seq // BS)
    NB = 1 + B * MB
    table = jnp.arange(1, NB, dtype=jnp.int32).reshape(B, MB)
    tokens = jnp.full((B,), 5, jnp.int32)
    active = jnp.ones((B,), bool)
    seeds = jnp.zeros((B,), jnp.uint32)
    zi = jnp.zeros((B,), jnp.int32)
    zf = jnp.zeros((B,), jnp.float32)
    params = T.init_params(jax.random.key(0), cfg)
    rtt = _measure_rtt()
    out = {"config": f"decode_many k={k} B={B} cap={cfg.max_seq} "
                     f"tables full; {calls} async windows per rep, "
                     f"median of 3"}
    pos0v = cfg.max_seq - k - 2
    for kern in ("on", "off"):
        many = T.make_paged_decode_many(cfg, BS, k, quant=quant,
                                        kernel=kern)
        cache = T.init_paged_cache(cfg, NB, BS, B)

        def window(cache):
            # fresh pos array per call: the program donates the cache,
            # so a shared pos buffer would be use-after-donate
            cache = dict(cache, pos=jnp.full((B,), pos0v, jnp.int32))
            toks, cache = many(params, cache, tokens, active, table,
                               seeds, zi, zf, zi, zf, zf)
            return toks, cache

        toks, cache = window(cache)          # compile + warm
        float(jnp.asarray(toks)[0, 0])
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(calls):
                toks, cache = window(cache)
            float(jnp.asarray(toks)[0, 0])   # one sync per rep
            reps.append((time.perf_counter() - t0 - rtt) / (calls * k))
        out[f"{kern}_ms_per_step"] = round(
            sorted(reps)[1] * 1e3, 3)
    if out.get("on_ms_per_step") and out.get("off_ms_per_step"):
        out["off_over_on"] = round(
            out["off_ms_per_step"] / out["on_ms_per_step"], 3)
    return out


def _bench_paged_capacity() -> dict:
    """VERDICT r4 #2: the paged batcher's capacity claim, measured.

    Fixed KV-HBM budget = 8 dense slots x max_seq=1024 tokens (the dense
    cache reserves max_seq per slot regardless of use). The paged pool
    holds the SAME 8192 cached tokens (512 x 16-token blocks + scratch)
    but admits requests by their ACTUAL footprint (prompt+budget <= 128
    tokens = 8 blocks here), so the identical HBM serves 32 concurrent
    requests instead of 8 — decode then amortises each weight pass over
    4x the rows. Reports aggregate new-token throughput and the observed
    peak concurrency for both batchers on the same 32-request workload.
    Reference pitch: docs/SERVING.md 'paged KV'; vLLM's founding claim."""
    import numpy as np

    from neuronika_tpu.models import transformer as T
    from neuronika_tpu.serving import ContinuousBatcher, PagedBatcher

    cfg = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=6, d_model=768,
                      d_ff=3072, max_seq=1024, dropout=0.0,
                      dtype=jnp.bfloat16, flash="auto")
    params = T.init_params(jax.random.key(0), cfg)
    budget_tokens = 8 * cfg.max_seq

    def workload(n=32):
        rng = np.random.default_rng(2)
        return [
            (rng.integers(1, cfg.vocab_size,
                          (int(rng.choice([32, 64])),)).astype(np.int32),
             int(rng.choice([48, 64])))
            for _ in range(n)
        ]

    def drive(batcher):
        toks = dt = peak = 0
        for _ in range(2):               # pass 0 warms compiles
            peak = 0
            t0 = time.perf_counter()
            with batcher.defer_admission():
                for p, m in workload():
                    batcher.submit(p, m)
            steps = 0
            while ((batcher._running or batcher._queue)
                   and steps < 10000):
                batcher.step_many(8)
                peak = max(peak, len(batcher._running))
                steps += 1
            dt = time.perf_counter() - t0
            toks = sum(len(v) for v in batcher._finished.values())
            batcher._finished.clear()
        return round(toks / dt, 1), peak

    out = {"config": ("d768 int8 KV budget 8192 tokens "
                      "(= 8 dense slots x max_seq 1024 = 512 paged "
                      "blocks x 16); 32 reqs, P in {32,64}, "
                      "new in {48,64}, multi_step 8")}
    try:
        dense_tok, dense_peak = drive(ContinuousBatcher(
            params, cfg, n_slots=budget_tokens // cfg.max_seq,
            quant="int8"))
        out["dense_tok_s"] = dense_tok
        out["dense_peak_concurrency"] = dense_peak
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    try:
        paged_tok, paged_peak = drive(PagedBatcher(
            params, cfg, n_slots=32,
            n_blocks=1 + budget_tokens // 16, block_size=16,
            quant="int8"))
        out["paged_tok_s"] = paged_tok
        out["paged_peak_concurrency"] = paged_peak
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    return out


def _bench_speculative() -> dict:
    """VERDICT r4 #5: speculative decoding's speed, measured — the one
    serving feature whose only reason to exist is speed. No trained
    models exist in this environment, so acceptance is bracketed by
    construction at both ends of its range:

      * alpha~1 (every draft token accepted): both models' tied heads
        are ZEROED — logits are constant, greedy argmax is token 0 for
        draft and target alike, so every verify pass accepts all gamma
        proposals while both models execute their full real FLOPs (TPUs
        don't skip zeros; embedding rows being zero changes no matmul
        shape). This measures the PLUMBING's best case.
      * alpha~0 (random-init draft vs random-init target, 16k vocab:
        proposals essentially never match): the worst case — each round
        pays gamma draft steps + one verify pass to emit ~1 token.

    Reported per gamma: tok/s, tokens emitted per verify pass, and the
    speedup vs `make_generate` greedy decode of the same target. The
    breakeven acceptance a deployment must clear falls out of the two
    endpoints. Ref: models/transformer.py::make_speculative_generate."""
    import numpy as np  # noqa: F401

    from neuronika_tpu.models import transformer as T

    cfg_t = T.GPTConfig(vocab_size=16384, n_layer=8, n_head=12,
                        d_model=1536, d_ff=6144, max_seq=256,
                        dropout=0.0, dtype=jnp.bfloat16)
    cfg_d = T.GPTConfig(vocab_size=16384, n_layer=4, n_head=6,
                        d_model=384, d_ff=1536, max_seq=256,
                        dropout=0.0, dtype=jnp.bfloat16)
    P, N = 64, 128
    pt = T.init_params(jax.random.key(0), cfg_t)
    pd = T.init_params(jax.random.key(1), cfg_d)
    zt = dict(pt, wte=jnp.zeros_like(pt["wte"]))     # constant logits
    zd = dict(pd, wte=jnp.zeros_like(pd["wte"]))
    prompt = jax.random.randint(jax.random.key(2), (1, P), 1,
                                cfg_t.vocab_size)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            # sync on the token buffer (value fetch, tunnel-safe)
            float(jnp.asarray(out[0] if isinstance(out, tuple)
                              else out)[0, 0])
            ts.append(time.perf_counter() - t0)
        return out, sorted(ts)[len(ts) // 2]

    out = {"config": f"target d1536 L8, draft d384 L4, int8 both, "
                     f"B=1 greedy, P={P} N={N}"}
    gen = T.make_generate(cfg_t, max_new=N, quant="int8")
    _, dt_plain = timed(lambda: gen(zt, prompt, jax.random.key(3)))
    out["plain_tok_s"] = round(N / dt_plain, 1)
    best = None
    for gamma in (2, 4, 8):
        spec = T.make_speculative_generate(cfg_t, cfg_d, N, gamma,
                                           quant="int8",
                                           draft_quant="int8")
        row = {}
        for name, a, b in (("alpha1", zt, zd), ("alpha0", pt, pd)):
            try:
                (toks, iters), dt = timed(lambda a=a, b=b: spec(a, b,
                                                                prompt))
                it = int(iters)
                row[name] = {
                    "tok_s": round(N / dt, 1),
                    "tokens_per_verify": round(N / max(it, 1), 2),
                    "speedup_vs_plain": round(dt_plain / dt, 3),
                }
            except Exception:  # noqa: BLE001
                traceback.print_exc()
        out[f"gamma{gamma}"] = row
        sp = row.get("alpha1", {}).get("speedup_vs_plain", 0)
        if best is None or sp > best[1]:
            best = (gamma, sp)
    if best:
        out["best"] = {"gamma": best[0], "speedup": best[1]}
        out["speedup"] = best[1]
    return out


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


def _timed_chain(step_fn, x0, rtt, iters=32, reps=5, min_window=0.4):
    """Per-iteration time of a self-chaining kernel: y = step_fn(x) with
    y.shape == x.shape (pytrees ok), run inside ONE jitted fori_loop (the
    sequential dependency defeats both XLA constant-folding and overlap).
    Two-length difference method: RTT and all per-call constants cancel
    exactly (subtracting a separately measured RTT leaves ±10 ms tunnel
    jitter that poisons sub-ms kernels). `rtt` is unused, kept for
    signature stability.

    The measured quantity is the 3·iters·dt window between the two chain
    lengths — it must DWARF tunnel jitter, not just the median RTT:
    BENCH_r02 was captured with a degraded tunnel (rtt 33 ms) and a ~20 ms
    flash window, which read the kernel 2x slow (VERDICT r2 "what's weak"
    #1). A pilot pair scales iters until the window is >= min_window
    seconds, so sub-ms kernels get thousand-iteration chains."""
    from jax import lax

    # dynamic trip count -> ONE compile serves both chain lengths
    f = jax.jit(lambda x, n: lax.fori_loop(
        0, n, lambda i, x: step_fn(x), x))

    def run(x, n):
        leaf = jax.tree.leaves(f(x, jnp.int32(n)))[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    run(x0, iters)
    t0 = time.perf_counter()
    run(x0, iters)
    t1p = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(x0, 4 * iters)  # compiled already (dynamic trip count)
    t4p = time.perf_counter() - t0
    dt_est = max(t4p - t1p, 1e-9) / (3 * iters)
    if 3 * iters * dt_est < min_window:
        iters = min(int(min_window / (3 * dt_est)) + 1, 4096)
        run(x0, iters)
        run(x0, 4 * iters)  # warm the new lengths

    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(x0, iters)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(x0, 4 * iters)
        t4 = time.perf_counter() - t0
        # per-pair difference: adjacent-in-time, so slow tunnel drift
        # cancels within the pair rather than across the whole set
        diffs.append(max(t4 - t1, 1e-9))
    return sorted(diffs)[len(diffs) // 2] / (3 * iters)


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
        # independent context baseline: JAX's bundled TPU flash kernel at
        # the same shape (r3 diag: 0.088 vs our 0.36-0.42 — the repo's
        # kernels are ~4x the installed public kernel; the docs' old 0.77
        # claim was a short-timing-window artifact, see docs/PERF.md)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as _jax_flash,
        )

        dt = _timed_chain(
            lambda x: _jax_flash(x, k, v, causal=True,
                                 sm_scale=1.0 / (D ** 0.5)), q, rtt)
        out["flash_fwd_bundled_jax_mfu"] = round(fl / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    try:
        # VERDICT r2 #1: the kernel the FLAGSHIP actually runs — packed-qkv
        # layout, fast softmax, single-pass fused backward — at the
        # flagship shape (d1536 H12 hd128 S2048 B16, flash_block 512).
        from neuronika_tpu.ops.pallas.attention import flash_attention_qkv

        B, H, S, hd = 16, 12, 2048, 128
        W = 3 * H * hd  # KV == H
        qkv = jax.random.normal(jax.random.key(7), (B, S, W),
                                jnp.bfloat16) / (hd ** 0.25)
        fl = 2 * B * H * S * S * hd  # true causal flops (2 MXU passes / 2)

        def fwd_chain(x):
            # out (B,S,H·hd) != x (B,S,W): thread the dependence through
            # ONE element (in-place loop-carry update — O(1) glue, vs a
            # full-tensor repack whose HBM traffic would rival the kernel)
            o = flash_attention_qkv(x, None, H, H, True, None, 512, 512,
                                    False, 0.0, True, True)
            return x.at[0, 0, 0].set(o[0, 0, 0].astype(x.dtype))

        dt = _timed_chain(fwd_chain, qkv, rtt, iters=16)
        out["flash_qkv_fwd_mfu"] = round(fl / dt / peak, 4)

        g = jax.grad(lambda x: flash_attention_qkv(
            x, None, H, H, True, None, 512, 512, False, 0.0, True, True,
        ).astype(jnp.float32).sum())

        def fb_chain(x):
            d = g(x)  # d_qkv has x's shape; fused bwd = ONE pallas call
            return x.at[0, 0, 0].set(d[0, 0, 0].astype(x.dtype))

        dt = _timed_chain(fb_chain, qkv, rtt, iters=8)
        # fwd 2 + fused bwd 5 MXU passes per tile pair -> 7/2 x fl
        out["flash_qkv_fwdbwd_mfu"] = round((fl * 7 // 2) / dt / peak, 4)

        # S4096 (VERDICT r3 #5 / PERF.md's open item): the long-sequence
        # regime. The fused bwd's whole-S slabs exceed scoped VMEM here,
        # so the VJP auto-routes to the split kernels (attention.py).
        B4, S4 = 2, 4096
        qkv4 = jax.random.normal(jax.random.key(9), (B4, S4, W),
                                 jnp.bfloat16) / (hd ** 0.25)
        fl4 = 2 * B4 * H * S4 * S4 * hd

        def fwd4(x):
            o = flash_attention_qkv(x, None, H, H, True, None, 512, 512,
                                    False, 0.0, True, True)
            return x.at[0, 0, 0].set(o[0, 0, 0].astype(x.dtype))

        dt = _timed_chain(fwd4, qkv4, rtt, iters=8)
        out["flash_qkv_s4096_fwd_mfu"] = round(fl4 / dt / peak, 4)

        g4 = jax.grad(lambda x: flash_attention_qkv(
            x, None, H, H, True, None, 512, 512, False, 0.0, True, True,
        ).astype(jnp.float32).sum())

        def fb4(x):
            d = g4(x)
            return x.at[0, 0, 0].set(d[0, 0, 0].astype(x.dtype))

        dt = _timed_chain(fb4, qkv4, rtt, iters=4)
        out["flash_qkv_s4096_fwdbwd_mfu"] = round(
            (fl4 * 7 // 2) / dt / peak, 4)
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
        # NB the loss must be NONLINEAR in the conv output: with plain
        # .sum() the cotangent is all-ones, so the fwd conv is dead and
        # the dx-conv is loop-invariant (depends only on w) — XLA hoists
        # both out of the timing loop and the "MFU" reads 3x too high.
        g = jax.grad(
            lambda x, w: jnp.tanh(conv(x, w).astype(jnp.float32)).sum(),
            argnums=(0, 1))

        def chain(state):
            # carry BOTH grads (consuming dw via a scalar would let the
            # simplifier collapse the weight-grad conv)
            x_, wa = state
            dx, dw = g(x_, w)
            return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw

        dt = _timed_chain(chain, (x, jnp.zeros_like(w, jnp.float32)), rtt,
                          iters=16)
        out["conv2d_fwdbwd_mfu"] = round(3 * fl / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    # VERDICT r2 #3: BASELINE.md's north star says conv1/2/3d — complete
    # the rank matrix (same nonlinear-loss discipline as conv2d above:
    # a .sum() loss makes the dx conv loop-invariant and reads 3x high).
    for name, dims, xsh, wsh, taps in (
        ("conv1d", ("NCH", "OIH", "NCH"), (64, 256, 3136), (256, 256, 3),
         3),
        ("conv3d", ("NCDHW", "OIDHW", "NCDHW"), (32, 128, 14, 14, 14),
         (128, 128, 3, 3, 3), 27),
    ):
        try:
            from jax import lax

            x = jax.random.normal(jax.random.key(0), xsh, jnp.bfloat16)
            w = jax.random.normal(jax.random.key(1), wsh,
                                  jnp.bfloat16) / (wsh[1] * taps) ** 0.5
            strides = (1,) * (len(xsh) - 2)

            def conv(x, w, strides=strides, dims=dims):
                return lax.conv_general_dilated(
                    x, w, strides, "SAME", dimension_numbers=dims)

            spatial = 1
            for d in xsh[2:]:
                spatial *= d
            fl = 2 * xsh[0] * wsh[0] * wsh[1] * taps * spatial
            dt = _timed_chain(lambda x: conv(x, w), x, rtt)
            out[f"{name}_fwd_mfu"] = round(fl / dt / peak, 4)
            g = jax.grad(
                lambda x, w: jnp.tanh(conv(x, w).astype(jnp.float32)).sum(),
                argnums=(0, 1))

            def chain(state):
                x_, wa = state
                dx, dw = g(x_, w)
                return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw

            dt = _timed_chain(chain, (x, jnp.zeros_like(w, jnp.float32)),
                              rtt, iters=16)
            out[f"{name}_fwdbwd_mfu"] = round(3 * fl / dt / peak, 4)
        except Exception:  # noqa: BLE001
            traceback.print_exc()
    # conv tier routing (VERDICT r3 #2c): record which tier "auto"
    # selects for the artifact's conv shapes — the measured MFUs for both
    # tiers sit right next to these in this same dict
    try:
        from neuronika_tpu.ops.pallas.conv import route_conv2d

        out["conv_route"] = {
            "conv2d_56x56x256_s1": route_conv2d(2, (1, 1), (1, 1), 1,
                                                batch=64),
            "conv2d_56x56x256_s2": route_conv2d(2, (2, 2), (1, 1), 1,
                                                batch=64),
            "conv2d_28x28x512_B4": route_conv2d(
                2, (1, 1), (1, 1), 1, batch=4, ksize=3,
                sample_bytes=30 * 28 * 512 * 2,
                weight_bytes=9 * 512 * 512 * 2),
            "conv1d_3136x256": route_conv2d(1, (1,), (1,), 1, batch=64),
            "conv1d_3136x256_B4": route_conv2d(
                1, (1,), (1,), 1, batch=4, ksize=3,
                sample_bytes=3139 * 256 * 2,
                weight_bytes=3 * 256 * 256 * 2),
            "conv3d_14x128": route_conv2d(3, (1, 1, 1), (1, 1, 1), 1,
                                          batch=32),
            "table": "ops/pallas/conv.py::route_conv2d "
                     "(r4 sweep + r5 small-batch probe)",
        }
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    try:
        from jax import lax

        from neuronika_tpu.ops.pallas.conv import conv2d_pallas_nhwc

        B, C, HW = 64, 256, 56
        xh = jax.random.normal(jax.random.key(0), (B, HW, HW, C),
                               jnp.bfloat16)
        wh = jax.random.normal(jax.random.key(1), (3, 3, C, C),
                               jnp.bfloat16) / (C * 9) ** 0.5
        flv = 2 * B * C * C * 9 * HW * HW  # SAME: all positions

        dt = _timed_chain(
            lambda x: conv2d_pallas_nhwc(x, wh).astype(jnp.bfloat16),
            xh, rtt)
        out["pallas_conv2d_fwd_mfu"] = round(flv / dt / peak, 4)

        g = jax.grad(
            lambda x, w: jnp.tanh(
                conv2d_pallas_nhwc(x, w).astype(jnp.float32)).sum(),
            argnums=(0, 1))

        def chain(state):
            x_, wa = state
            dx, dw = g(x_, wh)
            return jnp.tanh(dx).astype(jnp.bfloat16), wa + dw

        dt = _timed_chain(chain, (xh, jnp.zeros_like(wh, jnp.float32)), rtt,
                          iters=16)
        out["pallas_conv2d_fwdbwd_mfu"] = round(3 * flv / dt / peak, 4)

        # stride-2 phase-decomposed path (the NHWC ResNet downsample conv)
        w2 = jax.random.normal(jax.random.key(2), (3, 3, C, 2 * C),
                               jnp.bfloat16) / (C * 9) ** 0.5
        fl2 = 2 * B * (HW // 2) * (HW // 2) * C * 2 * C * 9

        def s2_chain(x):
            y = conv2d_pallas_nhwc(x, w2, (2, 2))  # (B, 28, 28, 2C)
            # output shape != input: thread the dependence through one
            # element of the carry (in-place loop-carry update)
            return x.at[0, 0, 0, 0].set(y[0, 0, 0, 0].astype(x.dtype))

        dt = _timed_chain(s2_chain, xh, rtt)
        out["pallas_conv2d_s2_fwd_mfu"] = round(fl2 / dt / peak, 4)

        # the route table's pallas regime (r5): small-batch stride-1
        # forward — both tiers at B4 28²·512, the cell the route turns on
        B4, HW4, C4 = 4, 28, 512
        x4 = jax.random.normal(jax.random.key(3), (B4, HW4, HW4, C4),
                               jnp.bfloat16)
        w4 = jax.random.normal(jax.random.key(4), (3, 3, C4, C4),
                               jnp.bfloat16) / (C4 * 9) ** 0.5
        fl4c = 2 * B4 * HW4 * HW4 * C4 * C4 * 9
        dt = _timed_chain(
            lambda x: conv2d_pallas_nhwc(x, w4).astype(jnp.bfloat16),
            x4, rtt)
        out["pallas_conv2d_b4_fwd_mfu"] = round(fl4c / dt / peak, 4)
        dt = _timed_chain(
            lambda x: lax.conv_general_dilated(
                x, w4, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.bfloat16), x4, rtt)
        out["xla_conv2d_b4_fwd_mfu"] = round(fl4c / dt / peak, 4)

        # conv1d shares the thin-batch regime (r5 probe): both tiers at
        # B4 C256 L3136, the framework-realistic NCW layout (the pallas
        # row pays both transposes, like ops/functional's dispatch)
        from neuronika_tpu.ops.pallas.conv import conv1d_direct_nwc

        B1d, C1d, L1d = 4, 256, 3136
        x1 = jax.random.normal(jax.random.key(5), (B1d, C1d, L1d),
                               jnp.bfloat16)
        w1 = jax.random.normal(jax.random.key(6), (3, C1d, C1d),
                               jnp.bfloat16) / (C1d * 3) ** 0.5
        fl1 = 2 * B1d * C1d * C1d * 3 * L1d

        def pal1d(x):
            y = conv1d_direct_nwc(x.transpose(0, 2, 1), w1)
            return jnp.pad(y.transpose(0, 2, 1), ((0, 0), (0, 0), (0, 2)))

        dt = _timed_chain(pal1d, x1, rtt)
        out["pallas_conv1d_b4_fwd_mfu"] = round(fl1 / dt / peak, 4)
        w1t = w1.transpose(2, 1, 0)  # (Co, Ci, k)
        dt = _timed_chain(
            lambda x: lax.conv_general_dilated(
                x, w1t, (1,), "SAME",
                dimension_numbers=("NCH", "OIH", "NCH")), x1, rtt)
        out["xla_conv1d_b4_fwd_mfu"] = round(fl1 / dt / peak, 4)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
    return out


def _run_config(T, cfg, B, S, steps):
    """Per-step time of the fused train step via the two-length chain
    method (see _timed_chain): the whole (params, opt_state) pytree is
    threaded through a jitted fori_loop, so RTT and per-call constants
    cancel exactly — the synced-loop-minus-RTT method this replaces
    under-reported by ~2% whenever the tunnel was jittery."""
    key = jax.random.key(0)
    params = T.init_params(key, cfg)
    opt_state = T.opt_init(params, cfg)
    step = T.make_train_step(cfg)

    tokens = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    targets = jax.random.randint(jax.random.key(2), (B, S), 0, cfg.vocab_size)
    lr = jnp.float32(3e-4)

    # NB: step donates (params, opt_state) — the warmup call invalidates
    # the originals, so everything below must use the returned buffers.
    params, opt_state, loss = step(params, opt_state, tokens, targets, lr,
                                   key)
    lv = float(loss)  # warmup / compile / first full round trip
    rtt = _measure_rtt()

    iters = max(steps // 2, 2)
    from jax import lax

    def chain(st):
        p, o = st
        p, o, _ = step(p, o, tokens, targets, lr, key)
        return (p, o)

    # dynamic trip count: ONE compiled while-loop serves both chain
    # lengths (a static-bound loop per length doubles the compile bill,
    # which blows the artifact's time budget at d1536 through the
    # remote-compile tunnel)
    f = jax.jit(lambda st, n: lax.fori_loop(
        0, n, lambda i, st: chain(st), st))

    def run(n):
        out = f((params, opt_state), jnp.int32(n))
        return float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))

    run(iters)
    run(4 * iters)  # compile once; warm both paths
    # VERDICT r2 #9: three fresh repetitions; the artifact reports the
    # median AND the spread so the margin over the 0.80 target is
    # checkable against run-to-run wobble.
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(iters)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(4 * iters)
        t4 = time.perf_counter() - t0
        samples.append(max(t4 - t1, 1e-9) / (3 * iters))
    dt = sorted(samples)[len(samples) // 2]
    return dt, rtt, lv, samples


def main() -> None:
    # build the native (C++) tier so the artifact reflects the shipped
    # runtime, not the Python fallbacks (VERDICT r2 #6)
    try:
        from neuronika_tpu._build import ensure_native_built

        native_ok = ensure_native_built()
    except Exception:  # noqa: BLE001
        native_ok = False

    from neuronika_tpu.models import transformer as T

    on_tpu = jax.devices()[0].platform != "cpu"
    # r2b sweep winners (tools/sweep_shapes.py, docs/PERF.md): every kernel
    # at d768 measures at its own floor (matmuls 0.926 in-situ, LN at HBM
    # speed-of-light, flash bandwidth-bound at S1024), so MFU is set by
    # arithmetic intensity -> the flagship is the d1536 shape (0.786 vs
    # 0.731 at d768, same 49k-token global batch granularity). Winners:
    # unrolled layers, no remat, packed-qkv flash @ block 1024, fast
    # softmax, single-pass fused flash bwd, compute-dtype matmul outputs,
    # bf16 Adam state (-6 ms; loss curves match f32 to 2e-4).
    kern = dict(
        vocab_size=16384, dropout=0.0, dtype=jnp.bfloat16,
        flash="auto", remat=False, scan_layers=False, flash_block=1024,
        matmul_out="compute", flash_softmax="fast", flash_bwd="fused",
        opt_state_dtype="bf16",
    )
    base = dict(n_layer=8, n_head=6, d_model=768, d_ff=3072, max_seq=1024)
    if on_tpu:
        candidates = [
            # S2048 runs flash in its efficient regime (standalone f+b 0.63
            # vs 0.28 at S1024): 0.8093/0.8097 MFU over two fresh runs
            # (tools/sweep_shapes.py idx 2). B20 hits an HBM cliff (0.723).
            (T.GPTConfig(n_layer=8, n_head=12, d_model=1536, d_ff=6144,
                         max_seq=2048, **{**kern, "flash_block": 512}),
             16, 2048, 10,
             "d1536 L8 H12 S2048 B16 fb512 bf16 unroll+noremat+fastsm"
             "+fusedbwd+bf16adam"),
            (T.GPTConfig(n_layer=8, n_head=12, d_model=1536, d_ff=6144,
                         max_seq=1024, **kern),
             24, 1024, 12,
             "d1536 L8 H12 S1024 B24 bf16 unroll+noremat+fastsm+fusedbwd"
             "+bf16adam"),
            (T.GPTConfig(**base, **kern), 48, 1024, 16,
             "d768 L8 H6 S1024 B48 bf16 unroll+noremat+fastsm+fusedbwd"
             "+bf16adam"),
            (T.GPTConfig(**base, **{**kern, "remat": True,
                                    "scan_layers": True},
                         remat_policy="names"),
             64, 1024, 12, "d768 L8 H6 S1024 B64 bf16 scan+names"),
            (T.GPTConfig(vocab_size=16384, dropout=0.0, dtype=jnp.bfloat16,
                         flash="off", remat=False, **base), 8, 1024, 20,
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
            dt, rtt, lv, samples = _run_config(T, cfg, B, S, steps)
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
    mfu_samples = sorted(
        round(flops_per_step / s / _device_peak(), 4) for s in samples
    )

    try:
        mlp_sps = round(_bench_quickstart_mlp(), 1)
    except Exception:  # noqa: BLE001
        mlp_sps = None

    rooflines = _kernel_rooflines(_device_peak()) if on_tpu else {}

    # serving metric: on-device generation (scanned prefill + decode) at
    # the d1536 shape, int8 weights — steady-state, value-fetch synced
    # (block_until_ready does not sync through the tunnel).
    serving = None
    if on_tpu:
        try:
            import numpy as _np

            cfg_s = T.GPTConfig(
                vocab_size=16384, n_layer=8, n_head=12, d_model=1536,
                d_ff=6144, max_seq=512, dropout=0.0, dtype=jnp.bfloat16,
                flash="auto")
            params_s = T.init_params(jax.random.key(0), cfg_s)
            Bs, Ps, Ns = 8, 32, 64
            prompt = jax.random.randint(jax.random.key(1), (Bs, Ps), 0,
                                        cfg_s.vocab_size)
            gen = T.make_generate(cfg_s, max_new=Ns, quant="int8")
            _np.asarray(gen(params_s, prompt, jax.random.key(2)))  # warm
            t0 = time.perf_counter()
            for _ in range(3):
                _np.asarray(gen(params_s, prompt, jax.random.key(2)))
            dt_s = (time.perf_counter() - t0) / 3
            serving = {
                "decode_new_tokens_per_sec": round(Bs * Ns / dt_s, 1),
                "decode_ms_per_step": round(dt_s * 1e3 / Ns, 3),
                "config": f"int8 B={Bs} prefill{Ps}+decode{Ns}",
            }
        except Exception:  # noqa: BLE001
            traceback.print_exc()
        try:
            matrix = _bench_serving_matrix()
            serving = dict(serving or {}, matrix=matrix)
        except Exception:  # noqa: BLE001
            traceback.print_exc()
        try:
            serving = dict(serving or {},
                           capacity=_bench_paged_capacity())
        except Exception:  # noqa: BLE001
            traceback.print_exc()
        try:
            serving = dict(serving or {},
                           speculative=_bench_speculative())
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    # mini demo: the r1 headline shape (d768), kept in the artifact for
    # round-over-round continuity (r1: 221.7k tok/s / 0.552 MFU).
    mini = None
    if on_tpu and cfg is not None and cfg.d_model != 768:
        try:
            cfg_m = T.GPTConfig(**base, **kern)
            dt_m, _, _, _ = _run_config(T, cfg_m, 48, 1024, 10)
            mini = {
                "tokens_per_sec": round(48 * 1024 / dt_m, 1),
                "mfu": round(T.flops_per_token(cfg_m, 1024) * 48 * 1024
                             / dt_m / _device_peak(), 4),
            }
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    # define-by-run tier at the d768 shape (VERDICT r2 #7 / r3 #1): the
    # batched bf16 path with the flash Var op, a like-for-like functional
    # twin at the identical shape, and the legacy 2-d f32 config for
    # continuity. Full gap attribution: docs/PERF.md "Define-by-run tier"
    # (from tools/diag_var_gap.py + diag_var_batched.py).
    var_api = None
    if on_tpu:
        try:
            var_api = _bench_var_api_gpt(_device_peak())
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    detail = {
        "mfu": round(mfu, 4),
        "mfu_samples": mfu_samples,
        "mfu_spread": round(mfu_samples[-1] - mfu_samples[0], 4),
        "step_ms": round(dt * 1e3, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        "quickstart_mlp_steps_per_sec": mlp_sps,
        "kernel_rooflines": rooflines or None,
        "serving": serving,
        "mini_d768_r1_metric": mini,
        "var_api_gpt": var_api,
        "loss": lv,
        "device": str(jax.devices()[0]),
        "config": label,
        "native_tier": native_ok,
        "fallbacks": errors or None,
    }
    headline = {
        "metric": "gpt_flagship_train_tokens_per_sec",
        "value": round(tok_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(mfu / 0.80, 4),
        "detail": _compact_summary(detail),
    }
    # line 1: the bulky full detail (PERF.md's ground truth); LAST line:
    # the compact headline the driver parses — hard-capped to fit a
    # 2000-char capture tail no matter what the sub-benches returned
    print(json.dumps({"full_detail": detail}))
    line = json.dumps(headline)
    if len(line) > 1800:  # belt and braces: drop summary keys until it fits
        for k in list(headline["detail"]):
            if k in ("mfu", "config"):
                continue
            del headline["detail"][k]
            line = json.dumps(headline)
            if len(line) <= 1800:
                break
    print(line)


def _compact_summary(detail: dict) -> dict:
    """The one-line headline summary: every round-defining number, no
    nested matrices (those live in the full_detail line above)."""
    out = {
        "mfu": detail["mfu"],
        "mfu_spread": detail["mfu_spread"],
        "step_ms": detail["step_ms"],
        "config": detail["config"],
        "device": detail["device"],
        "native_tier": detail["native_tier"],
        "quickstart_mlp_steps_per_sec":
            detail["quickstart_mlp_steps_per_sec"],
    }
    rf = detail.get("kernel_rooflines") or {}
    for k in ("matmul_mfu", "flash_qkv_fwdbwd_mfu",
              "flash_qkv_s4096_fwdbwd_mfu", "conv2d_fwdbwd_mfu"):
        if k in rf:
            out[k] = rf[k]
    var = detail.get("var_api_gpt") or {}
    if "mfu" in var:
        out["var_api_mfu"] = var["mfu"]
        out["var_api_ratio_vs_functional"] = var.get("ratio_vs_functional")
    flag = var.get("flagship") or {}
    if "mfu" in flag:
        out["var_flagship_mfu"] = flag["mfu"]
        out["var_flagship_ratio"] = flag.get("ratio_vs_functional")
    sv = detail.get("serving") or {}
    cap = sv.get("capacity") or {}
    if cap:
        out["paged_capacity_tok_s"] = cap.get("paged_tok_s")
        out["dense_capacity_tok_s"] = cap.get("dense_tok_s")
    spec = sv.get("speculative") or {}
    if spec:
        out["spec_decode_speedup"] = spec.get("speedup")
    return out


if __name__ == "__main__":
    main()
