"""Mini GPT-2-style transformer — the flagship model (BASELINE.md configs[4]).

Two tiers, same math:

* this module: the **pure-functional TPU perf path** — params as a pytree,
  one jitted (optionally pjit-sharded) train step, bf16 matmuls with f32
  accumulation, causal attention built from the same primitive formulas the
  define-by-run ops implement (softmax/matmul — the reference has no
  attention op, SURVEY.md §5; this is the stretch config built from
  primitives).
* `build_var_model()` below: the same block expressed through the
  define-by-run `Var`/`VarDiff` API for parity demonstration.

TPU-first structure:
* **Stacked layers + `lax.scan`**: per-layer params carry a leading
  `n_layer` axis and the block is traced/compiled ONCE, not per layer —
  compile time stays flat in depth (essential with Pallas kernels in the
  block) and XLA pipelines the scan.
* **Flash attention** (`ops/pallas/attention.py`) on TPU — the packed-qkv
  layout-native kernels on a single chip (zero dispatch copies), the BHSD
  kernels under shard_map on a mesh; attention-dropout runs INSIDE the
  kernel (per-tile PRNG masks); composite softmax·V fallback elsewhere.
* **Rematerialisation**: `cfg.remat` wraps the block in `jax.checkpoint`,
  trading ~⅓ more FLOPs for activation memory → larger batches.
* **Scale-out**: dp batch sharding; tp Megatron column/row splits (QKV and
  MLP-in column-parallel, attn-proj and MLP-out row-parallel — one GSPMD
  all-reduce per sub-layer); optional sp (sequence-sharded activations,
  `seq_parallel`); ep expert-parallel MoE (`n_experts`); GPipe pp lives in
  `parallel/pipeline.py`. The flash kernel runs under tp via shard_map.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 256
    n_layer: int = 4
    n_head: int = 4
    # grouped-query attention: number of KV heads (0 -> = n_head, i.e.
    # standard MHA). Shrinks the KV cache by n_head/n_kv_head for serving.
    n_kv_head: int = 0
    d_model: int = 256
    d_ff: int = 1024
    max_seq: int = 256
    # position embedding: "learned" (GPT-2 wpe table) | "rope" (rotary,
    # GPT-NeoX half-split convention applied to q/k; no wpe param — the
    # modern-LLM family). RoPE'd keys are cached post-rotation, so decode
    # reads need no re-rotation.
    pos_emb: str = "learned"
    rope_theta: float = 10000.0
    # normalisation: "layer" (GPT-2 LayerNorm, scale+bias) | "rms"
    # (RMSNorm — no mean subtraction, no bias param; the llama family).
    # Dispatch is structure-driven: rms norm params carry only "scale".
    norm: str = "layer"
    # norm epsilon. 1e-5 matches HF GPT-2's LayerNorm; HF llama RMSNorm
    # checkpoints use 1e-6 (utils.hf sets this on import).
    norm_eps: float = 1e-5
    # MLP form: "gelu" (fc_in -> gelu -> fc_out) | "swiglu"
    # (silu(x @ fc_gate) * (x @ fc_in) -> fc_out; llama family — note
    # d_ff is the hidden width as given, pick ~8/3·d_model for
    # llama-equal params). swiglu is dense-MLP only (n_experts=0).
    mlp: str = "gelu"
    # linear-layer biases: False drops every *_b param (llama family)
    bias: bool = True
    # tie the LM head to wte (GPT-2) or learn a separate "lm_head"
    # (V, D) param (llama family). Pipeline-parallel steps require tied.
    tied_head: bool = True
    # causal=False turns the stack into a bidirectional encoder (BERT
    # family, models/bert.py): every attention path drops the causal
    # mask; generation/decode APIs require causal=True.
    causal: bool = True
    # sliding-window attention (Mistral): each position attends to the
    # last `window` tokens including itself; 0 = full causal. The flash
    # kernels skip tiles outside the band (O(S·window) compute); train,
    # prefill and decode paths all honour it.
    window: int = 0
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16  # compute dtype; params live in f32
    # "auto": use the Pallas flash-attention kernel on TPU when the shape
    # qualifies; "on"/"off" force it. Attention-dropout runs INSIDE the
    # kernel (per-tile on-core PRNG, identical masks in fwd/bwd).
    flash: str = "auto"
    # checkpoint the block during training (memory for FLOPs)
    remat: bool = True
    # what the per-block jax.checkpoint SAVES (everything else is
    # recomputed in the backward pass):
    #   "full"       — nothing beyond the block inputs (max recompute,
    #                  min memory; the classic full-block remat)
    #   "flash"      — the flash-attention residuals (q/k/v/out/lse), so
    #                  the backward never re-runs the forward flash kernel
    #   "names"      — "flash" + the matmul *inputs* (ln1/ln2 outputs,
    #                  pre-GeLU, GeLU output): backward recomputes only
    #                  cheap elementwise/norm ops, no matmul re-runs
    #   "dots"       — XLA policy: save all non-batched dot outputs
    #   "flash_dots" — union of "dots" and the flash residuals
    remat_policy: str = "full"
    # flash-attention block sizes (clamped to S)
    flash_block: int = 256
    # fused linear+cross-entropy Pallas kernel for the LM head. Avoids
    # materialising the (B*S, V) logits tensor — worth it when logits do
    # not fit HBM comfortably (huge vocab/batch); at bench scale XLA's
    # composite is ~8% faster (measured), so "auto" resolves to off and
    # the kernel is opt-in via "on".
    fused_ce: str = "auto"
    # mixture-of-experts FFN: 0 = dense MLP; >0 = top-1 gated experts with
    # the expert axis shardable over an "ep" mesh axis (dense dispatch —
    # a capability/sharding tier, not a FLOPs-optimal MoE).
    n_experts: int = 0
    # MoE dispatch: "dense" routes every token through every expert and
    # gates the combine (simple, shardable); "sparse" is Switch-style
    # capacity-based dispatch via one-hot einsums (each expert computes
    # only its capacity; dispatch itself costs O(N·E·C)); "sort" is the
    # same routing via argsort + scatter/gather — O(N log N + N·D)
    # dispatch, the FLOPs-credible form at scale.
    moe_impl: str = "dense"
    moe_capacity: float = 2.0
    # Switch load-balancing auxiliary loss weight (0 disables); encourages
    # uniform expert utilisation: aux = E * sum_e f_e * P_e
    moe_aux_weight: float = 0.0
    # dtype of the body matmul OUTPUTS (MXU accumulation is always f32
    # internally; this only controls the materialised result):
    #   "f32"     — emit f32, add bias in f32, cast to compute dtype (safe
    #               default; XLA usually fuses the cast, but if the f32
    #               result hits HBM it doubles the dot-output traffic)
    #   "compute" — emit cfg.dtype directly (halves dot-output traffic
    #               when the cast is NOT fused; one rounding step earlier)
    matmul_out: str = "f32"
    # dtype of the MATERIALISED LM-head logits ("f32" | "compute"):
    # "compute" halves the CE tensor traffic but measured neutral-to-
    # negative on v5e (XLA fuses the converts) — f32 default.
    logits_dtype: str = "f32"
    # run the layer stack as a lax.scan over stacked params (compile once
    # per depth — the right default for deep models) or as an unrolled
    # python loop. Profiling the scan shows ~29% of the train step goes to
    # dynamic-update-slice fusions stacking/unstacking the per-layer remat
    # residuals; unrolling keeps residuals as individual arrays at the
    # cost of O(n_layer) compile time.
    scan_layers: bool = True
    # flash-attention softmax mode: "safe" keeps the running row-max
    # (standard online softmax); "fast" skips the max/rescale passes in
    # the VPU-bound forward kernel — mathematically identical by softmax
    # shift-invariance, but exp2 overflows if attention logits exceed ~88
    # (fine at normal training scales; monitor if logits grow unbounded).
    flash_softmax: str = "safe"
    # flash backward schedule (packed path): "split" = separate dq and
    # dk/dv passes (each recomputes s and dp — 7 MXU tiles per pair);
    # "fused" = one kernel per (batch, kv-head) computing dq+dk+dv in a
    # single tile walk (5 MXU tiles, one exp2; dk/dv accumulate in VMEM
    # scratch).
    flash_bwd: str = "split"
    # Adam m/v state dtype ("f32" | "bf16"): bf16 halves optimizer-state
    # HBM traffic (measured -6 ms/step on the d768 flagship); update math
    # stays f32 (see optim.functional.adam_update). bf16 second moments
    # carry ~0.4% relative rounding — loss curves match f32 to ~1e-3
    # (tools/check_opt_dtype.py).
    opt_state_dtype: str = "f32"
    # sequence parallelism (sharded path only): constrain residual-stream
    # activations to P(dp, tp, None) — sequence sharded over tp — around
    # the norms/residuals; GSPMD inserts the Megatron-style all-gathers
    # before the attention/MLP matmuls. Cuts activation memory per chip.
    seq_parallel: bool = False


def llama_config(**kw) -> GPTConfig:
    """Llama-family preset: rotary positions, RMSNorm, SwiGLU MLP, no
    biases, untied LM head. Any GPTConfig field can be overridden."""
    base = dict(pos_emb="rope", norm="rms", mlp="swiglu", bias=False,
                tied_head=False)
    base.update(kw)
    return GPTConfig(**base)


def mistral_config(**kw) -> GPTConfig:
    """Mistral-family preset: the llama stack plus sliding-window
    attention (default window 4096)."""
    base = dict(window=4096)
    base.update(kw)
    return llama_config(**base)


# --------------------------------------------------------------------------
# params (per-layer tensors are STACKED with a leading n_layer axis)


def _kv_heads(cfg: GPTConfig) -> int:
    return cfg.n_kv_head or cfg.n_head


def _qkv_width(cfg: GPTConfig) -> int:
    hd = cfg.d_model // cfg.n_head
    return cfg.d_model + 2 * _kv_heads(cfg) * hd


def init_params(key, cfg: GPTConfig) -> Dict:
    """GPT-2 style init: N(0, 0.02), residual projections scaled by
    1/sqrt(2*n_layer)."""
    keys = jax.random.split(key, 8)
    std = 0.02
    resid_std = std / math.sqrt(2.0 * cfg.n_layer)
    L, D, F = cfg.n_layer, cfg.d_model, cfg.d_ff
    W = _qkv_width(cfg)

    def norm(k, shape, s=std):
        return (s * jax.random.normal(k, shape)).astype(jnp.float32)

    def ln(*shape):
        # rms norm carries only a scale — _layer_norm dispatches on the
        # param structure
        p = {"scale": jnp.ones(shape)}
        if cfg.norm == "layer":
            p["bias"] = jnp.zeros(shape)
        elif cfg.norm != "rms":
            raise ValueError(f"unknown norm {cfg.norm!r}")
        return p

    params = {
        "wte": norm(keys[0], (cfg.vocab_size, D)),
        "ln_f": ln(D),
        "blocks": {
            "ln1": ln(L, D),
            "ln2": ln(L, D),
            "qkv": norm(keys[2], (L, D, W)),
            "qkv_b": jnp.zeros((L, W)),
            "proj": norm(keys[3], (L, D, D), resid_std),
            "proj_b": jnp.zeros((L, D)),
        },
    }
    if cfg.pos_emb == "learned":
        params["wpe"] = norm(keys[1], (cfg.max_seq, D))
    elif cfg.pos_emb != "rope":
        raise ValueError(f"unknown pos_emb {cfg.pos_emb!r}")
    if not cfg.tied_head:
        params["lm_head"] = norm(keys[7], (cfg.vocab_size, D))
    if cfg.n_experts:
        if cfg.mlp != "gelu":
            raise ValueError("mlp='swiglu' is dense-MLP only (n_experts=0)")
        E = cfg.n_experts
        params["blocks"].update({
            "gate": norm(keys[6], (L, D, E)),
            "fc_in": norm(keys[4], (L, E, D, F)),
            "fc_in_b": jnp.zeros((L, E, F)),
            "fc_out": norm(keys[5], (L, E, F, D), resid_std),
            "fc_out_b": jnp.zeros((L, E, D)),
        })
    else:
        params["blocks"].update({
            "fc_in": norm(keys[4], (L, D, F)),
            "fc_in_b": jnp.zeros((L, F)),
            "fc_out": norm(keys[5], (L, F, D), resid_std),
            "fc_out_b": jnp.zeros((L, D)),
        })
        if cfg.mlp == "swiglu":
            params["blocks"]["fc_gate"] = norm(keys[6], (L, D, F))
            params["blocks"]["fc_gate_b"] = jnp.zeros((L, F))
        elif cfg.mlp != "gelu":
            raise ValueError(f"unknown mlp {cfg.mlp!r}")
    if not cfg.bias:
        params["blocks"] = {k: v for k, v in params["blocks"].items()
                            if not k.endswith("_b")}
    return params


def param_shardings(mesh, cfg: GPTConfig) -> Dict:
    """Megatron-style tp layout + replicated small params. Stacked block
    leaves have a leading (replicated) layer axis."""

    tp = "tp" if "tp" in mesh.axis_names else None

    def ns(*spec):
        return NamedSharding(mesh, P(*[tp if s == "tp" else s for s in spec]))

    rep = ns()
    has_ep = cfg.n_experts and "ep" in mesh.axis_names
    ln = ({"scale": rep, "bias": rep} if cfg.norm == "layer"
          else {"scale": rep})
    shard = {
        "wte": ns(None, "tp"),
        "ln_f": dict(ln),
        "blocks": {
            "ln1": dict(ln),
            "ln2": dict(ln),
            "qkv": ns(None, None, "tp"),
            "qkv_b": ns(None, "tp"),
            "proj": ns(None, "tp", None),
            "proj_b": rep,
        },
    }
    if not cfg.tied_head:
        shard["lm_head"] = ns(None, "tp")
    if cfg.n_experts:
        ep = "ep" if has_ep else None
        shard["blocks"].update({
            "gate": rep,
            "fc_in": ns(None, ep, None, "tp"),
            "fc_in_b": ns(None, ep, "tp"),
            "fc_out": ns(None, ep, "tp", None),
            "fc_out_b": ns(None, ep, None),
        })
    else:
        shard["blocks"].update({
            "fc_in": ns(None, None, "tp"),
            "fc_in_b": ns(None, "tp"),
            "fc_out": ns(None, "tp", None),
            "fc_out_b": rep,
        })
        if cfg.mlp == "swiglu":
            shard["blocks"]["fc_gate"] = ns(None, None, "tp")
            shard["blocks"]["fc_gate_b"] = ns(None, "tp")
    if not cfg.bias:
        shard["blocks"] = {k: v for k, v in shard["blocks"].items()
                           if not k.endswith("_b")}
    if cfg.pos_emb == "learned":
        shard["wpe"] = rep
    return shard


def fsdp_param_shardings(mesh, cfg: GPTConfig, *, axis: str = "dp",
                         min_size: int = 1 << 16) -> Dict:
    """ZeRO-3 layout: widen the tp layout so every large parameter is
    additionally sharded over the data-parallel axis. Passing these as the
    train step's param/optimizer shardings makes GSPMD store weights,
    gradients AND Adam moments at 1/dp per chip, all-gather each weight at
    its use sites (fwd + bwd) and reduce-scatter the gradients — the
    ZeRO-1/2/3 stack falls out of the sharding annotation alone, no
    gather/scatter code.

    Per leaf the *largest* dimension not already claimed by tp/ep and
    divisible by the axis size is sharded; leaves under `min_size`
    elements (LN scales, biases) stay replicated — gathering them costs
    more latency than their memory is worth."""
    base = param_shardings(mesh, cfg)
    shapes = jax.eval_shape(lambda: init_params(jax.random.key(0), cfg))
    n = mesh.shape[axis]

    def widen(shape_leaf, s):
        spec = list(s.spec) + [None] * (len(shape_leaf.shape) - len(s.spec))
        cands = [(shape_leaf.shape[i], i) for i in range(len(spec))
                 if spec[i] is None and shape_leaf.shape[i] % n == 0]
        if not cands or shape_leaf.size < min_size:
            return s
        spec[max(cands)[1]] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(widen, shapes, base)


# --------------------------------------------------------------------------
# forward


def _body_dot(x, w, cfg: GPTConfig):
    """Body matmul honouring cfg.matmul_out (f32 vs compute-dtype output;
    MXU accumulation is f32 either way)."""
    if cfg.matmul_out == "compute":
        return jnp.dot(x, w.astype(cfg.dtype),
                       preferred_element_type=cfg.dtype)
    if cfg.matmul_out != "f32":
        raise ValueError(f"unknown matmul_out {cfg.matmul_out!r}")
    return jnp.dot(x, w.astype(cfg.dtype), preferred_element_type=jnp.float32)


def _layer_norm(x, p, eps=1e-5):
    """LayerNorm or RMSNorm, dispatched on the param structure: rms
    params (cfg.norm="rms") carry only a scale — no mean subtraction,
    no bias. Stats in f32 either way."""
    x32 = x.astype(jnp.float32)
    if "bias" not in p:
        ms = (x32 * x32).mean(-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(ms + eps) * p["scale"]).astype(x.dtype)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _badd(t, blk, name, cfg: GPTConfig):
    """t + blk[name] in the compute dtype; identity cast when the bias
    param is absent (cfg.bias=False)."""
    b = blk.get(name)
    return (t if b is None else t + b).astype(cfg.dtype)


def _use_flash(cfg: GPTConfig, S: int, train: bool) -> bool:
    if cfg.flash == "off":
        return False
    if cfg.flash == "on":
        return True
    from ..config import on_tpu

    return on_tpu() and S >= 128 and S % 128 == 0


def _unpack_qkv(qkv, cfg: GPTConfig):
    """Group-major packed (..., W) -> q (..., KV, G, hd), k/v (..., KV, hd).

    The packed qkv layout is kv-group-major — KV groups of (G+2) hd-wide
    chunks, group g = [q_{gG} … q_{gG+G-1} | k_g | v_g] — so whole-group
    tp shards of the W axis are themselves valid packed tensors (see
    ops/pallas/attention.py's packed-layout comment)."""
    KV = _kv_heads(cfg)
    G = cfg.n_head // KV
    hd = cfg.d_model // cfg.n_head
    parts = qkv.reshape(qkv.shape[:-1] + (KV, G + 2, hd))
    return parts[..., :G, :], parts[..., G, :], parts[..., G + 1, :]


def _rope_cos_sin(cfg: GPTConfig, positions):
    """cos/sin tables for rotary embedding: positions (...,) int ->
    (..., hd/2) f32 each (GPT-NeoX half-split convention)."""
    hd = cfg.d_model // cfg.n_head
    inv = cfg.rope_theta ** (
        -jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)          # (hd/2,)
    ang = positions[..., None].astype(jnp.float32) * inv         # (..., hd/2)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin):
    """Rotate the last axis of x (..., hd) by the (..., hd/2) tables
    (broadcasting over leading axes)."""
    x32 = x.astype(jnp.float32)
    x1, x2 = jnp.split(x32, 2, axis=-1)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _split_qkv(qkv, cfg: GPTConfig, B, S):
    """Group-major packed (B, S, W) -> q (B,H,S,hd), k/v (B,H,S,hd), KV
    heads repeated up to H for compute (GQA)."""
    H = cfg.n_head
    KV = _kv_heads(cfg)
    hd = cfg.d_model // H
    q, k, v = _unpack_qkv(qkv, cfg)
    q = q.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if KV != H:
        k = jnp.repeat(k, H // KV, axis=1)
        v = jnp.repeat(v, H // KV, axis=1)
    return q, k, v


def _attention(x, blk, cfg: GPTConfig, dropout_key, train, mesh=None):
    if cfg.window and not cfg.causal:
        raise ValueError(
            "cfg.window (sliding-window attention) requires causal=True; "
            "bidirectional local attention is not supported")
    B, S, D = x.shape
    H = cfg.n_head
    hd = D // H
    from jax.ad_checkpoint import checkpoint_name

    qkv = _body_dot(x, blk["qkv"], cfg)
    qkv = _badd(qkv, blk, "qkv_b", cfg)
    use_flash = _use_flash(cfg, S, train)
    # the packed-qkv kernels slice hd-wide head columns out of the fused
    # (B, S, W) tensor — Mosaic requires last-dim block sizes to be
    # multiples of 128, so hd < 128 falls back to the split layout (whose
    # blocks span the full hd axis and are exempt from the rule). On a
    # mesh, the group-major packed layout makes every whole-group tp
    # shard a valid packed tensor, so the kernel runs per-shard under
    # shard_map as long as tp divides the kv-head count.
    KV = _kv_heads(cfg)
    tp_size = (
        mesh.shape["tp"] if mesh is not None and "tp" in mesh.axis_names
        else 1
    )
    cp_size = (
        mesh.shape["cp"] if mesh is not None and "cp" in mesh.axis_names
        else 1
    )
    if (use_flash and hd % 128 == 0 and KV % tp_size == 0
            and cfg.pos_emb == "learned" and cfg.window == 0
            and cp_size == 1):
        # (rope and sliding-window route through the split path below:
        # rotation happens on the unpacked q/k / the split kernels carry
        # the banded loop bounds; the same flash kernels run)
        # layout-native path: the packed-qkv kernels read head blocks
        # straight from this tensor — no split / transpose / GQA-repeat
        # copies (the body is bandwidth-bound; those copies were ~18% of
        # its HBM traffic). Tagged for the "names" remat policy.
        from ..config import config as _cfg
        from ..ops.pallas.attention import flash_attention_qkv

        qkv = checkpoint_name(qkv, "attn_qkv")
        drop = cfg.dropout if train else 0.0
        # the in-kernel dropout mask adds a (bq, bk) u32 tile to scoped
        # VMEM — at block 1024 that exceeds the 16M limit (measured 19.5M)
        bq = bk = min(cfg.flash_block, S, 512 if drop > 0.0 else 1 << 30)
        seed = (
            jax.random.randint(dropout_key, (), 0, 1 << 30).astype(jnp.float32)
            if drop > 0.0 else None
        )
        interp = _cfg.pallas_interpret
        fast = cfg.flash_softmax == "fast"
        fused = cfg.flash_bwd == "fused"
        if mesh is None:
            out = flash_attention_qkv(
                qkv, seed, H, KV, cfg.causal, None, bq, bk,
                interp, drop, fast, fused,
            )
        else:
            # Pallas calls are not GSPMD-partitionable; shard_map maps
            # the kernel over the ("dp", ·, "tp")-sharded packed tensor —
            # each shard's whole-group W slice feeds the kernel with
            # H/tp local heads, no resharding and no collectives.
            from ..parallel.mesh import shard_map_compat as shard_map
            from jax.sharding import PartitionSpec as _P

            dp_ax = "dp" if "dp" in mesh.axis_names else None
            tp_ax = "tp" if "tp" in mesh.axis_names else None
            spec = _P(dp_ax, None, tp_ax)
            Hl, KVl = H // tp_size, KV // tp_size

            def _fa_packed(qkv_, seed_):
                if seed_ is not None:
                    # decorrelate in-kernel dropout masks across shards:
                    # local (b, h) indices repeat per shard
                    if dp_ax:
                        seed_ = seed_ + lax.axis_index(dp_ax) * 1000003
                    if tp_ax:
                        seed_ = seed_ + lax.axis_index(tp_ax) * 7919
                return flash_attention_qkv(
                    qkv_, seed_, Hl, KVl, cfg.causal, None, bq, bk,
                    interp, drop, fast, fused,
                )

            seed_spec = _P() if seed is not None else None
            if seed is None:
                fa = shard_map(
                    lambda q_: _fa_packed(q_, None), mesh=mesh,
                    in_specs=(spec,), out_specs=spec, check_rep=False,
                )
                out = fa(qkv)
            else:
                fa = shard_map(
                    _fa_packed, mesh=mesh,
                    in_specs=(spec, seed_spec), out_specs=spec,
                    check_rep=False,
                )
                out = fa(qkv, seed)
        out = _body_dot(out, blk["proj"], cfg)
        return _badd(out, blk, "proj_b", cfg)
    q, k, v = _split_qkv(qkv, cfg, B, S)
    if cfg.pos_emb == "rope":
        cos, sin = _rope_cos_sin(cfg, jnp.arange(S))     # (S, hd/2)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
    # tagged so the "names" remat policy keeps them: the flash backward's
    # primals then come from storage instead of a qkv-matmul re-run
    q = checkpoint_name(q, "attn_q")
    k = checkpoint_name(k, "attn_k")
    v = checkpoint_name(v, "attn_v")
    if use_flash:
        from ..config import config as _cfg
        from ..ops.pallas.attention import (
            flash_attention,
            flash_attention_dropout,
        )

        bq = bk = min(cfg.flash_block, S)
        interp = _cfg.pallas_interpret
        drop = cfg.dropout if train else 0.0
        seed = (
            jax.random.randint(dropout_key, (), 0, 1 << 30).astype(jnp.float32)
            if drop > 0.0 else None
        )
        if mesh is not None and cp_size > 1:
            # context parallelism: S-sharded q/k/v feed the ppermute ring
            # (the kv blocks travel chip-to-chip; the full sequence never
            # materialises). The same flash kernels run per hop.
            from ..parallel.mesh import shard_map_compat as shard_map
            from ..parallel.ring import ring_flash_attention
            from jax.sharding import PartitionSpec as _P

            if drop > 0.0:
                raise ValueError(
                    "attention dropout is not supported with context "
                    "parallelism (cp mesh axis); set dropout=0.0"
                )
            if cfg.window:
                raise ValueError(
                    "sliding-window attention is not supported with "
                    "context parallelism (cp mesh axis)"
                )
            dp_ax = "dp" if "dp" in mesh.axis_names else None
            tp_ax = "tp" if "tp" in mesh.axis_names else None
            spec = _P(dp_ax, tp_ax, "cp", None)
            # the block must divide the PER-CHIP sequence; gcd keeps a
            # valid (possibly smaller) block when flash_block doesn't
            s_local = S // cp_size
            bl = math.gcd(min(cfg.flash_block, s_local), s_local)
            fa = shard_map(
                lambda q_, k_, v_: ring_flash_attention(
                    q_, k_, v_, "cp", cp_size, cfg.causal, None, bl, bl,
                    interp
                ),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                check_rep=False,
            )
            out = fa(q, k, v)
        elif mesh is not None:
            # Pallas calls are not GSPMD-partitionable; shard_map maps the
            # kernel over the (dp, tp)-sharded batch/head axes — attention
            # is independent per (batch, head), so no collectives.
            from ..parallel.mesh import shard_map_compat as shard_map
            from jax.sharding import PartitionSpec as _P

            spec = _P("dp", "tp", None, None)
            if drop > 0.0:
                def _fa_drop(q_, k_, v_, s_):
                    # decorrelate masks across shards: local (b, h) indices
                    # repeat per shard, so mix the mesh position in
                    s_ = s_ + (lax.axis_index("dp") * 1000003
                               + lax.axis_index("tp") * 7919)
                    return flash_attention_dropout(
                        q_, k_, v_, s_, cfg.causal, None, bq, bk, interp,
                        drop, cfg.window,
                    )

                fa = shard_map(
                    _fa_drop, mesh=mesh,
                    in_specs=(spec, spec, spec, _P()), out_specs=spec,
                    check_rep=False,
                )
                out = fa(q, k, v, seed)
            else:
                fa = shard_map(
                    lambda q_, k_, v_: flash_attention(
                        q_, k_, v_, cfg.causal, None, bq, bk, interp,
                        cfg.window
                    ),
                    mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                    check_rep=False,
                )
                out = fa(q, k, v)
        elif drop > 0.0:
            out = flash_attention_dropout(
                q, k, v, seed, cfg.causal, None, bq, bk, interp, drop,
                cfg.window
            )
        else:
            out = flash_attention(q, k, v, cfg.causal, None, bq, bk,
                                  interp, cfg.window)
    else:
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        att = att / math.sqrt(hd)
        if cfg.causal:
            mask = jnp.tril(jnp.ones((S, S), bool))
            if cfg.window:
                mask &= ~jnp.tril(jnp.ones((S, S), bool), -cfg.window)
            att = jnp.where(mask, att, -1e30)
        att = jax.nn.softmax(att, axis=-1).astype(cfg.dtype)
        if train and cfg.dropout > 0.0:
            keep = jax.random.bernoulli(dropout_key, 1.0 - cfg.dropout, att.shape)
            att = jnp.where(keep, att / (1.0 - cfg.dropout), 0.0)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
    out = out.astype(cfg.dtype).transpose(0, 2, 1, 3).reshape(B, S, D)
    out = _body_dot(out, blk["proj"], cfg)
    return _badd(out, blk, "proj_b", cfg)


def _mlp(x, blk, cfg: GPTConfig, mesh=None):
    """Returns (out, moe_aux_loss) — aux is 0 for the dense MLP."""
    if cfg.n_experts:
        return _moe_mlp(x, blk, cfg, mesh)
    from jax.ad_checkpoint import checkpoint_name

    if cfg.mlp == "swiglu":
        # g/h carry the saved "names"-policy tags (matmul outputs); the
        # product is one cheap VPU recompute from them, like gelu's
        g = checkpoint_name(
            _badd(_body_dot(x, blk["fc_gate"], cfg), blk, "fc_gate_b", cfg),
            "ffn_gate",
        )
        h = checkpoint_name(
            _badd(_body_dot(x, blk["fc_in"], cfg), blk, "fc_in_b", cfg),
            "ffn_pre",
        )
        h = (jax.nn.silu(g.astype(jnp.float32)) * h).astype(cfg.dtype)
    else:
        h = _badd(_body_dot(x, blk["fc_in"], cfg), blk, "fc_in_b", cfg)
        h = checkpoint_name(h, "ffn_pre")
        h = checkpoint_name(jax.nn.gelu(h), "ffn_act")
    o = _body_dot(h, blk["fc_out"], cfg)
    return _badd(o, blk, "fc_out_b", cfg), jnp.zeros((), jnp.float32)


def _moe_mlp(x, blk, cfg: GPTConfig, mesh=None):
    # Single-token decode always uses the dense (no-drop) dispatch:
    # expert CAPACITY is a training-time construct — at S=1 the capacity
    # count runs over the batch axis, so a popular expert would silently
    # DROP tokens mid-generation (measured: wrong logits at B=8, E=4).
    # Dense dispatch reads each expert's weights once, which is the same
    # HBM traffic that dominates decode anyway.
    if x.shape[1] == 1:
        return _moe_mlp_dense(x, blk, cfg)
    if cfg.moe_impl == "ep":
        if mesh is not None and "ep" in mesh.axis_names:
            return _moe_mlp_ep(x, blk, cfg, mesh)
        return _moe_mlp_sparse(x, blk, cfg)  # single-device semantics
    if cfg.moe_impl == "sparse":
        return _moe_mlp_sparse(x, blk, cfg)
    if cfg.moe_impl == "sort":
        return _moe_mlp_sort(x, blk, cfg)
    return _moe_mlp_dense(x, blk, cfg)


def _moe_gate(x, blk, cfg: GPTConfig):
    gate_logits = jnp.dot(
        x, blk["gate"].astype(cfg.dtype), preferred_element_type=jnp.float32
    )  # (B, S, E)
    probs = jax.nn.softmax(gate_logits, axis=-1)
    return probs.max(axis=-1), probs.argmax(axis=-1), probs


def _moe_aux_loss(sel, probs, n_experts: int):
    """Switch load-balancing loss: E · Σ_e f_e·P_e (uniform routing → 1)."""
    f = jax.nn.one_hot(sel, n_experts, dtype=jnp.float32).reshape(
        -1, n_experts
    ).mean(0)
    p = probs.reshape(-1, n_experts).mean(0)
    return n_experts * jnp.sum(f * p)


def _moe_mlp_dense(x, blk, cfg: GPTConfig):
    """Top-1 gated mixture-of-experts FFN with dense dispatch.

    Every expert processes every token and the top-1 gate combines —
    correct and cleanly shardable (the `E` einsum axis partitions over the
    `ep` mesh axis; GSPMD reduces the combine), at the cost of E× FFN
    FLOPs. `moe_impl="sparse"` below is the capacity-based alternative."""
    top, sel, probs = _moe_gate(x, blk, cfg)
    aux = _moe_aux_loss(sel, probs, cfg.n_experts)
    combine = jax.nn.one_hot(sel, cfg.n_experts, dtype=jnp.float32) * top[..., None]

    h = jnp.einsum(
        "bsd,edf->bsef", x, blk["fc_in"].astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    )
    h = jax.nn.gelu(_badd(h, blk, "fc_in_b", cfg))
    o = jnp.einsum(
        "bsef,efd->bsed", h, blk["fc_out"].astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    )
    o = _badd(o, blk, "fc_out_b", cfg)
    return jnp.einsum("bsed,bse->bsd", o, combine.astype(cfg.dtype)), aux


def _moe_mlp_sparse(x, blk, cfg: GPTConfig):
    """Switch-style top-1 MoE with capacity-based einsum dispatch.

    Tokens are routed to their top expert up to a per-expert capacity
    C = ceil(capacity_factor · tokens / E); overflow tokens pass through
    the residual untouched (their combine weight is zero). Each expert
    computes only C tokens — E× fewer FFN FLOPs than the dense dispatch."""
    B, S, D = x.shape
    E = cfg.n_experts
    N = B * S
    C = max(int(math.ceil(cfg.moe_capacity * N / E)), 1)

    xf = x.reshape(N, D)
    top, sel, probs = _moe_gate(xf[None], {**blk}, cfg)
    top, sel, probs = top[0], sel[0], probs[0]      # (N,) / (N, E)
    aux = _moe_aux_loss(sel, probs, E)
    onehot = jax.nn.one_hot(sel, E, dtype=jnp.float32)      # (N, E)
    # rank of each token within its expert (0-based)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0          # (N, E)
    keep = (pos < C) & (onehot > 0)
    pos = jnp.where(keep, pos, 0.0).astype(jnp.int32)
    # dispatch (N, E, C): token n -> slot (e, c)
    slot = jax.nn.one_hot(pos, C, dtype=jnp.float32) * keep[..., None]
    expert_in = jnp.einsum(
        "nec,nd->ecd", slot.astype(cfg.dtype), xf.astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    ).astype(cfg.dtype)                              # (E, C, D)
    h = jnp.einsum(
        "ecd,edf->ecf", expert_in, blk["fc_in"].astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    )
    h = h + blk["fc_in_b"][:, None, :] if "fc_in_b" in blk else h
    h = jax.nn.gelu(h.astype(cfg.dtype))
    o = jnp.einsum(
        "ecf,efd->ecd", h, blk["fc_out"].astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    )
    o = o + blk["fc_out_b"][:, None, :] if "fc_out_b" in blk else o
    o = o.astype(cfg.dtype)  # (E, C, D)
    combine = slot * top[:, None, None]                      # (N, E, C)
    y = jnp.einsum(
        "nec,ecd->nd", combine.astype(cfg.dtype), o,
        preferred_element_type=jnp.float32,
    ).astype(cfg.dtype)
    return y.reshape(B, S, D), aux


def _moe_mlp_ep(x, blk, cfg: GPTConfig, mesh):
    """Expert-parallel Switch MoE — the GShard/Switch all-to-all pattern
    (`moe_impl="ep"` on a mesh with an "ep" axis).

    Tokens are sharded over ("dp" on batch, "ep" on sequence); each
    device routes its LOCAL tokens into an (E, C, D) capacity buffer,
    one tiled `lax.all_to_all` over "ep" regroups it to (E/ep, ep·C, D)
    — every device now holds exactly its own experts' tokens — the
    expert FFN runs on resident ep-local (and tp-column-sharded) weights
    with a psum over "tp", and a second all-to-all restores dispatch
    order for the local combine. Expert weights never move; token
    traffic is 2 x capacity buffers over ICI. The dense fallback instead
    runs every expert on every token (E x FLOPs); `sparse` keeps the
    capacity math but makes GSPMD move WEIGHTS to tokens under ep
    sharding. Capacity ranking is per-shard (C = ceil(cap·N_local / E)),
    so overflow drops can differ from the single-device impls — with no
    overflow the outputs are identical (tested)."""
    from ..parallel.mesh import shard_map_compat as shard_map

    E = cfg.n_experts
    ep = mesh.shape["ep"]
    has_dp = "dp" in mesh.axis_names
    has_tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1
    if E % ep:
        raise ValueError("moe_impl='ep' needs n_experts % ep == 0")
    tok_axes = ("dp", "ep") if has_dp else ("ep",)

    def local_fn(xl, gate_w, w_in, b_in, w_out, b_out):
        Bl, Sl, D = xl.shape
        Nl = Bl * Sl
        C = max(int(math.ceil(cfg.moe_capacity * Nl / E)), 1)
        xf = xl.reshape(Nl, D)
        logits = jnp.dot(xf, gate_w.astype(cfg.dtype),
                         preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top, sel = probs.max(-1), probs.argmax(-1)
        onehot = jax.nn.one_hot(sel, E, dtype=jnp.float32)
        # load-balancing aux from GLOBAL routing statistics: aux is
        # nonlinear in (f, P), so per-shard aux then pmean would differ
        # from the single-device impls — pmean the statistics instead
        f = lax.pmean(onehot.mean(0), tok_axes)
        pbar = lax.pmean(probs.mean(0), tok_axes)
        aux = E * jnp.sum(f * pbar)
        rank = jnp.cumsum(onehot, axis=0) * onehot - 1.0
        keep = (rank < C) & (onehot > 0)
        rank = jnp.where(keep, rank, 0.0).astype(jnp.int32)
        slot = jax.nn.one_hot(rank, C, dtype=jnp.float32) * keep[..., None]
        ein = jnp.einsum(
            "nec,nd->ecd", slot.astype(cfg.dtype), xf,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)                                  # (E, C, D)
        # dispatch a2a: every ep member keeps its E/ep experts and
        # receives the peers' capacity buffers for them
        ein = lax.all_to_all(ein, "ep", split_axis=0, concat_axis=1,
                             tiled=True)                     # (El, ep·C, D)
        h = jnp.einsum(
            "ecd,edf->ecf", ein, w_in.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
        h = jax.nn.gelu((h + b_in[:, None, :]).astype(cfg.dtype))
        o = jnp.einsum(
            "ecf,efd->ecd", h, w_out.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
        if has_tp:  # Megatron column/row split inside the expert FFN
            o = lax.psum(o, "tp")
        o = (o + b_out[:, None, :]).astype(cfg.dtype)
        # return a2a: restore dispatch order for the local combine
        o = lax.all_to_all(o, "ep", split_axis=1, concat_axis=0,
                           tiled=True)                       # (E, C, D)
        combine = slot * top[:, None, None]
        y = jnp.einsum(
            "nec,ecd->nd", combine.astype(cfg.dtype), o,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
        return y.reshape(Bl, Sl, D), aux

    tok_spec = P("dp" if has_dp else None, "ep", None)
    tp_ax = "tp" if has_tp else None
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(
            tok_spec,                      # x: batch over dp, seq over ep
            P(),                           # gate (D, E) replicated
            P("ep", None, tp_ax),          # fc_in  (E, D, F)
            P("ep", tp_ax),                # fc_in_b (E, F)
            P("ep", tp_ax, None),          # fc_out (E, F, D)
            P("ep", None),                 # fc_out_b (E, D)
        ),
        out_specs=(tok_spec, P()),
        check_rep=False,
    )
    # bias=False: zero biases keep the shard_map signature (the adds are
    # negligible next to the expert FFN einsums)
    E_, _, F_ = blk["fc_in"].shape
    b_in = blk.get("fc_in_b",
                   jnp.zeros((E_, F_), blk["fc_in"].dtype))
    b_out = blk.get("fc_out_b",
                    jnp.zeros((E_, blk["fc_out"].shape[2]),
                              blk["fc_out"].dtype))
    return fn(x, blk["gate"], blk["fc_in"], b_in, blk["fc_out"], b_out)


def _moe_mlp_sort(x, blk, cfg: GPTConfig):
    """Switch-style top-1 MoE with sort-based dispatch.

    Replaces the O(N·E·C·D) one-hot dispatch/combine einsums of
    `_moe_mlp_sparse` with an argsort + row scatter/gather:
    O(N log N) for the sort plus O(N·D) data movement — the FLOPs-credible
    dispatch at scale. Same routing semantics: top-1 expert, per-expert
    capacity C = ceil(capacity_factor·N/E), overflow tokens (ranked by
    original position within their expert — stable sort) are dropped and
    pass through the residual with zero combine weight."""
    B, S, D = x.shape
    E = cfg.n_experts
    N = B * S
    C = max(int(math.ceil(cfg.moe_capacity * N / E)), 1)

    xf = x.reshape(N, D)
    top, sel, probs = _moe_gate(xf[None], {**blk}, cfg)
    top, sel, probs = top[0], sel[0], probs[0]      # (N,) / (N, E)
    aux = _moe_aux_loss(sel, probs, E)

    # stable sort by expert id keeps original token order within an expert
    # (identical keep-set to the cumsum ranking of the einsum path)
    order = jnp.argsort(sel, stable=True)                    # (N,)
    sel_sorted = sel[order]
    # rank within expert: running index minus the expert's start offset
    counts = jnp.bincount(sel, length=E)                     # (N,) -> (E,)
    starts = jnp.cumsum(counts) - counts                     # (E,)
    rank = jnp.arange(N) - starts[sel_sorted]                # (N,)
    keep = rank < C
    dst = jnp.where(keep, sel_sorted * C + rank, E * C)      # overflow slot

    # dispatch: scatter token rows into (E*C [+1 trash], D) expert buffers
    buf = jnp.zeros((E * C + 1, D), cfg.dtype)
    expert_in = buf.at[dst].set(xf[order].astype(cfg.dtype))[:-1]
    expert_in = expert_in.reshape(E, C, D)

    h = jnp.einsum(
        "ecd,edf->ecf", expert_in, blk["fc_in"].astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    )
    h = h + blk["fc_in_b"][:, None, :] if "fc_in_b" in blk else h
    h = jax.nn.gelu(h.astype(cfg.dtype))
    o = jnp.einsum(
        "ecf,efd->ecd", h, blk["fc_out"].astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    )
    o = o + blk["fc_out_b"][:, None, :] if "fc_out_b" in blk else o
    o = o.astype(cfg.dtype)  # (E, C, D)

    # combine: gather each surviving token's expert output back to its
    # original position, weighted by the gate probability
    o_flat = o.reshape(E * C, D)
    gathered = jnp.where(keep[:, None], o_flat[jnp.minimum(dst, E * C - 1)], 0)
    y = jnp.zeros((N, D), cfg.dtype).at[order].set(gathered.astype(cfg.dtype))
    y = y * top[:, None].astype(cfg.dtype)
    return y.reshape(B, S, D), aux


def _seq_shard(x, cfg: GPTConfig, mesh):
    if mesh is None:
        return x
    if "cp" in mesh.axis_names:
        # context parallelism: activations live S-sharded over `cp` for
        # the whole body; attention itself runs the ppermute ring
        # (parallel/ring.py), so the full sequence never gathers.
        dp = "dp" if "dp" in mesh.axis_names else None
        return lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(dp, "cp", None))
        )
    if not cfg.seq_parallel or "tp" not in mesh.axis_names:
        return x
    return lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("dp", "tp", None))
    )


_MATMUL_INPUT_NAMES = (
    # ffn_act (GeLU output) is deliberately NOT saved: it is recomputable
    # from the saved ffn_pre in one cheap VPU pass, and at d_ff=4·d_model
    # it is the single biggest activation (dropping it saved 3.2 GB at the
    # flagship B64 config — the difference between OOM and fitting).
    "ln1_out", "ln2_out", "ffn_pre", "ffn_gate",
    "attn_q", "attn_k", "attn_v", "attn_qkv",
)


def _save_kernel_outputs(prim, *_, **__) -> bool:
    """Remat predicate: save the outputs of Pallas / custom-VJP calls.

    `checkpoint_name` tags cannot reach a custom_vjp's residuals (the call
    is opaque to partial-eval), but the saveable predicate IS consulted for
    the call equation itself — saving its outputs keeps the flash
    out/lse residuals alive so the backward never re-runs the forward
    kernel (verified: grad jaxpr drops from 4 pallas_calls to 3)."""
    return "pallas" in prim.name or "custom_vjp" in prim.name


def _remat_policy(cfg: GPTConfig):
    """Resolve cfg.remat_policy to a jax.checkpoint policy (None = save
    nothing, i.e. classic full-block remat)."""
    cp = jax.checkpoint_policies
    if cfg.remat_policy == "full":
        return None
    if cfg.remat_policy == "flash":
        return _save_kernel_outputs
    if cfg.remat_policy == "names":
        return cp.save_from_both_policies(
            _save_kernel_outputs,
            cp.save_only_these_names(*_MATMUL_INPUT_NAMES),
        )
    if cfg.remat_policy == "dots":
        return cp.dots_with_no_batch_dims_saveable
    if cfg.remat_policy == "flash_dots":
        return cp.save_from_both_policies(
            cp.dots_with_no_batch_dims_saveable, _save_kernel_outputs
        )
    raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")


def _block(x, blk, cfg: GPTConfig, key, train: bool, mesh=None):
    from jax.ad_checkpoint import checkpoint_name

    x = _seq_shard(x, cfg, mesh)
    h1 = checkpoint_name(_layer_norm(x, blk["ln1"], cfg.norm_eps), "ln1_out")
    x = x + _attention(h1, blk, cfg, key, train, mesh)
    x = _seq_shard(x, cfg, mesh)
    h2 = checkpoint_name(_layer_norm(x, blk["ln2"], cfg.norm_eps), "ln2_out")
    m, aux = _mlp(h2, blk, cfg, mesh)
    return x + m, aux


def hidden_states(params, tokens, cfg: GPTConfig, *, train: bool = False,
                  key=None, mesh=None):
    """tokens (B, S) int32 -> final hidden states (B, S, D). Layers run
    under one `lax.scan` over the stacked block params
    (compile-once-per-depth). `mesh` activates shard_map'd kernels in the
    pjit path."""
    B, S = tokens.shape
    # wte is tp-sharded on d_model (Megatron layout); under sp the gather
    # output must be S-sharded with d_model full, and GSPMD cannot reshard
    # D-sharded -> S-sharded efficiently (involuntary full remat warning).
    # Instead: all-gather wte first (one small V x D collective), so the
    # lookup is born replicated and the sp constraint is a local slice.
    wte = params["wte"]
    if mesh is not None and (
        ("cp" in mesh.axis_names)
        or (cfg.seq_parallel and "tp" in mesh.axis_names)
    ):
        wte = lax.with_sharding_constraint(wte, NamedSharding(mesh, P()))
    x = _seq_shard(wte[tokens], cfg, mesh)
    if cfg.pos_emb == "learned":
        x = x + params["wpe"][:S]
    x = x.astype(cfg.dtype)
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, cfg.n_layer)

    block = _block
    if cfg.remat and train:
        policy = _remat_policy(cfg)
        block = jax.checkpoint(
            _block, static_argnums=(2, 4, 5), policy=policy
        )

    if cfg.scan_layers:
        def scan_body(x, layer):
            blk, k = layer
            x, aux = block(x, blk, cfg, k, train, mesh)
            return x, aux

        x, aux = lax.scan(scan_body, x, (params["blocks"], keys))
        aux = aux.sum()
    else:
        aux = jnp.zeros((), jnp.float32)
        for i in range(cfg.n_layer):
            blk_i = jax.tree.map(lambda l, i=i: l[i], params["blocks"])
            x, a = block(x, blk_i, cfg, keys[i], train, mesh)
            aux = aux + a
    return _layer_norm(x, params["ln_f"], cfg.norm_eps), aux


def _head_w(params, cfg: GPTConfig):
    """(V, D) LM-head weight: a separate lm_head param when untied
    (cfg.tied_head=False, llama family), else the shared wte (GPT-2)."""
    return params["lm_head"] if "lm_head" in params else params["wte"]


def forward(params, tokens, cfg: GPTConfig, *, train: bool = False, key=None,
            mesh=None):
    """tokens (B, S) int32 -> logits (B, S, V)."""
    x, _ = hidden_states(params, tokens, cfg, train=train, key=key, mesh=mesh)
    return jnp.dot(
        x, _head_w(params, cfg).T.astype(cfg.dtype),
        preferred_element_type=jnp.float32
    )


def _use_fused_ce(cfg: GPTConfig, rows: int) -> bool:
    if cfg.fused_ce != "on":
        return False
    return rows % 256 == 0 and cfg.vocab_size % 1024 == 0


def loss_fn(params, tokens, targets, cfg: GPTConfig, *, train=False, key=None,
            mesh=None):
    B, S = tokens.shape
    if mesh is None and _use_fused_ce(cfg, B * S):
        from ..ops.pallas.cross_entropy import fused_linear_cross_entropy

        x, aux = hidden_states(params, tokens, cfg, train=train, key=key)
        ce = fused_linear_cross_entropy(
            x.reshape(B * S, cfg.d_model),
            _head_w(params, cfg).astype(cfg.dtype),
            targets.reshape(B * S),
        )
        return ce + cfg.moe_aux_weight * aux
    x, aux = hidden_states(params, tokens, cfg, train=train, key=key, mesh=mesh)
    # logits_dtype="compute" materialises the logits in cfg.dtype (halves
    # the CE tensor traffic) and upcasts on the fly inside the reductions.
    # Measured NEUTRAL-to-negative on v5e (XLA already fuses the f32
    # converts well), so f32 stays the default.
    if cfg.logits_dtype == "compute":
        logits = jnp.dot(x, _head_w(params, cfg).T.astype(cfg.dtype),
                         preferred_element_type=cfg.dtype)
    else:
        logits = jnp.dot(x, _head_w(params, cfg).T.astype(cfg.dtype),
                         preferred_element_type=jnp.float32)
    # CE via gather + logsumexp — never materialises one-hot/log-softmax
    # tensors of shape (B, S, V) beyond the logits themselves.
    logits32 = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits32, axis=-1)
    tgt = jnp.take_along_axis(logits32, targets[..., None], axis=-1)[..., 0]
    return (lse - tgt).mean() + cfg.moe_aux_weight * aux


@functools.lru_cache(maxsize=32)
def make_eval_step(cfg: GPTConfig, *, pad_id: int | None = None):
    """Jitted evaluation step: (params, tokens, targets) ->
    (summed token CE, token count), both f32 scalars. Positions whose
    TARGET equals `pad_id` are excluded, so dataset-level perplexity is
    exact under ragged batching. Cached on (cfg, pad_id): repeated
    evaluate() calls reuse the compiled program."""
    ecfg = dataclasses.replace(cfg, dropout=0.0)

    @jax.jit
    def step(params, tokens, targets):
        B, S = tokens.shape
        x, _ = hidden_states(params, tokens, ecfg, train=False)
        logits = jnp.dot(x, _head_w(params, ecfg).T.astype(ecfg.dtype),
                         preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, targets[..., None],
                                  axis=-1)[..., 0]
        per_pos = lse - tgt
        if pad_id is not None:
            w = (targets != pad_id).astype(jnp.float32)
            return (per_pos * w).sum(), w.sum()
        return per_pos.sum(), jnp.float32(B * S)

    return step


def evaluate(params, cfg: GPTConfig, batches, *, pad_id: int | None = None):
    """Host loop over an iterable of (tokens, targets) batches -> dict
    with dataset-level mean token loss, perplexity, and token count."""
    step = make_eval_step(cfg, pad_id=pad_id)
    total = 0.0
    count = 0.0
    for tokens, targets in batches:
        s, n = step(params, jnp.asarray(tokens), jnp.asarray(targets))
        total += float(s)
        count += float(n)
    if count == 0:
        raise ValueError("evaluate() received no tokens")
    loss = total / count
    return {"loss": loss, "perplexity": math.exp(min(loss, 700.0)),
            "tokens": int(count)}


# --------------------------------------------------------------------------
# training step (pure Adam, reference update rule — adam/mod.rs:117-160)


# Adam over the param pytree — the shared functional rule
# (optim/functional.py, mirroring adam/mod.rs:117-160).
from ..optim.functional import adam_init, adam_update  # noqa: E402


def opt_init(params, cfg: GPTConfig):
    """Adam state for `params`, honouring cfg.opt_state_dtype."""
    dt = jnp.bfloat16 if cfg.opt_state_dtype == "bf16" else None
    return adam_init(params, state_dtype=dt)


def make_train_step(cfg: GPTConfig, *, grad_clip: float = 0.0,
                    accum_steps: int = 1):
    """One fused jitted program: fwd + bwd (+ optional global-norm gradient
    clipping and `accum_steps`-way gradient accumulation) + Adam update.

    With accumulation the batch splits into `accum_steps` microbatches
    processed sequentially under `lax.scan` — same optimizer math as the
    full batch at 1/accum_steps of the activation memory."""
    from ..optim.functional import clip_by_global_norm

    def loss_grads(params, tokens, targets, key):
        return jax.value_and_grad(loss_fn)(
            params, tokens, targets, cfg, train=True, key=key
        )

    def step(params, opt_state, tokens, targets, lr, key):
        if accum_steps > 1:
            B, S = tokens.shape
            if B % accum_steps:
                raise ValueError(
                    f"accum_steps ({accum_steps}) must divide batch ({B})"
                )
            mt = tokens.reshape(accum_steps, B // accum_steps, S)
            mg = targets.reshape(accum_steps, B // accum_steps, S)
            keys = jax.random.split(key, accum_steps)

            def body(carry, mb):
                acc_l, acc_g = carry
                l, g = loss_grads(params, mb[0], mb[1], mb[2])
                return (acc_l + l,
                        jax.tree.map(jnp.add, acc_g, g)), None

            zero = (jnp.zeros((), jnp.float32),
                    jax.tree.map(lambda p: jnp.zeros_like(p), params))
            (loss, grads), _ = lax.scan(body, zero, (mt, mg, keys))
            loss = loss / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
        else:
            loss, grads = loss_grads(params, tokens, targets, key)
        if grad_clip > 0.0:
            grads, _ = clip_by_global_norm(grads, grad_clip)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_sharded_train_step(mesh, cfg: GPTConfig, *, fsdp: bool = False,
                            fsdp_min_size: int = 1 << 16):
    """pjit variant: dp-sharded batch, tp-sharded weights; XLA inserts the
    psum/all-gather collectives over ICI from the shardings.

    `fsdp=True` switches the parameter/optimizer layout to
    `fsdp_param_shardings` (ZeRO-3): weights, grads and Adam moments live
    at 1/dp per chip and GSPMD materialises each weight only at its use
    sites. Same step function, same math — only the stated shardings
    change.

    Pallas calls are not GSPMD-partitionable, so the flash kernel runs
    under `shard_map` over the (dp, tp)-sharded batch/head axes (attention
    is per-(batch, head) independent — no collectives); the fused-CE kernel
    stays off in the sharded path."""
    if cfg.fused_ce != "off":
        cfg = dataclasses.replace(cfg, fused_ce="off")
    shard = (fsdp_param_shardings(mesh, cfg, min_size=fsdp_min_size)
             if fsdp else param_shardings(mesh, cfg))
    opt_shard = {"m": shard, "v": shard, "step": NamedSharding(mesh, P())}
    cp = "cp" if "cp" in mesh.axis_names else None
    data_shard = NamedSharding(mesh, P("dp", cp))
    rep = NamedSharding(mesh, P())

    # Always thread the mesh through: _attention re-decides flash from the
    # *actual* S at trace time, and a Pallas call traced without shard_map
    # inside this GSPMD program would not partition. With the mesh present
    # the flash branch always goes through shard_map, and the non-flash /
    # non-sp paths simply ignore it.
    use_mesh = mesh

    def step(params, opt_state, tokens, targets, lr, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, targets, cfg, train=True, key=key, mesh=use_mesh
        )
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(shard, opt_shard, data_shard, data_shard, rep, rep),
        out_shardings=(shard, opt_shard, rep),
        donate_argnums=(0, 1),
    )


def flops_per_token(cfg: GPTConfig, seq: int) -> float:
    """Training FLOPs/token (fwd+bwd ≈ 3× fwd; causal attention counted at
    S/2 average keys, the PaLM convention)."""
    p_block = 3 * cfg.d_model**2 + cfg.d_model**2 + 2 * cfg.d_model * cfg.d_ff
    p_matmul = cfg.n_layer * p_block + cfg.vocab_size * cfg.d_model
    attn = cfg.n_layer * 2 * seq * cfg.d_model  # (qkᵀ + p·v) · S/2 · 2 FLOPs
    return 3.0 * (2.0 * p_matmul + 2.0 * attn)


def make_pipelined_train_step(mesh, cfg: GPTConfig, n_micro: int):
    """Pipeline-parallel training step over a `pp` mesh axis.

    The stacked block params are split into `n_stages = mesh.shape['pp']`
    stages (leading axis sharded over `pp`); microbatches flow through the
    GPipe schedule in `parallel.pipeline.pipeline_forward`, and `jax.grad`
    differentiates straight through it (the reversed schedule IS the
    backward pipeline). Embedding/head run replicated. Batch must divide
    into `n_micro` microbatches.

    Returns (step_fn, reshape_params) where `reshape_params` converts
    standard `init_params` output into the staged layout."""
    from ..parallel.pipeline import pipeline_forward

    n_stages = mesh.shape["pp"]
    if not cfg.tied_head:
        raise ValueError("pipeline-parallel steps require tied_head=True "
                         "(embedding/head run replicated on one tensor)")
    if cfg.n_layer % n_stages:
        raise ValueError("n_layer must be divisible by the pp stage count")
    per_stage = cfg.n_layer // n_stages

    def reshape_params(params):
        staged = dict(params)
        staged["blocks"] = jax.tree.map(
            lambda l: l.reshape(n_stages, per_stage, *l.shape[1:]),
            params["blocks"],
        )
        return staged

    def stage_fn(stage_blocks, x):
        # run this stage's layers sequentially (aux losses dropped in the
        # pipelined path; use moe_aux_weight=0 here)
        def body(x, blk):
            y, _ = _block(x, blk, cfg, jax.random.key(0), False)
            return y, None

        y, _ = lax.scan(body, x, stage_blocks)
        return y

    pipe = pipeline_forward(stage_fn, mesh)

    def loss_fn_pp(staged, tokens, targets):
        B, S = tokens.shape
        x = staged["wte"][tokens]
        if cfg.pos_emb == "learned":
            x = x + staged["wpe"][:S]
        x = x.astype(cfg.dtype)
        micro = x.reshape(n_micro, B // n_micro, S, cfg.d_model)
        y = pipe(staged["blocks"], micro).reshape(B, S, cfg.d_model)
        y = _layer_norm(y, staged["ln_f"], cfg.norm_eps)
        logits32 = jnp.dot(
            y, staged["wte"].T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits32, axis=-1)
        tgt = jnp.take_along_axis(logits32, targets[..., None], axis=-1)[..., 0]
        return (lse - tgt).mean()

    def step(staged, opt_state, tokens, targets, lr):
        loss, grads = jax.value_and_grad(loss_fn_pp)(staged, tokens, targets)
        staged, opt_state = adam_update(staged, grads, opt_state, lr)
        return staged, opt_state, loss

    blocks_spec = jax.tree.map(lambda _: NamedSharding(mesh, P("pp")), {"x": 0})
    rep = NamedSharding(mesh, P())

    def shardings_of(staged):
        return {
            "wte": rep,
            **({"wpe": rep} if "wpe" in staged else {}),
            "ln_f": jax.tree.map(lambda _: rep, staged["ln_f"]),
            "blocks": jax.tree.map(
                lambda _: NamedSharding(mesh, P("pp")), staged["blocks"]
            ),
        }

    def jit_step(staged, opt_state, tokens, targets, lr):
        shard = shardings_of(staged)
        opt_shard = {"m": shard, "v": shard, "step": rep}
        return jax.jit(
            step,
            in_shardings=(shard, opt_shard, rep, rep, rep),
            out_shardings=(shard, opt_shard, rep),
        )(staged, opt_state, tokens, targets, lr)

    return jit_step, reshape_params


def make_pipelined_train_step_1f1b(mesh, cfg: GPTConfig, n_micro: int):
    """Pipeline-parallel training step with the 1F1B interleaved schedule
    (parallel.pipeline.pipeline_train_1f1b): activation footprint
    O(stages) instead of O(microbatches), MoE aux losses flow, and the
    embedding/head (tied wte) gradients chain through the returned
    microbatch-input cotangents.

    Returns (step_fn, reshape_params) like make_pipelined_train_step."""
    from ..parallel.pipeline import pipeline_train_1f1b

    n_stages = mesh.shape["pp"]
    if not cfg.tied_head:
        raise ValueError("pipeline-parallel steps require tied_head=True "
                         "(embedding/head run replicated on one tensor)")
    if cfg.n_layer % n_stages:
        raise ValueError("n_layer must be divisible by the pp stage count")
    per_stage = cfg.n_layer // n_stages

    def reshape_params(params):
        staged = dict(params)
        staged["blocks"] = jax.tree.map(
            lambda l: l.reshape(n_stages, per_stage, *l.shape[1:]),
            params["blocks"],
        )
        return staged

    def stage_fn(stage_blocks, x):
        def body(carry, blk):
            x, aux = carry
            y, a = _block(x, blk, cfg, jax.random.key(0), False)
            return (y, aux + a), None

        (y, aux), _ = lax.scan(body, (x, jnp.zeros((), jnp.float32)),
                               stage_blocks)
        return y, aux

    def loss_fn_micro(y, tgt, lp):
        y = _layer_norm(y, lp["ln_f"], cfg.norm_eps)
        logits32 = jnp.dot(
            y, lp["wte"].T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits32, axis=-1)
        t = jnp.take_along_axis(logits32, tgt[..., None], axis=-1)[..., 0]
        return (lse - t).mean()

    pipe = pipeline_train_1f1b(stage_fn, loss_fn_micro, mesh,
                               aux_weight=cfg.moe_aux_weight)

    def loss_and_grads(staged, tokens, targets):
        B, S = tokens.shape
        lp = {"wte": staged["wte"], "ln_f": staged["ln_f"]}

        def embed(wte, wpe):
            x = wte[tokens]
            if cfg.pos_emb == "learned":
                x = x + wpe[:S]
            x = x.astype(cfg.dtype)
            return x.reshape(n_micro, B // n_micro, S, cfg.d_model)

        micro_x, embed_vjp = jax.vjp(
            embed, staged["wte"],
            staged["wpe"] if cfg.pos_emb == "learned"
            else jnp.zeros((0,), jnp.float32))
        micro_t = targets.reshape(n_micro, B // n_micro, S)
        loss, gblocks, gloss, dmicro = pipe(
            staged["blocks"], lp, micro_x, micro_t
        )
        d_wte_embed, d_wpe = embed_vjp(dmicro.astype(micro_x.dtype))
        grads = {
            "blocks": gblocks,
            "wte": gloss["wte"] + d_wte_embed,
            "ln_f": gloss["ln_f"],
        }
        if cfg.pos_emb == "learned":
            grads["wpe"] = d_wpe
        return loss, grads

    def step(staged, opt_state, tokens, targets, lr):
        loss, grads = loss_and_grads(staged, tokens, targets)
        staged, opt_state = adam_update(staged, grads, opt_state, lr)
        return staged, opt_state, loss

    rep = NamedSharding(mesh, P())

    def shardings_of(staged):
        return {
            "wte": rep,
            **({"wpe": rep} if "wpe" in staged else {}),
            "ln_f": jax.tree.map(lambda _: rep, staged["ln_f"]),
            "blocks": jax.tree.map(
                lambda _: NamedSharding(mesh, P("pp")), staged["blocks"]
            ),
        }

    def jit_step(staged, opt_state, tokens, targets, lr):
        shard = shardings_of(staged)
        opt_shard = {"m": shard, "v": shard, "step": rep}
        return jax.jit(
            step,
            in_shardings=(shard, opt_shard, rep, rep, rep),
            out_shardings=(shard, opt_shard, rep),
        )(staged, opt_state, tokens, targets, lr)

    return jit_step, reshape_params


# --------------------------------------------------------------------------
# serving: KV-cache incremental decoding


def _require_causal(cfg: GPTConfig, what: str):
    if not cfg.causal:
        raise ValueError(
            f"{what} requires a causal (decoder) model; this config is a "
            "bidirectional encoder (causal=False) — see models/bert.py"
        )


def init_kv_cache(cfg: GPTConfig, batch: int, quant: str | None = None):
    """Per-layer K/V ring buffers (L, B, KV, max_seq, hd) + position —
    with GQA the cache is n_head/n_kv_head times smaller. With
    `quant="int8-kv"` K/V store int8 with a per-(token, head) scale:
    at large batch the per-step cache read rivals the weight read, so
    int8 K/V halves the dominant traffic there."""
    hd = cfg.d_model // cfg.n_head
    shape = (cfg.n_layer, batch, _kv_heads(cfg), cfg.max_seq, hd)
    if quant == "int8-kv":
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(shape[:-1] + (1,), jnp.float32),
            "vs": jnp.zeros(shape[:-1] + (1,), jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def _quant_kv(t):
    """Per-(token, head) symmetric int8 over the hd axis: (B, KV, 1, hd)
    -> int8 values + f32 scale (B, KV, 1, 1)."""
    s = jnp.maximum(jnp.max(jnp.abs(t.astype(jnp.float32)), -1,
                            keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127).astype(
        jnp.int8)
    return q, s


def _quant_w(w, axis):
    """Symmetric per-out-channel int8: returns {"q8": int8, "s": f32}.
    `axis` is the contraction (input) axis reduced when computing scales."""
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis,
                            keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(
        jnp.int8)
    return {"q8": q, "s": s}


def _quant_w4(w, group: int = 128):
    """Group-wise symmetric int4 over the contraction axis (always the
    second-to-last axis here): values in [-7, 7] with one f32 scale per
    `group`-sized slice of that axis (per-group scales recover most of
    the accuracy a single per-channel scale loses at 4 bits). Two
    consecutive contraction-axis nibbles are PACKED into one int8 byte
    (low nibble = even index) — the packed form crosses jit boundaries
    as plain int8, and `_qdot` unpacks with two arithmetic shifts.
    Returns {"q4p": int8 (..., K/g, g/2, N), "s4": f32 (..., K/g, 1, N)}."""
    K, N = w.shape[-2], w.shape[-1]
    if K % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, got {K}")
    g = group if (K % group == 0) else K
    w32 = w.astype(jnp.float32).reshape(w.shape[:-2] + (K // g, g, N))
    s = jnp.maximum(jnp.max(jnp.abs(w32), -2, keepdims=True), 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / s), -7, 7).astype(jnp.int8)
    lo, hi = q[..., 0::2, :], q[..., 1::2, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return {"q4p": packed, "s4": s}


def dequant_w4(w: dict, dtype) -> jax.Array:
    """Inverse of `_quant_w4`: unpack the nibbles with two arithmetic
    shifts, apply per-group scales in f32, emit `dtype` at the original
    (..., K, N) shape. HBM reads the int4 bytes; the dequant multiply
    rides the VMEM pass (used by serving's W4A16 dot and by QLoRA's
    merged-weight reconstruction)."""
    p, s = w["q4p"], w["s4"]                     # (G, g/2, N), (G, 1, N)
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)      # sign-extend low
    hi = jnp.right_shift(p, 4)                         # arithmetic: high
    q = jnp.stack([lo, hi], axis=-2)                   # (G, g/2, 2, N)
    q = q.reshape(p.shape[:-2] + (p.shape[-2] * 2, p.shape[-1]))
    wd = (q.astype(jnp.float32) * s).astype(dtype)
    return wd.reshape(wd.shape[:-3] + (-1, wd.shape[-1]))


def _quant_decode_params(params, cfg: GPTConfig, bits: int = 8):
    """Weight quantization for serving. `bits=8`: W8A8 with dynamic
    per-token activation scales — see `_qdot`. `bits=4`: W4A16 —
    group-wise int4 body weights dequantized to the compute dtype on
    read (decode is weight-bandwidth-bound, so int4 halves the dominant
    HBM traffic again vs int8; the dequant multiply rides the same VMEM
    pass). The embedding lookup keeps a compute-dtype `wte` (table reads
    are gathers, not matmuls); the LM head gets its own quantized (D, V)
    int8 matrix in BOTH modes (the output distribution is the most
    quantization-sensitive tensor). LayerNorm params and biases stay
    f32. MoE expert weights are left in compute dtype (dense no-drop
    dispatch reads them once per token anyway)."""
    p = dict(params)
    p["wte"] = params["wte"].astype(cfg.dtype)
    if "wpe" in params:
        p["wpe"] = params["wpe"].astype(cfg.dtype)
    p["head"] = _quant_w(_head_w(params, cfg).T, axis=0)  # (D, V), s (1, V)
    p.pop("lm_head", None)  # folded into the quantized head
    b = dict(params["blocks"])
    for name in ("qkv", "proj", "fc_in", "fc_out", "fc_gate"):
        if name in b and b[name].ndim == 3:  # (L, D_in, D_out)
            b[name] = (_quant_w(b[name], axis=1) if bits == 8
                       else _quant_w4(b[name]))
    if "gate" in b:
        b["gate"] = b["gate"].astype(cfg.dtype)
    for name in ("fc_in", "fc_out"):  # MoE experts: (L, E, D, F) stays
        if name in b and not isinstance(b[name], dict):
            b[name] = b[name].astype(cfg.dtype)
    p["blocks"] = b
    return p


def _qdot(x, w, cfg: GPTConfig):
    """Decode matmul: plain compute-dtype dot; a W8A8 int8 MXU dot with
    a dynamic per-token activation scale when `w` came from `_quant_w`
    (int32 accumulation, rescaled to f32, ~0.5-1% error per channel); or
    a W4A16 dot when `w` came from `_quant_w4` (nibbles unpacked with
    two arithmetic shifts, dequantized per group in VMEM, bf16 MXU dot —
    HBM reads the int4 bytes, not the dequantized matrix)."""
    if isinstance(w, dict) and "q4p" in w:
        wd = dequant_w4(w, cfg.dtype)                            # (K, N)
        return jnp.dot(x.astype(cfg.dtype), wd,
                       preferred_element_type=jnp.float32)
    if isinstance(w, dict):
        xs = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32)), -1, keepdims=True),
            1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127,
                      127).astype(jnp.int8)
        y = lax.dot_general(
            xq, w["q8"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * xs * w["s"].reshape(
            (1,) * (y.ndim - 1) + (-1,))
    return jnp.dot(x, w.astype(cfg.dtype), preferred_element_type=jnp.float32)


def _cast_decode_params(params, cfg: GPTConfig):
    """Cast the big weight matrices to the compute dtype ONCE per decode
    program (decode is weight-bandwidth-bound: re-reading f32 weights
    every token doubles the traffic). LayerNorm scales and biases stay
    f32. Both decode entry points apply this, so the host-loop
    `generate` and the scanned `make_generate` compute identically."""
    p = dict(params)
    p["wte"] = params["wte"].astype(cfg.dtype)
    if "wpe" in params:
        p["wpe"] = params["wpe"].astype(cfg.dtype)
    b = dict(params["blocks"])
    for name in ("qkv", "proj", "fc_in", "fc_out", "fc_gate", "gate"):
        if name in b:
            b[name] = b[name].astype(cfg.dtype)
    p["blocks"] = b
    if "lm_head" in params:
        p["lm_head"] = params["lm_head"].astype(cfg.dtype)
    return p


def _lora_delta(h, ab, name, sel, cfg: GPTConfig):
    """Per-slot low-rank correction for serving with MANY adapters
    resident at once (S-LoRA): `ab` holds ONE layer's stacked adapters
    {name: {"A": (NA, d_in, r), "B": (NA, r, d_out)}} and `sel` (B,)
    names each sequence's adapter (0 = the zero adapter = base model).
    The correction (h @ A[sel]) @ B[sel] costs O(B·d·r) — merging
    per-request weights would cost a full weight-tree copy per request
    and could not serve two adapters in one batched step at all.
    alpha/r is folded into B at registration (serving.register_adapter)."""
    if ab is None or name not in ab:
        return None
    A = ab[name]["A"][sel].astype(cfg.dtype)      # (B, d_in, r)
    Bm = ab[name]["B"][sel].astype(cfg.dtype)     # (B, r, d_out)
    t = jnp.einsum("bqd,bdr->bqr", h.astype(cfg.dtype), A,
                   preferred_element_type=jnp.float32).astype(cfg.dtype)
    return jnp.einsum("bqr,bro->bqo", t, Bm,
                      preferred_element_type=jnp.float32).astype(cfg.dtype)


def _ldot(h, blk, name, cfg: GPTConfig, ab=None, sel=None):
    """`_qdot` plus the optional per-slot LoRA correction."""
    y = _qdot(h, blk[name], cfg)
    d = _lora_delta(h, ab, name, sel, cfg)
    return y if d is None else y + d


def _decode_qkv(x, blk, cfg: GPTConfig, pos=None, ab=None, sel=None):
    """q (B,KV,G,1,hd), new-token k/v (B,KV,1,hd) for one layer. `pos`
    (scalar or (B,)) rotates q/k under rope — keys enter the cache
    post-rotation, so cached reads need no re-rotation."""
    B = x.shape[0]
    H = cfg.n_head
    hd = cfg.d_model // H
    KV = _kv_heads(cfg)
    G = H // KV
    h = _layer_norm(x, blk["ln1"], cfg.norm_eps)
    qkv = _ldot(h, blk, "qkv", cfg, ab, sel)
    qkv = _badd(qkv, blk, "qkv_b", cfg)
    # grouped-query attention without materialising repeated K/V: fold the
    # group axis into the query side (g = H/KV queries share a KV head)
    q, k, v = _unpack_qkv(qkv, cfg)        # q (B,1,KV,G,hd), k/v (B,1,KV,hd)
    if cfg.pos_emb == "rope":
        cos, sin = _rope_cos_sin(cfg, jnp.asarray(pos))
        if jnp.ndim(pos):                  # per-slot positions (B,)
            q = _apply_rope(q, cos[:, None, None, None, :],
                            sin[:, None, None, None, :])
            k = _apply_rope(k, cos[:, None, None, :], sin[:, None, None, :])
        else:
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)
    q = q.transpose(0, 2, 3, 1, 4)          # (B,KV,G,1,hd)
    k = k.transpose(0, 2, 1, 3)             # (B,KV,1,hd)
    v = v.transpose(0, 2, 1, 3)
    return q, k, v


def _decode_block(x, blk, q, lk, lv, pos, cfg: GPTConfig, ab=None,
                  sel=None):
    """Attention + MLP for a single new token x (B, 1, D). `q` comes from
    `_decode_qkv`; `lk`/`lv` are this layer's cached K/V (B, KV, S, hd)
    ALREADY holding the new token at `pos` (the cache write happens in
    the caller, touching just position `pos`). `ab`/`sel` route per-slot
    LoRA adapters (see `_lora_delta`)."""
    B = x.shape[0]
    hd = cfg.d_model // cfg.n_head
    att = jnp.einsum("bkgqd,bksd->bkgqs", q, lk,
                     preferred_element_type=jnp.float32) / math.sqrt(hd)
    idx = jax.lax.broadcasted_iota(jnp.int32, att.shape, 4)
    # pos is a scalar (lockstep decode) or (B,) (slot-based serving with
    # per-slot positions — see make_slot_decode_step)
    pos_b = pos if jnp.ndim(pos) == 0 else pos.reshape(B, 1, 1, 1, 1)
    keep = idx <= pos_b
    if cfg.window:
        keep &= pos_b - idx < cfg.window
    att = jnp.where(keep, att, -1e30)
    att = jax.nn.softmax(att, axis=-1).astype(cfg.dtype)
    ctx = jnp.einsum("bkgqs,bksd->bkgqd", att, lv,
                     preferred_element_type=jnp.float32).astype(cfg.dtype)
    ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(B, 1, cfg.d_model)
    return _decode_post(x, blk, ctx, cfg, ab, sel)


def _decode_post(x, blk, ctx, cfg: GPTConfig, ab=None, sel=None):
    """Post-attention half of a decode block: output projection,
    residual, MLP. `ctx` is the merged-heads attention output
    (B, 1, D)."""
    ctx = _ldot(ctx, blk, "proj", cfg, ab, sel)
    x = x + _badd(ctx, blk, "proj_b", cfg)
    x = x + _decode_mlp(_layer_norm(x, blk["ln2"], cfg.norm_eps), blk, cfg,
                        ab, sel)
    return x


def _decode_mlp(x, blk, cfg: GPTConfig, ab=None, sel=None):
    mlp_lora = ab is not None and any(
        k in ab for k in ("fc_in", "fc_out", "fc_gate"))
    if isinstance(blk["fc_in"], dict) or mlp_lora:
        h = _ldot(x, blk, "fc_in", cfg, ab, sel)
        h = _badd(h, blk, "fc_in_b", cfg)
        if cfg.mlp == "swiglu":
            g = _badd(_ldot(x, blk, "fc_gate", cfg, ab, sel), blk,
                      "fc_gate_b", cfg)
            h = (jax.nn.silu(g.astype(jnp.float32)) * h).astype(cfg.dtype)
        else:
            h = jax.nn.gelu(h)
        o = _ldot(h, blk, "fc_out", cfg, ab, sel)
        return _badd(o, blk, "fc_out_b", cfg)
    return _mlp(x, blk, cfg)[0]


def _prefill_body(params, cache, prompt, cfg: GPTConfig, ab=None, sel=None,
                  last=None):
    """Batched prefill: ONE MXU-efficient pass over the whole prompt
    (B, P) fills the KV cache and returns the last position's logits.
    The previous scanned prefill paid P sequential single-token steps —
    each reading all weights — so long prompts cost as much as decoding
    them (~half the serving time at P=128/N=256). Shares `_qdot` /
    `_quant_kv`, so all quant modes work identically. `ab` (stacked
    adapters, leading layer axis — see `_lora_delta`) and `sel` (B,)
    apply per-row LoRA corrections during the prompt pass.

    `last` (traced scalar, default P-1) indexes the position whose
    logits are returned — BUCKETED prefill pads the prompt to a shape
    bucket and asks for position plen-1; the padded tail's K/V land at
    positions >= plen, which decode overwrites before it ever attends
    them (the causal mask keeps real positions blind to the tail, so
    the state through plen is bit-identical to an exact-shape
    prefill)."""
    B, P = prompt.shape
    H = cfg.n_head
    KV = _kv_heads(cfg)
    hd = cfg.d_model // H
    G = H // KV
    quant_kv = "ks" in cache
    x = params["wte"][prompt]
    if cfg.pos_emb == "learned":
        x = x + params["wpe"][:P]
    x = x.astype(cfg.dtype)
    if cfg.pos_emb == "rope":
        r_cos, r_sin = _rope_cos_sin(cfg, jnp.arange(P))    # (P, hd/2)

    def body(carry, inp):
        x, rest = carry[0], carry[1:]
        blk, ab_l, l = inp
        h = _layer_norm(x, blk["ln1"], cfg.norm_eps)
        qkv = _ldot(h, blk, "qkv", cfg, ab_l, sel)
        qkv = _badd(qkv, blk, "qkv_b", cfg)
        q, k, v = _unpack_qkv(qkv, cfg)
        if cfg.pos_emb == "rope":      # q/k (B,P,KV,{G,}hd): rotate by P
            q = _apply_rope(q, r_cos[:, None, None, :],
                            r_sin[:, None, None, :])
            k = _apply_rope(k, r_cos[:, None, :], r_sin[:, None, :])
        q = q.transpose(0, 2, 3, 1, 4)                     # (B,KV,G,P,hd)
        k = k.transpose(0, 2, 1, 3)                        # (B,KV,P,hd)
        v = v.transpose(0, 2, 1, 3)
        att = jnp.einsum("bkgqd,bksd->bkgqs", q, k,
                         preferred_element_type=jnp.float32) / math.sqrt(hd)
        iq = jax.lax.broadcasted_iota(jnp.int32, att.shape, 3)
        ik = jax.lax.broadcasted_iota(jnp.int32, att.shape, 4)
        keep = ik <= iq
        if cfg.window:
            keep &= iq - ik < cfg.window
        att = jnp.where(keep, att, -1e30)
        att = jax.nn.softmax(att, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bkgqs,bksd->bkgqd", att, v,
                         preferred_element_type=jnp.float32).astype(
            cfg.dtype)
        ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(B, P, cfg.d_model)
        ctx = _ldot(ctx, blk, "proj", cfg, ab_l, sel)
        x = x + _badd(ctx, blk, "proj_b", cfg)
        x = x + _decode_mlp(_layer_norm(x, blk["ln2"], cfg.norm_eps), blk,
                            cfg, ab_l, sel)
        at = (l, 0, 0, 0, 0)
        if quant_kv:
            ck, cv, cks, cvs = rest
            k8, ks_ = _quant_kv(k)
            v8, vs_ = _quant_kv(v)
            ck = lax.dynamic_update_slice(ck, k8[None], at)
            cv = lax.dynamic_update_slice(cv, v8[None], at)
            cks = lax.dynamic_update_slice(cks, ks_[None], at)
            cvs = lax.dynamic_update_slice(cvs, vs_[None], at)
            return (x, ck, cv, cks, cvs), None
        ck, cv = rest
        ck = lax.dynamic_update_slice(ck, k[None], at)
        cv = lax.dynamic_update_slice(cv, v[None], at)
        return (x, ck, cv), None

    keys = (("k", "v", "ks", "vs") if quant_kv else ("k", "v"))
    carry, _ = lax.scan(
        body, (x,) + tuple(cache[n] for n in keys),
        (params["blocks"], ab, jnp.arange(cfg.n_layer)))
    if last is None:
        x_last = carry[0][:, -1]
    else:
        idx = jnp.broadcast_to(
            jnp.asarray(last, jnp.int32).reshape(-1, 1, 1), (B, 1, 1))
        x_last = jnp.take_along_axis(carry[0], idx, axis=1)[:, 0]
    x = _layer_norm(x_last, params["ln_f"], cfg.norm_eps)
    head = params.get("head")
    if head is not None:
        logits = _qdot(x, head, cfg)
    else:
        logits = jnp.dot(
            x, _head_w(params, cfg).T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
    new_cache = dict(zip(keys, carry[1:]))
    new_cache["pos"] = cache["pos"] + P
    return logits, new_cache


def _verify_body(params, cache, tokens, cfg: GPTConfig, ab=None, sel=None):
    """Chunked decode for speculative verification: process `tokens`
    (B, C) starting at cache position `pos` in ONE batched pass (the
    target model scores a draft's C proposals for the cost of roughly
    one decode step — decode is weight-bound, so reading the weights
    once for C tokens is the entire win). K/V are written at positions
    pos..pos+C-1; each query at pos+i attends cache keys <= pos+i.
    Returns (logits (B, C, V), cache with pos advanced by C).
    `ab`/`sel` apply per-row LoRA corrections (see `_lora_delta`) —
    used by chunked prefill under multi-adapter serving."""
    B, C = tokens.shape
    H = cfg.n_head
    KV = _kv_heads(cfg)
    hd = cfg.d_model // H
    G = H // KV
    pos = cache["pos"]
    quant_kv = "ks" in cache
    x = params["wte"][tokens]
    if cfg.pos_emb == "learned":
        x = x + lax.dynamic_slice_in_dim(params["wpe"], pos, C)[None]
    x = x.astype(cfg.dtype)
    if cfg.pos_emb == "rope":
        r_cos, r_sin = _rope_cos_sin(cfg, pos + jnp.arange(C))  # (C, hd/2)

    def body(carry, inp):
        x, rest = carry[0], carry[1:]
        blk, ab_l, l = inp
        h = _layer_norm(x, blk["ln1"], cfg.norm_eps)
        qkv = _ldot(h, blk, "qkv", cfg, ab_l, sel)
        qkv = _badd(qkv, blk, "qkv_b", cfg)
        q, k, v = _unpack_qkv(qkv, cfg)
        if cfg.pos_emb == "rope":
            q = _apply_rope(q, r_cos[:, None, None, :],
                            r_sin[:, None, None, :])
            k = _apply_rope(k, r_cos[:, None, :], r_sin[:, None, :])
        q = q.transpose(0, 2, 3, 1, 4)                     # (B,KV,G,C,hd)
        k = k.transpose(0, 2, 1, 3)                        # (B,KV,C,hd)
        v = v.transpose(0, 2, 1, 3)
        at = (l, 0, 0, pos, 0)
        if quant_kv:
            ck, cv, cks, cvs = rest
            k8, ks_ = _quant_kv(k)
            v8, vs_ = _quant_kv(v)
            ck = lax.dynamic_update_slice(ck, k8[None], at)
            cv = lax.dynamic_update_slice(cv, v8[None], at)
            cks = lax.dynamic_update_slice(cks, ks_[None], at)
            cvs = lax.dynamic_update_slice(cvs, vs_[None], at)
            lk = (lax.dynamic_index_in_dim(ck, l, 0, False).astype(
                cfg.dtype) * lax.dynamic_index_in_dim(cks, l, 0, False
                                                      ).astype(cfg.dtype))
            lv = (lax.dynamic_index_in_dim(cv, l, 0, False).astype(
                cfg.dtype) * lax.dynamic_index_in_dim(cvs, l, 0, False
                                                      ).astype(cfg.dtype))
            rest = (ck, cv, cks, cvs)
        else:
            ck, cv = rest
            ck = lax.dynamic_update_slice(ck, k[None], at)
            cv = lax.dynamic_update_slice(cv, v[None], at)
            lk = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
            lv = lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
            rest = (ck, cv)
        att = jnp.einsum("bkgqd,bksd->bkgqs", q, lk,
                         preferred_element_type=jnp.float32) / math.sqrt(hd)
        iq = lax.broadcasted_iota(jnp.int32, att.shape, 3)  # 0..C-1
        ik = lax.broadcasted_iota(jnp.int32, att.shape, 4)  # 0..S-1
        keep = ik <= pos + iq
        if cfg.window:
            keep &= pos + iq - ik < cfg.window
        att = jnp.where(keep, att, -1e30)
        att = jax.nn.softmax(att, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bkgqs,bksd->bkgqd", att, lv,
                         preferred_element_type=jnp.float32).astype(
            cfg.dtype)
        ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(B, C, cfg.d_model)
        ctx = _ldot(ctx, blk, "proj", cfg, ab_l, sel)
        x = x + _badd(ctx, blk, "proj_b", cfg)
        x = x + _decode_mlp(_layer_norm(x, blk["ln2"], cfg.norm_eps), blk,
                            cfg, ab_l, sel)
        return (x,) + rest, None

    keys = (("k", "v", "ks", "vs") if quant_kv else ("k", "v"))
    carry, _ = lax.scan(
        body, (x,) + tuple(cache[n] for n in keys),
        (params["blocks"], ab, jnp.arange(cfg.n_layer)))
    x = _layer_norm(carry[0], params["ln_f"], cfg.norm_eps)
    head = params.get("head")
    if head is not None:
        logits = _qdot(x, head, cfg)
    else:
        logits = jnp.dot(
            x, _head_w(params, cfg).T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
    new_cache = dict(zip(keys, carry[1:]))
    new_cache["pos"] = pos + C
    return logits, new_cache


def _decode_step_body(params, cache, token, cfg: GPTConfig):
    """Single-token decode body (untraced): (params, cache, token (B,)) ->
    (logits (B, V), cache). Shared by the jitted per-token step and the
    fully on-device `make_generate` scan.

    The full (L, B, KV, S, hd) caches are CARRIED through the layer scan
    and updated with a position-`pos` dynamic_update_slice — XLA aliases
    the loop carry, so each step writes only the new token's K/V. (The
    previous formulation emitted every layer's whole cache as a scan
    output: a full-cache rewrite per token, ~100x the necessary write
    traffic at large B·S.)"""
    pos = cache["pos"]
    x = params["wte"][token][:, None, :]
    if cfg.pos_emb == "learned":
        x = x + lax.dynamic_slice_in_dim(params["wpe"], pos, 1)  # (1, D)
    x = x.astype(cfg.dtype)
    L = cfg.n_layer

    if "ks" in cache:  # int8 K/V cache (see init_kv_cache)
        def body(carry, inp):
            x, ck, cv, cks, cvs = carry
            blk, l = inp
            q, k_new, v_new = _decode_qkv(x, blk, cfg, pos)
            k8, ks_ = _quant_kv(k_new)
            v8, vs_ = _quant_kv(v_new)
            at = (l, 0, 0, pos, 0)
            ck = lax.dynamic_update_slice(ck, k8[None], at)
            cv = lax.dynamic_update_slice(cv, v8[None], at)
            cks = lax.dynamic_update_slice(cks, ks_[None], at)
            cvs = lax.dynamic_update_slice(cvs, vs_[None], at)
            # dequant on read in the compute dtype (a f32 intermediate
            # would double the dequant-pass traffic)
            lk = (lax.dynamic_index_in_dim(ck, l, 0, False).astype(
                cfg.dtype) * lax.dynamic_index_in_dim(cks, l, 0, False
                                                      ).astype(cfg.dtype))
            lv = (lax.dynamic_index_in_dim(cv, l, 0, False).astype(
                cfg.dtype) * lax.dynamic_index_in_dim(cvs, l, 0, False
                                                      ).astype(cfg.dtype))
            x = _decode_block(x, blk, q, lk, lv, pos, cfg)
            return (x, ck, cv, cks, cvs), None

        (x, ks, vs, kss, vss), _ = lax.scan(
            body,
            (x, cache["k"], cache["v"], cache["ks"], cache["vs"]),
            (params["blocks"], jnp.arange(L)))
        x = _layer_norm(x, params["ln_f"], cfg.norm_eps)
        head = params.get("head")
        if head is not None:
            logits = _qdot(x[:, 0], head, cfg)
        else:
            logits = jnp.dot(
                x[:, 0], _head_w(params, cfg).T.astype(cfg.dtype),
                preferred_element_type=jnp.float32,
            )
        return logits, {"k": ks, "v": vs, "ks": kss, "vs": vss,
                        "pos": pos + 1}

    def body(carry, inp):
        x, ck, cv = carry
        blk, l = inp
        q, k_new, v_new = _decode_qkv(x, blk, cfg, pos)
        ck = lax.dynamic_update_slice(ck, k_new[None], (l, 0, 0, pos, 0))
        cv = lax.dynamic_update_slice(cv, v_new[None], (l, 0, 0, pos, 0))
        lk = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
        lv = lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
        x = _decode_block(x, blk, q, lk, lv, pos, cfg)
        return (x, ck, cv), None

    (x, ks, vs), _ = lax.scan(
        body, (x, cache["k"], cache["v"]),
        (params["blocks"], jnp.arange(L)))
    x = _layer_norm(x, params["ln_f"], cfg.norm_eps)
    head = params.get("head")
    if head is not None:  # int8 serving path
        logits = _qdot(x[:, 0], head, cfg)
    else:
        logits = jnp.dot(
            x[:, 0], _head_w(params, cfg).T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
    return logits, {"k": ks, "v": vs, "pos": pos + 1}


def _prep_decode_params(params, cfg: GPTConfig, quant):
    if "head" in params:   # already prepared (see prepare_decode_params)
        return params
    if quant in ("int8", "int8-kv"):
        return _quant_decode_params(params, cfg, bits=8)
    if quant == "int4":
        return _quant_decode_params(params, cfg, bits=4)
    if quant not in (None, "none"):
        raise ValueError(f"unknown quant mode {quant!r}")
    return _cast_decode_params(params, cfg)


def prepare_decode_params(params, cfg: GPTConfig, quant: str | None = None):
    """Quantize/cast training params for serving ONCE, on device.

    Every `make_*` serving entry point quantizes in-program, which is
    free inside `make_generate` (one prep amortized over a whole scanned
    generation) but NOT in per-call loops like `ContinuousBatcher`,
    where each jitted step would otherwise re-read the f32 weights to
    requantize them — forfeiting the bandwidth win that is the whole
    point of `quant`. Pre-prepared params are detected (the folded
    "head" entry) and passed through untouched by every serving entry
    point; pass the SAME `quant` mode to both this and the step makers.
    int4 weights cross the jit boundary nibble-packed in int8
    (`_quant_w4`), so no int4-dtype arrays hit the host transfer path."""
    # NB: cast-only prep (quant=None) has no "head" marker; the steps
    # re-cast in-program, which is a same-dtype astype (free)
    return jax.jit(
        lambda p: _prep_decode_params(p, cfg, quant))(params)


def make_decode_step(cfg: GPTConfig, quant: str | None = None):
    """Jitted single-token decode: (params, cache, token (B,)) ->
    (logits (B, V), cache). The KV cache is donated (updated in place).
    `quant="int8"` runs the W8A8 serving path (int8 weights + dynamic
    per-token activation scales, int32 MXU accumulation); `"int8-kv"`
    additionally stores the KV cache in int8 (pass a cache created with
    `init_kv_cache(cfg, B, quant="int8-kv")`); `"int4"` runs W4A16
    (group-wise int4 body weights dequantized on read, int8 LM head —
    halves decode's weight traffic again vs int8)."""
    _require_causal(cfg, "kv-cache decoding/serving")

    def step(params, cache, token):
        return _decode_step_body(_prep_decode_params(params, cfg, quant),
                                 cache, token, cfg)

    return jax.jit(step, donate_argnums=(1,))


def init_slot_cache(cfg: GPTConfig, n_slots: int, quant: str | None = None):
    """KV cache for slot-based serving: same layout as `init_kv_cache`
    but with a PER-SLOT position vector (n_slots,) — each slot advances
    independently (continuous batching)."""
    cache = init_kv_cache(cfg, n_slots, quant=quant)
    cache["pos"] = jnp.zeros((n_slots,), jnp.int32)
    return cache


def make_slot_prefill(cfg: GPTConfig, quant: str | None = None,
                      bucketed: bool = False):
    """Jitted per-request prefill for slot-based serving:
    (params, cache, prompt (1, P), slot) -> (last-position logits (V,),
    cache with slot's K/V rows replaced and pos[slot] = P). The other
    slots' rows and positions are untouched, so requests join a running
    batch without disturbing it.

    With `bucketed=True` the signature gains a traced true length:
    (params, cache, prompt (1, Pb), plen, slot, ...) — the prompt is
    zero-padded to a shape BUCKET Pb, so one compiled program serves
    every prompt length in the bucket instead of one program per
    distinct length (arbitrary-length workloads otherwise recompile
    per request). Returned logits are position plen-1's; pos[slot] =
    plen; the padded tail's K/V are dead by the causal-mask argument
    in `_prefill_body`."""
    _require_causal(cfg, "kv-cache decoding/serving")

    def pre(params, cache, prompt, slot, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)
        mini = init_kv_cache(cfg, 1, quant=quant)
        logits, mini = _prefill_body(params, mini, prompt, cfg, adapters,
                                     sel)
        out = dict(cache)
        for n in ("k", "v", "ks", "vs"):
            if n in out:
                out[n] = lax.dynamic_update_slice(
                    out[n], mini[n], (0, slot, 0, 0, 0))
        out["pos"] = out["pos"].at[slot].set(prompt.shape[1])
        return logits[0], out

    def pre_bucketed(params, cache, prompt, plen, slot, adapters=None,
                     sel=None):
        params = _prep_decode_params(params, cfg, quant)
        mini = init_kv_cache(cfg, 1, quant=quant)
        logits, mini = _prefill_body(params, mini, prompt, cfg, adapters,
                                     sel, last=plen - 1)
        out = dict(cache)
        for n in ("k", "v", "ks", "vs"):
            if n in out:
                out[n] = lax.dynamic_update_slice(
                    out[n], mini[n], (0, slot, 0, 0, 0))
        out["pos"] = out["pos"].at[slot].set(plen)
        return logits[0], out

    return jax.jit(pre_bucketed if bucketed else pre, donate_argnums=(1,))


def make_slot_prefill_multi(cfg: GPTConfig, quant: str | None = None):
    """Jitted MULTI-REQUEST prefill for slot-based serving:
    (params, cache, prompts (m, Pb), plens (m,), slots (m,)) ->
    (logits (m, V) at each row's plen-1, cache with the m slots'
    K/V rows replaced and pos[slots] = plens).

    Per-request prefill (`make_slot_prefill`) pays one host<->device
    round trip AND one full weight read per admitted request; admitting
    a group of same-shape prompts in ONE `_prefill_body` pass reads the
    weights once for all m rows and fetches once — prefill is weight-
    bandwidth-bound at short prompts exactly like decode, so the m-row
    batch is nearly free device-side. Rows are zero-padded to a common
    bucket Pb with true lengths in `plens` (same dead-tail argument as
    bucketed single prefill); group sizes round up to a power of two by
    REPLICATING row 0 (same prompt, same plen, same slot) — duplicate
    scatter rows write byte-identical values, so the nondeterministic
    duplicate-index write order is unobservable."""
    _require_causal(cfg, "kv-cache decoding/serving")

    def pre(params, cache, prompts, plens, slots):
        m = prompts.shape[0]
        params = _prep_decode_params(params, cfg, quant)
        mini = init_kv_cache(cfg, m, quant=quant)
        logits, mini = _prefill_body(params, mini, prompts, cfg,
                                     last=plens - 1)
        out = dict(cache)
        for n in ("k", "v", "ks", "vs"):
            if n in out:
                out[n] = out[n].at[:, slots].set(mini[n])
        out["pos"] = out["pos"].at[slots].set(plens)
        return logits, out

    return jax.jit(pre, donate_argnums=(1,))


def make_slot_suffix_prefill(cfg: GPTConfig, quant: str | None = None,
                             bucketed: bool = False):
    """Jitted suffix prefill for PREFIX CACHING in slot-based serving:
    (params, cache, pk, pv, plen, suffix (1, C), slot) ->
    (last-position logits (V,), cache). With `bucketed=True` the
    signature is (..., plen, suffix (1, Cb), cs, slot): the suffix is
    padded to bucket Cb with true length cs traced, so prefix-cache
    hits with arbitrary user-suffix lengths share one compiled program
    per bucket.

    `pk`/`pv` are a shared prompt prefix's precomputed K/V
    ((L, 1, KV, max_seq, hd), positions < plen valid — see
    `ContinuousBatcher.register_prefix`); only the `suffix` tokens are
    prefilled, as a chunked pass starting at position `plen` whose
    queries attend the prefix keys (`_verify_body` — the same kernel
    speculative verification uses). The slot's rows become
    prefix-KV ++ suffix-KV and pos[slot] = plen + C: byte-identical
    state to a full prefill of the concatenated prompt, for the compute
    cost of the suffix alone."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError(
            "slot serving supports quant=None/'int8'/'int4' (see "
            "make_slot_decode_step)")

    def body(params, cache, pk, pv, plen, suffix, slot, cs, last):
        mini = {"k": pk, "v": pv, "pos": plen}
        logits, mini = _verify_body(params, mini, suffix, cfg)
        out = dict(cache)
        for n in ("k", "v"):
            out[n] = lax.dynamic_update_slice(
                out[n], mini[n], (0, slot, 0, 0, 0))
        out["pos"] = out["pos"].at[slot].set(plen + cs)
        return logits[0, last], out

    def pre(params, cache, pk, pv, plen, suffix, slot):
        params = _prep_decode_params(params, cfg, quant)
        return body(params, cache, pk, pv, plen, suffix, slot,
                    suffix.shape[1], -1)

    def pre_bucketed(params, cache, pk, pv, plen, suffix, cs, slot):
        # suffix padded to a shape bucket, true length cs traced (same
        # dead-tail argument as make_slot_prefill's bucketed mode; the
        # caller caps the bucket at max_seq - plen so the tail writes
        # stay in range)
        params = _prep_decode_params(params, cfg, quant)
        return body(params, cache, pk, pv, plen, suffix, slot, cs,
                    cs - 1)

    return jax.jit(pre_bucketed if bucketed else pre, donate_argnums=(1,))


def make_slot_chunk_prefill(cfg: GPTConfig, quant: str | None = None):
    """Jitted CHUNKED prefill for slot-based serving (SARATHI-style):
    (params, cache, chunk (1, C), slot, start) -> (logits (V,) at the
    chunk's last position, cache).

    A monolithic prefill of a long prompt stalls every co-running
    decode for the whole prompt's duration; processing the prompt in
    fixed-size chunks interleaved with decode steps bounds that stall
    to one chunk's time. Each call continues the SLOT'S OWN partial
    K/V state: the chunk's queries attend positions < start (already
    filled by earlier chunks) plus the within-chunk causal range
    (`_verify_body` — the same kernel speculative verification uses),
    and K/V land at start..start+C-1 with pos[slot] = start + C.

    The chunk shape is FIXED (one compiled program): the scheduler
    sends ceil(P/C)-1 aligned chunks and a final chunk of the LAST C
    tokens (start = P-C) — the overlap recomputes identical K/V (a
    deterministic rewrite) instead of padding, so no garbage positions
    ever enter the cache and the returned logits are always the real
    last token's. Trailing (adapters, sel) serve per-request LoRA."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError(
            "slot serving supports quant=None/'int8'/'int4' (see "
            "make_slot_decode_step)")

    def pre(params, cache, chunk, slot, start, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)
        mini = {"k": lax.dynamic_slice_in_dim(cache["k"], slot, 1, 1),
                "v": lax.dynamic_slice_in_dim(cache["v"], slot, 1, 1),
                "pos": start}
        logits, mini = _verify_body(params, mini, chunk, cfg, adapters,
                                    sel)
        out = dict(cache)
        for n in ("k", "v"):
            out[n] = lax.dynamic_update_slice(
                out[n], mini[n], (0, slot, 0, 0, 0))
        out["pos"] = out["pos"].at[slot].set(start + chunk.shape[1])
        return logits[0, -1], out

    return jax.jit(pre, donate_argnums=(1,))


def make_slot_decode_step(cfg: GPTConfig, quant: str | None = None):
    """Jitted decode across slots with PER-SLOT positions (continuous
    batching): (params, cache, tokens (B,), active (B,) bool) ->
    (logits (B, V), cache). Each active slot writes its K/V at its own
    position and attends its own causal range; inactive slots hold
    position (their lanes compute but change nothing). Donates the
    cache."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError(
            "slot serving supports quant=None/'int8'/'int4' (int8-kv's "
            "scale rows would need the same scatter plumbing)")

    def step(params, cache, tokens, active, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)
        return _slot_decode_body(params, cache, tokens, active, cfg,
                                 adapters, sel)

    return jax.jit(step, donate_argnums=(1,))


def _slot_decode_body(params, cache, tokens, active, cfg: GPTConfig,
                      adapters=None, sel=None):
    """One slot-decode step on PREPARED params (the shared body of
    `make_slot_decode_step` and `make_slot_decode_many`)."""
    pos = cache["pos"]                              # (B,)
    B = tokens.shape[0]
    pos_w = jnp.minimum(pos, cfg.max_seq - 1)       # clamp idle slots
    x = params["wte"][tokens]
    if cfg.pos_emb == "learned":
        x = x + params["wpe"][pos_w]                # (B, D) gather
    x = x.astype(cfg.dtype)[:, None, :]
    bar = jnp.arange(B)

    def body(carry, inp):
        x, ck, cv = carry
        blk, ab_l, l = inp
        q, k_new, v_new = _decode_qkv(x, blk, cfg, pos, ab_l, sel)
        lk = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
        lv = lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
        lk = lk.at[bar, :, pos_w].set(
            jnp.where(active[:, None, None], k_new[:, :, 0],
                      lk[bar, :, pos_w]))
        lv = lv.at[bar, :, pos_w].set(
            jnp.where(active[:, None, None], v_new[:, :, 0],
                      lv[bar, :, pos_w]))
        ck = lax.dynamic_update_slice(ck, lk[None], (l, 0, 0, 0, 0))
        cv = lax.dynamic_update_slice(cv, lv[None], (l, 0, 0, 0, 0))
        x = _decode_block(x, blk, q, lk, lv, pos_w, cfg, ab_l, sel)
        return (x, ck, cv), None

    (x, ks, vs), _ = lax.scan(
        body, (x, cache["k"], cache["v"]),
        (params["blocks"], adapters, jnp.arange(cfg.n_layer)))
    x = _layer_norm(x, params["ln_f"], cfg.norm_eps)
    head = params.get("head")
    if head is not None:
        logits = _qdot(x[:, 0], head, cfg)
    else:
        logits = jnp.dot(
            x[:, 0], _head_w(params, cfg).T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
    new_pos = jnp.where(active, jnp.minimum(pos + 1, cfg.max_seq), pos)
    return logits, {"k": ks, "v": vs, "pos": new_pos}


def make_slot_decode_many(cfg: GPTConfig, k: int,
                          quant: str | None = None):
    """k decode steps + per-row sampling in ONE jitted program
    (multi-step scheduling): (params, cache, tokens (B,), active (B,),
    seeds (B,) u32, steps0 (B,) i32, temperature/top_k/top_p/min_p
    (B,)) -> (tokens (k, B) i32, cache).

    Host-driven continuous batching fetches every step's sampled tokens
    to detect finishes — one host<->device round trip PER TOKEN, which
    through a network tunnel (or any remote host) dwarfs the ~1-6 ms
    device step. Scanning k steps device-side amortises that round trip
    k ways. Outputs are EXACTLY the per-step path's: row b's token at
    step i is fold_in(key(seeds[b]), steps0[b]+i) over its own causal
    lane, so neither the window size nor co-batched rows change it —
    the host simply discards any tokens past a row's stop/eos/budget
    (bounded overshoot is the standard multi-step trade; the batcher
    caps k at the tightest remaining budget)."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError(
            "slot serving supports quant=None/'int8'/'int4'")

    def many(params, cache, tokens, active, seeds, steps0,
             temperature, top_k, top_p, min_p, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)

        def body(carry, i):
            tok, cache = carry
            logits, cache = _slot_decode_body(params, cache, tok, active,
                                              cfg, adapters, sel)
            nxt = sample_logits_batched(logits, seeds, steps0 + i,
                                        temperature, top_k, top_p, min_p)
            tok = jnp.where(active, nxt, tok)
            return (tok, cache), nxt

        (tok, cache), toks = lax.scan(body, (tokens, cache),
                                      jnp.arange(k, dtype=jnp.int32))
        return toks, cache

    return jax.jit(many, donate_argnums=(1,))


# --------------------------------------------------------------------------
# paged KV cache (block tables — vLLM-style memory management)


def init_paged_cache(cfg: GPTConfig, n_blocks: int, block_size: int,
                     n_slots: int):
    """Block-pool KV cache for paged serving: K/V live in a shared pool
    of `n_blocks` fixed-size blocks (L, NB, KV, BS, hd) instead of a
    dense per-slot (max_seq) reservation. A request holds only the
    blocks its actual length needs, so the same HBM serves far more
    concurrent requests when typical lengths are below max_seq —
    the dense slot cache's capacity is n_slots x max_seq regardless of
    use. Block 0 is a scratch block for inactive decode lanes; the
    allocator (serving.PagedBatcher) never hands it out."""
    hd = cfg.d_model // cfg.n_head
    shape = (cfg.n_layer, n_blocks, _kv_heads(cfg), block_size, hd)
    return {
        "pk": jnp.zeros(shape, cfg.dtype),
        "pv": jnp.zeros(shape, cfg.dtype),
        "pos": jnp.zeros((n_slots,), jnp.int32),
    }


def make_paged_prefill(cfg: GPTConfig, block_size: int,
                       quant: str | None = None, bucketed: bool = False):
    """Jitted prefill into pool blocks: (params, cache, prompt (1, P),
    slot, blocks (MB,) int32) -> (last-position logits (V,), cache).
    One batched MXU pass computes the prompt's K/V (`_prefill_body`),
    which is then scattered into the slot's first ceil(P/BS) table
    blocks; pos[slot] = P.

    With `bucketed=True` the signature gains a traced true length
    (params, cache, prompt (1, Pb), plen, slot, blocks, ...): the
    caller pads the prompt to bucket Pb and pads `blocks` past its
    real ceil(plen/BS) entries with 0 — the padded tail's K/V scatter
    into scratch block 0 (never read), so allocation stays exact while
    one program serves the whole bucket."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError("paged serving supports "
                                  "quant=None/'int8'/'int4'")
    BS = block_size

    def body(params, cache, prompt, slot, blocks, adapters, sel, plen,
             last):
        P = prompt.shape[1]
        nb = -(-P // BS)                                   # ceil, static
        # mini cache rounded up to a whole number of blocks so the
        # block reshape below is exact
        L, KV = cfg.n_layer, _kv_heads(cfg)
        hd = cfg.d_model // cfg.n_head
        s_round = max(nb * BS, BS)
        mini = {"k": jnp.zeros((L, 1, KV, s_round, hd), cfg.dtype),
                "v": jnp.zeros((L, 1, KV, s_round, hd), cfg.dtype),
                "pos": jnp.zeros((), jnp.int32)}
        logits, mini = _prefill_body(params, mini, prompt, cfg, adapters,
                                     sel, last=last)
        out = dict(cache)
        for name, src in (("pk", mini["k"]), ("pv", mini["v"])):
            t = src[:, 0]                                  # (L,KV,S,hd)
            t = t.reshape(L, KV, nb, BS, hd).transpose(0, 2, 1, 3, 4)
            out[name] = out[name].at[:, blocks[:nb]].set(
                t.astype(out[name].dtype))
        out["pos"] = out["pos"].at[slot].set(plen)
        return logits[0], out

    def pre(params, cache, prompt, slot, blocks, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)
        return body(params, cache, prompt, slot, blocks, adapters, sel,
                    prompt.shape[1], None)

    def pre_bucketed(params, cache, prompt, plen, slot, blocks,
                     adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)
        return body(params, cache, prompt, slot, blocks, adapters, sel,
                    plen, plen - 1)

    return jax.jit(pre_bucketed if bucketed else pre, donate_argnums=(1,))


def make_paged_prefill_multi(cfg: GPTConfig, block_size: int,
                             quant: str | None = None):
    """Jitted MULTI-REQUEST prefill into pool blocks:
    (params, cache, prompts (m, Pb), plens (m,), slots (m,),
    tables (m, ceil(Pb/BS)) int32) -> (logits (m, V) at each row's
    plen-1, cache).

    The grouped-admission counterpart of `make_paged_prefill`: one
    `_prefill_body` pass computes all m rows' K/V (one weight read for
    the group), which scatter through each row's block-table row.
    Table entries past a row's real ceil(plen/BS) blocks are scratch
    block 0 — written with dead padded-tail K/V, never read (the same
    contract as bucketed single prefill; rows' REAL blocks are
    pool-distinct so every meaningful scatter index is unique).
    Group-padding rows replicate row 0 (prompt, plen, slot AND table),
    so their duplicate writes are byte-identical."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError("paged serving supports "
                                  "quant=None/'int8'/'int4'")
    BS = block_size

    def pre(params, cache, prompts, plens, slots, tables):
        m, P = prompts.shape
        nb = -(-P // BS)                                   # ceil, static
        L, KV = cfg.n_layer, _kv_heads(cfg)
        hd = cfg.d_model // cfg.n_head
        s_round = max(nb * BS, BS)
        params = _prep_decode_params(params, cfg, quant)
        mini = {"k": jnp.zeros((L, m, KV, s_round, hd), cfg.dtype),
                "v": jnp.zeros((L, m, KV, s_round, hd), cfg.dtype),
                "pos": jnp.zeros((), jnp.int32)}
        logits, mini = _prefill_body(params, mini, prompts, cfg,
                                     last=plens - 1)
        out = dict(cache)
        for name, src in (("pk", mini["k"]), ("pv", mini["v"])):
            t = src[:, :, :, :nb * BS]                 # (L,m,KV,nb·BS,hd)
            t = t.reshape(L, m, KV, nb, BS, hd).transpose(0, 1, 3, 2, 4, 5)
            out[name] = out[name].at[:, tables.reshape(-1)].set(
                t.reshape(L, m * nb, KV, BS, hd).astype(out[name].dtype))
        out["pos"] = out["pos"].at[slots].set(plens)
        return logits, out

    return jax.jit(pre, donate_argnums=(1,))


def make_paged_suffix_prefill(cfg: GPTConfig, block_size: int,
                              quant: str | None = None,
                              bucketed: bool = False):
    """Jitted suffix prefill for PREFIX CACHING over the block pool:
    (params, cache, suffix (1, C), slot, own_blocks (nb,) int32,
    prefix_blocks (nf,) int32) -> (last-position logits (V,), cache).
    With `bucketed=True` the signature is (..., suffix (1, Cb), cs,
    slot, own_blocks, prefix_blocks) — suffix padded to bucket Cb,
    true length cs traced, own_blocks padded with scratch block 0.

    A registered prefix owns `nf` FULL pool blocks (positions
    [0, nf*BS)); this program gathers their K/V into a dense mini
    cache, runs the chunked suffix pass starting at position nf*BS
    (`_verify_body` — queries attend the prefix keys), and scatters
    the suffix K/V into the request's OWN blocks. The shared blocks
    are read, never written — vLLM's full-block sharing invariant, so
    no copy-on-write is ever needed (decode writes land at positions
    >= nf*BS + 1 by the matcher's plen < prompt rule). State is
    byte-identical to a full paged prefill of the whole row."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError("paged serving supports "
                                  "quant=None/'int8'/'int4'")
    BS = block_size

    def body(params, cache, suffix, slot, own_blocks, prefix_blocks, cs,
             last):
        nf = prefix_blocks.shape[0]
        nb = own_blocks.shape[0]
        L, KV = cfg.n_layer, _kv_heads(cfg)
        hd = cfg.d_model // cfg.n_head
        cut = nf * BS
        s_round = (nf + nb) * BS            # whole blocks cover cut + C
        # gather the shared prefix blocks into logical order
        pk = cache["pk"][:, prefix_blocks]              # (L,nf,KV,BS,hd)
        pk = pk.transpose(0, 2, 1, 3, 4).reshape(L, 1, KV, cut, hd)
        pv = cache["pv"][:, prefix_blocks]
        pv = pv.transpose(0, 2, 1, 3, 4).reshape(L, 1, KV, cut, hd)
        pad = [(0, 0)] * 5
        pad[3] = (0, s_round - cut)
        mini = {"k": jnp.pad(pk, pad), "v": jnp.pad(pv, pad),
                "pos": jnp.int32(cut)}
        logits, mini = _verify_body(params, mini, suffix, cfg)
        out = dict(cache)
        for name, src in (("pk", mini["k"]), ("pv", mini["v"])):
            t = src[:, 0, :, cut:]                      # (L,KV,nb*BS,hd)
            t = t.reshape(L, KV, nb, BS, hd).transpose(0, 2, 1, 3, 4)
            out[name] = out[name].at[:, own_blocks].set(
                t.astype(out[name].dtype))
        out["pos"] = out["pos"].at[slot].set(cut + cs)
        return logits[0, last], out

    def pre(params, cache, suffix, slot, own_blocks, prefix_blocks):
        params = _prep_decode_params(params, cfg, quant)
        return body(params, cache, suffix, slot, own_blocks,
                    prefix_blocks, suffix.shape[1], -1)

    def pre_bucketed(params, cache, suffix, cs, slot, own_blocks,
                     prefix_blocks):
        # suffix padded to a bucket with true length cs; own_blocks is
        # padded with scratch block 0 past its real entries, so the
        # dead tail scatters there and allocation stays exact
        params = _prep_decode_params(params, cfg, quant)
        return body(params, cache, suffix, slot, own_blocks,
                    prefix_blocks, cs, cs - 1)

    return jax.jit(pre_bucketed if bucketed else pre, donate_argnums=(1,))


def make_paged_chunk_prefill(cfg: GPTConfig, block_size: int,
                             quant: str | None = None):
    """Jitted CHUNKED prefill over the block pool (SARATHI-style —
    see `make_slot_chunk_prefill` for the scheduling rationale):
    (params, cache, chunk (1, C), slot, start, row (MB,) int32) ->
    (logits (V,) at the chunk's last position, cache).

    `row` is the slot's FULL block-table row (unallocated tail entries
    point at scratch block 0): the whole row is gathered into a dense
    mini cache, the chunk runs from `start`, and the whole row is
    scattered back — fixed shapes, ONE compiled program for every
    chunk of every prompt length. The full-row round trip costs one
    extra cache-row read+write per chunk (duplicate scratch-0 entries
    collapse to harmless garbage in the scratch block); chunked
    prefill trades that bounded HBM cost for bounded decode stalls.
    The final chunk is the prompt's last C tokens (overlap rewrite,
    never padding) exactly as in the dense version."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError("paged serving supports "
                                  "quant=None/'int8'/'int4'")
    BS = block_size

    def pre(params, cache, chunk, slot, start, row, adapters=None,
            sel=None):
        params = _prep_decode_params(params, cfg, quant)
        L, KV = cfg.n_layer, _kv_heads(cfg)
        hd = cfg.d_model // cfg.n_head
        MB = row.shape[0]
        pk = cache["pk"][:, row]                       # (L, MB, KV, BS, hd)
        pk = pk.transpose(0, 2, 1, 3, 4).reshape(L, 1, KV, MB * BS, hd)
        pv = cache["pv"][:, row]
        pv = pv.transpose(0, 2, 1, 3, 4).reshape(L, 1, KV, MB * BS, hd)
        mini = {"k": pk, "v": pv, "pos": start}
        logits, mini = _verify_body(params, mini, chunk, cfg, adapters,
                                    sel)
        out = dict(cache)
        for name, src in (("pk", mini["k"]), ("pv", mini["v"])):
            t = src[:, 0].reshape(L, KV, MB, BS, hd).transpose(0, 2, 1, 3, 4)
            out[name] = out[name].at[:, row].set(t.astype(out[name].dtype))
        out["pos"] = out["pos"].at[slot].set(start + chunk.shape[1])
        return logits[0, -1], out

    return jax.jit(pre, donate_argnums=(1,))


def make_paged_decode_step(cfg: GPTConfig, block_size: int,
                           quant: str | None = None,
                           kernel: str = "auto"):
    """Jitted decode over the block pool: (params, cache, tokens (B,),
    active (B,), table (B, MB) int32) -> (logits (B, V), cache).

    `table[s, m]` names the pool block holding slot s's logical
    positions [m*BS, (m+1)*BS): each active slot writes its new K/V at
    (table[s, pos//BS], pos%BS) and attends its own pages — logical
    position equals page-walk order, so the causal / sliding-window
    masks are unchanged from the dense slot step. Inactive lanes
    rewrite scratch block 0 with its own values and their outputs are
    discarded. Donates the cache.

    `kernel` picks the attention path: "auto" fuses the block-table
    walk into a Pallas kernel on TPU when head_dim % 128 == 0
    (`ops/pallas/paged_attention.py` — one HBM pass over the cache
    instead of the XLA gather's materialise-then-read); "on" forces it
    (interpret mode off-TPU via config); "off" keeps the XLA gather."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError("paged serving supports "
                                  "quant=None/'int8'/'int4'")
    if kernel not in ("auto", "on", "off"):
        raise ValueError(f"kernel must be auto/on/off, got {kernel!r}")
    from ..config import config as _cfg, on_tpu

    hd_ = cfg.d_model // cfg.n_head
    use_kernel = kernel == "on" or (
        kernel == "auto" and on_tpu() and hd_ % 128 == 0)
    BS = block_size

    def step(params, cache, tokens, active, table, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)
        return _paged_decode_body(params, cache, tokens, active, table,
                                  cfg, use_kernel, BS, adapters, sel)

    return jax.jit(step, donate_argnums=(1,))


def _paged_decode_body(params, cache, tokens, active, table,
                       cfg: GPTConfig, use_kernel: bool, BS: int,
                       adapters=None, sel=None):
    """One paged-decode step on PREPARED params (the shared body of
    `make_paged_decode_step` and `make_paged_decode_many`)."""
    from ..config import config as _cfg

    pos = cache["pos"]                                 # (B,)
    B = tokens.shape[0]
    MB = table.shape[1]
    pos_w = jnp.minimum(pos, MB * BS - 1)              # clamp idle slots
    x = params["wte"][tokens]
    if cfg.pos_emb == "learned":
        x = x + params["wpe"][jnp.minimum(pos_w, cfg.max_seq - 1)]
    x = x.astype(cfg.dtype)[:, None, :]
    bar = jnp.arange(B)
    bid = jnp.where(active, table[bar, pos_w // BS], 0)
    off = pos_w % BS

    def body(carry, inp):
        x, pk, pv = carry
        blk, ab_l, l = inp
        q, k_new, v_new = _decode_qkv(x, blk, cfg, pos, ab_l, sel)
        pk_l = lax.dynamic_index_in_dim(pk, l, 0, keepdims=False)
        pv_l = lax.dynamic_index_in_dim(pv, l, 0, keepdims=False)
        pk_l = pk_l.at[bid, :, off].set(
            jnp.where(active[:, None, None], k_new[:, :, 0],
                      pk_l[bid, :, off]))
        pv_l = pv_l.at[bid, :, off].set(
            jnp.where(active[:, None, None], v_new[:, :, 0],
                      pv_l[bid, :, off]))
        pk = lax.dynamic_update_index_in_dim(pk, pk_l, l, 0)
        pv = lax.dynamic_update_index_in_dim(pv, pv_l, l, 0)
        if use_kernel:
            from ..ops.pallas.paged_attention import paged_attention

            ctx = paged_attention(
                q[:, :, :, 0, :], pk_l, pv_l, table, pos_w,
                window=cfg.window, interpret=_cfg.pallas_interpret)
            # kv-group-major (B, KV, G, hd) == head-major merge
            ctx = ctx.reshape(B, 1, cfg.d_model)
            x = _decode_post(x, blk, ctx, cfg, ab_l, sel)
        else:
            lk = pk_l[table].transpose(0, 2, 1, 3, 4)  # (B,KV,MB,BS,hd)
            lk = lk.reshape(B, lk.shape[1], MB * BS, lk.shape[4])
            lv = pv_l[table].transpose(0, 2, 1, 3, 4)
            lv = lv.reshape(B, lv.shape[1], MB * BS, lv.shape[4])
            x = _decode_block(x, blk, q, lk, lv, pos_w, cfg, ab_l, sel)
        return (x, pk, pv), None

    (x, pk, pv), _ = lax.scan(
        body, (x, cache["pk"], cache["pv"]),
        (params["blocks"], adapters, jnp.arange(cfg.n_layer)))
    x = _layer_norm(x, params["ln_f"], cfg.norm_eps)
    head = params.get("head")
    if head is not None:
        logits = _qdot(x[:, 0], head, cfg)
    else:
        logits = jnp.dot(
            x[:, 0], _head_w(params, cfg).T.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        )
    new_pos = jnp.where(active, pos + 1, pos)
    return logits, {"pk": pk, "pv": pv, "pos": new_pos}


def make_paged_decode_many(cfg: GPTConfig, block_size: int, k: int,
                           quant: str | None = None,
                           kernel: str = "auto"):
    """k paged-decode steps + per-row sampling in ONE jitted program —
    the paged twin of `make_slot_decode_many` (same output-identity
    argument; see its docstring). The block `table` is FIXED for the
    window, so the scheduler must pre-allocate every active slot's
    blocks through position pos+k before calling (PagedBatcher.step_many
    does, preempting under pressure exactly like per-step growth)."""
    _require_causal(cfg, "kv-cache decoding/serving")
    if quant == "int8-kv":
        raise NotImplementedError("paged serving supports "
                                  "quant=None/'int8'/'int4'")
    if kernel not in ("auto", "on", "off"):
        raise ValueError(f"kernel must be auto/on/off, got {kernel!r}")
    from ..config import on_tpu

    hd_ = cfg.d_model // cfg.n_head
    use_kernel = kernel == "on" or (
        kernel == "auto" and on_tpu() and hd_ % 128 == 0)
    BS = block_size

    def many(params, cache, tokens, active, table, seeds, steps0,
             temperature, top_k, top_p, min_p, adapters=None, sel=None):
        params = _prep_decode_params(params, cfg, quant)

        def body(carry, i):
            tok, cache = carry
            logits, cache = _paged_decode_body(
                params, cache, tok, active, table, cfg, use_kernel, BS,
                adapters, sel)
            nxt = sample_logits_batched(logits, seeds, steps0 + i,
                                        temperature, top_k, top_p, min_p)
            tok = jnp.where(active, nxt, tok)
            return (tok, cache), nxt

        (tok, cache), toks = lax.scan(body, (tokens, cache),
                                      jnp.arange(k, dtype=jnp.int32))
        return toks, cache

    return jax.jit(many, donate_argnums=(1,))


def make_generate(cfg: GPTConfig, max_new: int, temperature: float = 0.0,
                  top_k: int = 0, top_p: float = 0.0, min_p: float = 0.0,
                  repetition_penalty: float = 1.0,
                  quant: str | None = None, mesh=None):
    """Fully on-device generation: ONE compiled program runs a batched
    prefill (one MXU pass over the whole prompt) + `max_new` scanned
    decode steps, so serving pays a single host<->device round trip per
    sequence instead of one per token (the host-loop `generate` pays
    ~RTT x tokens through a network tunnel).

    Sampling controls: `temperature`/`top_k`/`top_p`/`min_p` (see
    `sample_logits`) and `repetition_penalty` (CTRL-style: logits of
    tokens already in the prompt or generated so far are divided by the
    penalty when positive, multiplied when negative; 1.0 disables — a
    per-row seen-token mask rides the scan carry).

    `quant="int8"` serves with W8A8 quantized matmuls (weights quantized
    once per call, outside the scans) — halves the weight HBM traffic
    that bounds decode throughput.

    With `mesh`, serving runs tensor-parallel: params keep the Megatron
    column/row layout (`param_shardings`), the KV cache shards batch
    over "dp" and kv heads over "tp", and GSPMD partitions the decode
    einsums over heads — one all-reduce per layer at the output
    projection, weight reads split tp-ways (decode is weight-bandwidth
    bound, so tp multiplies the aggregate weight bandwidth). Requires
    kv_heads % tp == 0 and B % dp == 0.

    Returns gen(params, prompt (B, P) int32, key) -> (B, P + max_new).
    Prompt length + max_new must fit cfg.max_seq."""
    _require_causal(cfg, "kv-cache decoding/serving")
    rp = repetition_penalty

    def _shard_cache(cache):
        if mesh is None:
            return cache
        spec = P(None, "dp", "tp", None, None)
        out = dict(cache)
        for name in ("k", "v", "ks", "vs"):
            if name in out:
                out[name] = lax.with_sharding_constraint(
                    out[name], NamedSharding(mesh, P(*spec[:out[name].ndim]))
                )
        return out

    def gen(params, prompt, key):
        params = _prep_decode_params(params, cfg, quant)  # outside the scans
        B = prompt.shape[0]
        cache = _shard_cache(init_kv_cache(cfg, B, quant=quant))
        logits, cache = _prefill_body(params, cache, prompt, cfg)
        seen = (jax.nn.one_hot(prompt, cfg.vocab_size,
                               dtype=jnp.float32).sum(1) > 0)  # (B, V)

        def body(carry, k_t):
            cache, logits, seen = carry
            lg = logits
            if rp != 1.0:
                pen = jnp.where(lg > 0, lg / rp, lg * rp)
                lg = jnp.where(seen, pen, lg)
            nxt = sample_logits(lg, k_t, temperature, top_k, top_p, min_p)
            seen = seen | jax.nn.one_hot(nxt, cfg.vocab_size,
                                         dtype=jnp.bool_)
            logits, cache = _decode_step_body(params, cache, nxt, cfg)
            return (cache, logits, seen), nxt

        keys = jax.random.split(key, max_new)
        (_, _, _), toks = lax.scan(body, (cache, logits, seen), keys)
        return jnp.concatenate([prompt, toks.T], axis=1)

    if mesh is None:
        return jax.jit(gen)
    if not {"dp", "tp"} <= set(mesh.axis_names):
        raise ValueError(
            "sharded serving needs a mesh with 'dp' and 'tp' axes "
            "(either may have size 1)")
    if _kv_heads(cfg) % mesh.shape["tp"]:
        raise ValueError("tensor-parallel serving needs kv_heads % tp == 0")
    return jax.jit(
        gen,
        in_shardings=(
            param_shardings(mesh, cfg),
            NamedSharding(mesh, P("dp", None)),
            NamedSharding(mesh, P()),
        ),
        out_shardings=NamedSharding(mesh, P("dp", None)),
    )


def sample_logits(logits, key, temperature: float = 0.0, top_k: int = 0,
                  top_p: float = 0.0, min_p: float = 0.0):
    """One sampling step over (B, V) logits: greedy (temperature 0),
    temperature, top-k, nucleus (top-p), and/or min-p filtering (drop
    tokens whose probability is below `min_p` x the top token's) — the
    standard serving controls."""
    if temperature <= 0.0:
        return logits.argmax(-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        keep = probs >= min_p * probs.max(-1, keepdims=True)
        logits = jnp.where(keep, logits, -jnp.inf)
    if top_k > 0:
        k = min(top_k, logits.shape[-1])  # clamp: top_k > vocab == no-op
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set whose cumulative mass exceeds top_p (always keeps
        # the top token)
        keep_sorted = cum - probs < top_p
        cutoff = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
            keepdims=True,
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _sample_row(logits, key, temperature, top_k, top_p, min_p):
    """Single-row `sample_logits` with TRACED (per-request) controls:
    every filter keys off runtime scalars, so one compiled program
    serves any mix of greedy/temperature/top-k/top-p/min-p rows
    (continuous batching serves heterogeneous requests). Filter order
    matches `sample_logits` (min-p, top-k, top-p on the
    temperature-scaled logits); each filter always keeps the top
    token, so the row can never go fully -inf."""
    V = logits.shape[-1]
    l32 = logits.astype(jnp.float32)
    greedy = l32.argmax().astype(jnp.int32)
    lt = l32 / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(lt)
    keep = (min_p <= 0.0) | (probs >= min_p * probs.max())
    lt = jnp.where(keep, lt, -jnp.inf)
    sorted_desc = jnp.sort(lt)[::-1]
    kth = sorted_desc[jnp.clip(top_k - 1, 0, V - 1)]
    lt = jnp.where((top_k <= 0) | (lt >= kth), lt, -jnp.inf)
    sorted_desc = jnp.sort(lt)[::-1]
    probs_s = jax.nn.softmax(sorted_desc)
    cum = jnp.cumsum(probs_s)
    keep_sorted = cum - probs_s < jnp.where(top_p > 0.0, top_p, 1.0)
    cutoff = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf))
    lt = jnp.where(lt >= cutoff, lt, -jnp.inf)
    samp = jax.random.categorical(key, lt).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, samp)


def sample_logits_batched(logits, seeds, steps, temperature, top_k,
                          top_p, min_p):
    """Per-row sampling over (B, V) logits with PER-ROW controls and
    PER-ROW reproducible randomness: row b's key is
    fold_in(key(seeds[b]), steps[b]), so a request's token sequence
    depends only on its own seed and its own step count — co-batched
    requests, slot placement and admission order cannot change it
    (continuous batching changes batch composition every step)."""
    keys = jax.vmap(
        lambda s, t: jax.random.fold_in(jax.random.key(s), t)
    )(seeds, steps)
    return jax.vmap(_sample_row)(logits, keys, temperature, top_k,
                                 top_p, min_p)


def make_prefill(cfg: GPTConfig, quant: str | None = None):
    """Jitted batched prefill: (params, cache, prompt (B, P)) ->
    (last-position logits (B, V), cache filled through position P-1).
    One MXU pass over the whole prompt — for serving systems that manage
    their own cache (continuations, prefix reuse); pair with
    `make_decode_step(cfg, quant=...)` using the same quant mode."""
    _require_causal(cfg, "kv-cache decoding/serving")

    def pre(params, cache, prompt):
        return _prefill_body(_prep_decode_params(params, cfg, quant),
                             cache, prompt, cfg)

    return jax.jit(pre, donate_argnums=(1,))


def make_speculative_generate(cfg_target: GPTConfig, cfg_draft: GPTConfig,
                              max_new: int, gamma: int = 4,
                              quant: str | None = None,
                              draft_quant: str | None = None):
    """Greedy speculative decoding (single stream, B=1): a cheap draft
    model proposes `gamma` tokens with scanned decode steps, the target
    verifies all of them in ONE chunked pass (`_verify_body` — decode is
    weight-bound, so scoring gamma+1 tokens costs about one target
    step), and the longest matching prefix plus the target's correction
    is emitted. Cache rollback is free: resetting `pos` invalidates
    stale K/V (the attention mask never reads past `pos`).

    The output is EXACTLY the target model's greedy continuation for ANY
    draft (accepted tokens equal the target argmax by construction;
    mismatches emit the target argmax) — the draft only changes speed.
    Requires prompt_len + max_new + gamma + 1 <= both models' max_seq
    and a shared vocabulary.

    Returns spec(params_target, params_draft, prompt (1, P)) ->
    (tokens (1, P + max_new), n_target_steps) where `n_target_steps` is
    the number of verify passes taken (vs `max_new` sequential steps for
    plain greedy — the speedup ratio when draft cost is small)."""

    def spec(params_t, params_d, prompt):
        if prompt.shape[0] != 1:
            raise ValueError("speculative decoding is single-stream (B=1)")
        pt = _prep_decode_params(params_t, cfg_target, quant)
        pd = _prep_decode_params(params_d, cfg_draft, draft_quant)
        P = prompt.shape[1]
        cache_t = init_kv_cache(cfg_target, 1, quant=quant)
        cache_d = init_kv_cache(cfg_draft, 1, quant=draft_quant)
        lg_t, cache_t = _prefill_body(pt, cache_t, prompt, cfg_target)
        _, cache_d = _prefill_body(pd, cache_d, prompt, cfg_draft)

        BUF = max_new + gamma + 1
        buf = jnp.zeros((BUF,), jnp.int32)
        buf = buf.at[0].set(lg_t.argmax(-1).astype(jnp.int32)[0])
        n0 = jnp.int32(1)

        def cond(st):
            return st[0] < max_new

        def step(st):
            n, buf, cache_t, cache_d, iters = st
            last = lax.dynamic_index_in_dim(buf, n - 1, 0, keepdims=False)

            def dstep(carry, _):
                tok, cache_d = carry
                lg, cache_d = _decode_step_body(pd, cache_d, tok[None],
                                                cfg_draft)
                nxt = lg.argmax(-1).astype(jnp.int32)[0]
                return (nxt, cache_d), nxt

            (last_prop, cache_d), props = lax.scan(
                dstep, (last, cache_d), None, length=gamma)
            # draft must also consume its last proposal so its cache is
            # contiguous when a full acceptance advances past it
            _, cache_d = _decode_step_body(pd, cache_d, last_prop[None],
                                           cfg_draft)

            chunk = jnp.concatenate([last[None], props])[None]  # (1, γ+1)
            lg, cache_t = _verify_body(pt, cache_t, chunk, cfg_target)
            g = lg[0].argmax(-1).astype(jnp.int32)              # (γ+1,)
            match = props == g[:gamma]
            j = jnp.where(match.all(), jnp.int32(gamma),
                          jnp.argmin(match).astype(jnp.int32))
            # emit g[0..j] (j accepted + 1 corrected/bonus); overwrite
            # garbage beyond j next round
            buf = lax.dynamic_update_slice(buf, g, (n,))
            n = n + j + 1
            # rollback: both caches resume at the last emitted token
            cache_t = {**cache_t, "pos": P + n - 1}
            cache_d = {**cache_d, "pos": P + n - 1}
            return n, buf, cache_t, cache_d, iters + 1

        n, buf, _, _, iters = lax.while_loop(
            cond, step, (n0, buf, cache_t, cache_d, jnp.int32(0)))
        return jnp.concatenate([prompt, buf[None, :max_new]], axis=1), iters

    return jax.jit(spec)


def make_beam_search(cfg: GPTConfig, max_new: int, n_beams: int,
                     quant: str | None = None):
    """On-device beam search: ONE compiled program (batched prefill +
    scanned steps). Each step expands every beam over the vocabulary,
    keeps the `n_beams` highest-scoring continuations per batch row, and
    reorders the KV cache to the surviving parents (a batch-axis gather —
    beam search inherently pays this cache shuffle per step).

    Returns search(params, prompt (B, P)) -> (tokens (B, K, P + max_new),
    scores (B, K)) with beams sorted best-first by total log-probability.
    With n_beams == vocab_size and max_new <= 2 the search is exhaustive
    (tested against brute force)."""
    _require_causal(cfg, "kv-cache decoding/serving")
    K = n_beams

    def search(params, prompt):
        params = _prep_decode_params(params, cfg, quant)
        B, P = prompt.shape
        V = cfg.vocab_size
        cache = init_kv_cache(cfg, B, quant=quant)
        logits, cache = _prefill_body(params, cache, prompt, cfg)

        # replicate to B*K rows (b-major: row = b*K + k)
        def rep(a):
            return jnp.repeat(a, K, axis=1) if a.ndim > 0 else a
        cache = {n: (rep(a) if n != "pos" else a) for n, a in cache.items()}
        logits = jnp.repeat(logits, K, axis=0)  # (B*K, V)
        # only beam 0 is live initially (all beams are identical copies)
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,), jnp.float32),
                             jnp.full((K - 1,), -jnp.inf, jnp.float32)]),
            (B,)).reshape(B, K)
        buf = jnp.zeros((B, K, max_new), jnp.int32)

        def body(carry, t):
            cache, scores, buf, logits = carry
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            total = (scores.reshape(B * K, 1) + logp).reshape(B, K * V)
            top_s, top_i = lax.top_k(total, K)          # (B, K) sorted
            parent = top_i // V
            token = (top_i % V).astype(jnp.int32)       # (B, K)
            flat = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
            cache = {n: (a if n == "pos" else a[:, flat])
                     for n, a in cache.items()}
            buf = buf[jnp.arange(B)[:, None], parent]   # reorder histories
            buf = buf.at[:, :, t].set(token)
            logits, cache = _decode_step_body(
                params, cache, token.reshape(-1), cfg)
            return (cache, top_s, buf, logits), None

        (cache, scores, buf, logits), _ = lax.scan(
            body, (cache, scores, buf, logits), jnp.arange(max_new))
        toks = jnp.concatenate(
            [jnp.repeat(prompt[:, None], K, axis=1), buf], axis=2)
        return toks, scores

    return jax.jit(search)


def generate(params, cfg: GPTConfig, prompt, max_new: int, key=None,
             temperature: float = 0.0, top_k: int = 0, top_p: float = 0.0):
    """Greedy / temperature / top-k / nucleus sampling with the KV cache
    (host loop; batched prefill, then one compiled program per token)."""
    import numpy as np

    decode = make_decode_step(cfg)
    prompt = jnp.asarray(prompt, jnp.int32)
    B, P = prompt.shape
    cache = init_kv_cache(cfg, B)
    if key is None:
        key = jax.random.key(0)

    logits, cache = make_prefill(cfg)(params, cache, prompt)
    out = [np.asarray(prompt)]
    for t in range(max_new):
        key, sub = jax.random.split(key)
        nxt = sample_logits(logits, sub, temperature, top_k, top_p)
        out.append(np.asarray(nxt)[:, None])
        logits, cache = decode(params, cache, nxt)
    return np.concatenate(out, axis=1)


# --------------------------------------------------------------------------
# define-by-run parity tier


def build_var_model_batched(cfg: GPTConfig, batch: int, seq: int,
                            dropout_status=None):
    """Batched GPT block stack on the define-by-run tier's TPU-native ops
    (VERDICT r3 #1): fused qkv `matmul` + the `flash_attention` Var op (the
    same packed-layout Pallas kernel with the fused single-pass backward the
    functional flagship runs), parameters in ``cfg.dtype`` (bf16 on TPU)
    with an f32 loss head via `astype`. Returns (params, forward_fn) with
    forward_fn mapping float ids (B, S) to f32 logits (B, S, V).

    This is the perf path of the parity API; `build_var_model` below keeps
    the reference's 2-d primitive-op vocabulary (one (S, ·) sequence per
    graph) for parity demonstration."""
    import numpy as np

    import neuronika_tpu as nk

    d, H, L = cfg.d_model, cfg.n_head, cfg.n_layer
    hd = d // H
    scale = 0.02
    dt = cfg.dtype

    def p(shape):
        return nk.from_ndarray(
            scale * np.random.randn(*shape).astype("float32"), dtype=dt
        ).requires_grad()

    wte = p((cfg.vocab_size, d))
    wpe = p((seq, d))
    blocks = []
    for _ in range(L):
        blocks.append({
            "g1": nk.ones(d, dt).requires_grad(),
            "b1": nk.zeros(d, dt).requires_grad(),
            "g2": nk.ones(d, dt).requires_grad(),
            "b2": nk.zeros(d, dt).requires_grad(),
            # packed group-major qkv (MHA: groups of [q_h | k_h | v_h])
            "wqkv": p((d, 3 * d)), "wo": p((d, d)),
            "w1": p((d, cfg.d_ff)),
            "b1m": nk.zeros(cfg.d_ff, dt).requires_grad(),
            "w2": p((cfg.d_ff, d)),
            "b2m": nk.zeros(d, dt).requires_grad(),
        })
    gf = nk.ones(d, dt).requires_grad()
    bf = nk.zeros(d, dt).requires_grad()
    params = [wte, wpe, gf, bf]
    for blk in blocks:
        params.extend(blk.values())

    def layer_norm(x, gamma, beta):
        mu = x.mean(2)
        centered = x - mu
        var = (centered * centered).mean(2)
        return centered / (var + 1e-5).sqrt() * gamma + beta

    def attention(x, blk):
        qkv = x.matmul(blk["wqkv"])
        ctx = qkv.flash_attention(
            H, causal=True, dropout=cfg.dropout,
            status=dropout_status if cfg.dropout > 0.0 else None,
            block=cfg.flash_block,
        )
        return ctx.matmul(blk["wo"])

    def mlp(x, blk):
        h = x.matmul(blk["w1"]) + blk["b1m"]
        h = h.sigmoid() * h  # SiLU from primitive ops
        return h.matmul(blk["w2"]) + blk["b2m"]

    def fwd(ids):
        x = wte.embed(ids) + wpe
        for blk in blocks:
            x = x + attention(layer_norm(x, blk["g1"], blk["b1"]), blk)
            x = x + mlp(layer_norm(x, blk["g2"], blk["b2"]), blk)
        x = layer_norm(x, gf, bf)
        return x.matmul(wte.t()).astype("float32")

    return params, fwd


def build_var_model(cfg: GPTConfig, batch: int, seq: int):
    """The full GPT-2 block stack expressed with the `Var`/`VarDiff` API —
    multi-head causal attention, matmul-based LayerNorm, and a GELU-free
    (softplus·tanh-approx-free) MLP, all from the reference's primitive op
    vocabulary (matmul / softmax / chunk / cat / elementwise), demonstrating
    the BASELINE.md stretch config on the define-by-run tier.

    The Var kit is 2-d oriented like the reference's Ix2-heavy layer kit, so
    the model processes one sequence (S, ·) per graph; heads are chunked
    along the feature axis and re-concatenated. Causality uses an additive
    mask constant. Returns (params, forward_fn) with forward_fn mapping a
    float id vector (S,) to logits (S, V)."""
    import neuronika_tpu as nk

    d, H, L = cfg.d_model, cfg.n_head, cfg.n_layer
    hd = d // H
    scale = 0.02

    def p(shape):
        return (nk.from_ndarray(
            scale * _np_randn(shape)
        )).requires_grad()

    wte = p((cfg.vocab_size, d))
    wpe = p((seq, d))
    blocks = []
    for _ in range(L):
        blocks.append({
            "g1": nk.ones(d).requires_grad(), "b1": nk.zeros(d).requires_grad(),
            "g2": nk.ones(d).requires_grad(), "b2": nk.zeros(d).requires_grad(),
            "wq": p((d, d)), "wk": p((d, d)), "wv": p((d, d)), "wo": p((d, d)),
            "w1": p((d, cfg.d_ff)), "b1m": nk.zeros(cfg.d_ff).requires_grad(),
            "w2": p((cfg.d_ff, d)), "b2m": nk.zeros(d).requires_grad(),
        })
    gf = nk.ones(d).requires_grad()
    bf = nk.zeros(d).requires_grad()

    params = [wte, wpe, gf, bf]
    for blk in blocks:
        params.extend(blk.values())

    # causal additive mask (S, S): 0 below diagonal, -1e9 above
    import numpy as np

    mask_np = np.where(np.tril(np.ones((seq, seq))) > 0, 0.0, -1e9).astype(
        np.float32
    )
    mask = nk.from_ndarray(mask_np)

    def layer_norm(x, gamma, beta):
        mu = x.mean(1)
        centered = x - mu
        var = (centered * centered).mean(1)
        return centered / (var + 1e-5).sqrt() * gamma + beta

    def attention(x, blk):
        q = x.mm(blk["wq"])
        k = x.mm(blk["wk"])
        v = x.mm(blk["wv"])
        heads = []
        qs = q.chunks((seq, hd))
        ks = k.chunks((seq, hd))
        vs = v.chunks((seq, hd))
        for h in range(H):
            att = qs[h].mm(ks[h].t()) * (1.0 / math.sqrt(hd)) + mask
            heads.append(att.softmax(1).mm(vs[h]))
        ctx = heads[0].cat(heads[1:], 1) if H > 1 else heads[0]
        return ctx.mm(blk["wo"])

    def mlp(x, blk):
        h = (x.mm(blk["w1"]) + blk["b1m"]).sigmoid() * (x.mm(blk["w1"]) + blk["b1m"])
        return h.mm(blk["w2"]) + blk["b2m"]

    def fwd(ids):
        x = wte.embed(ids) + wpe
        for blk in blocks:
            x = x + attention(layer_norm(x, blk["g1"], blk["b1"]), blk)
            x = x + mlp(layer_norm(x, blk["g2"], blk["b2"]), blk)
        x = layer_norm(x, gf, bf)
        return x.mm(wte.t())

    return params, fwd


def _np_randn(shape):
    import numpy as np

    return np.random.randn(*shape).astype(np.float32)
