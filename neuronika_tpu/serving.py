"""Continuous batching for GPT serving.

Production serving rarely sees aligned request boundaries: sequences
finish at different times and new prompts arrive while others decode.
`ContinuousBatcher` keeps a fixed pool of B cache *slots* and runs the
per-slot-position decode step (`models.transformer.make_slot_decode_step`)
over whatever mix of requests currently occupies them:

* a new request prefils into a free slot with ONE batched MXU pass
  (`make_slot_prefill`) — the other slots' caches and positions are
  untouched, so it joins the running batch mid-flight;
* every `step()` decodes one token for every active slot (decode is
  weight-bandwidth-bound, so batching the slots reads the weights once
  for all of them);
* a finished slot (eos or its token budget) is freed immediately and the
  next queued request takes it over — no waiting for the batch's longest
  sequence, which is the whole point.

Sampling is PER-REQUEST (`submit(..., temperature=, top_k=, top_p=,
min_p=, seed=)`; temperature 0 = greedy, the default): one compiled
sampler with traced per-row controls serves heterogeneous batches, and
each row's key schedule is fold_in(key(seed), tokens_emitted) — output
is reproducible no matter what a request is co-batched with.
Everything device-side is three jitted programs reused across requests
— no recompiles at steady state.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import transformer as T


class _Request:
    __slots__ = ("rid", "prompt", "max_new", "tokens", "slot", "_seq",
                 "temperature", "top_k", "top_p", "min_p", "seed",
                 "adapter", "stop", "on_token", "t_submit", "t_first",
                 "t_done")

    def __init__(self, rid, prompt, max_new, temperature=0.0, top_k=0,
                 top_p=0.0, min_p=0.0, seed=None, adapter=0, stop=None,
                 on_token=None):
        self.rid = rid
        self.prompt = prompt
        self.max_new = max_new
        self.tokens: List[int] = []
        self.slot: Optional[int] = None
        self._seq = 0            # admission order (preemption priority)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.min_p = float(min_p)
        self.seed = int(rid if seed is None else seed) & 0x7FFFFFFF
        self.adapter = int(adapter)
        # stop: iterable of token-id sequences; generation ends when the
        # output ends with any of them (the match is trimmed from the
        # returned tokens, vLLM-style)
        self.stop = ([tuple(int(t) for t in np.atleast_1d(s))
                      for s in stop] if stop else [])
        self.on_token = on_token
        self.t_submit = time.monotonic()
        self.t_first: Optional[float] = None
        self.t_done: Optional[float] = None


class ContinuousBatcher:
    """Slot-based continuous batching over a fixed KV-cache pool.

    >>> cb = ContinuousBatcher(params, cfg, n_slots=8, quant="int8")
    >>> r1 = cb.submit(prompt_ids_1, max_new=64)
    >>> r2 = cb.submit(prompt_ids_2, max_new=16)
    >>> done = cb.run()          # {rid: np.ndarray of generated tokens}
    """

    def __init__(self, params, cfg: T.GPTConfig, n_slots: int,
                 quant: Optional[str] = None,
                 eos_id: Optional[int] = None,
                 prefill_chunk: Optional[int] = None,
                 mesh=None,
                 prefill_bucket=None):
        self.cfg = cfg
        self.mesh = mesh
        # prefill shape bucketing: every distinct prompt length is its
        # own compiled program, so arbitrary-length workloads recompile
        # per request. "pow2" pads prompts to the next power of two
        # (<= log2(max_seq) programs ever); an int N pads to the next
        # multiple of N. Padded-tail K/V are provably dead (see
        # make_slot_prefill); outputs are identical to exact shapes.
        if prefill_bucket is not None and prefill_bucket != "pow2" \
                and (not isinstance(prefill_bucket, int)
                     or prefill_bucket < 1):
            raise ValueError("prefill_bucket must be None, 'pow2', or a "
                             "positive int")
        self.prefill_bucket = prefill_bucket
        if mesh is not None:
            # tensor-parallel serving (VERDICT r3 #4): params keep the
            # Megatron column/row layout and the KV cache shards its
            # kv-head axis over "tp" — GSPMD partitions the prefill /
            # decode einsums over heads (decode is weight-bandwidth
            # bound, so tp multiplies the aggregate weight bandwidth).
            # The host-side scheduler is untouched: block tables, slots,
            # sampling and preemption see the same arrays, just sharded.
            if "tp" not in mesh.axis_names:
                raise ValueError("sharded serving needs a 'tp' mesh axis")
            if T._kv_heads(cfg) % mesh.shape["tp"]:
                raise ValueError(
                    "tensor-parallel serving needs kv_heads % tp == 0")
            params = jax.device_put(params, T.param_shardings(mesh, cfg))
        # quantize/cast ONCE: the batcher calls the jitted step per token,
        # so in-program quantization would re-read the f32 weights every
        # step — prepare_decode_params hoists it out of the loop
        self.params = T.prepare_decode_params(params, cfg, quant)
        self.n_slots = n_slots
        self.eos_id = eos_id
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError("prefill_chunk must be >= 1 tokens")
        self.prefill_chunk = prefill_chunk
        self._chunk_fill = None              # built on first chunked prefill
        self._prefilling: Dict[int, _Request] = {}   # slot -> mid-prefill
        self._chunk_state: Dict[int, Tuple[np.ndarray, int]] = {}
        self._quant = quant
        self._suffix_prefill = None          # built on first register_prefix
        self._sampler = None                 # built on first sample
        self._multi_prefill = None           # built on first group admit
        self._defer = False                  # see defer_admission()
        self._prefixes: List[Tuple[np.ndarray, object, object, int]] = []
        self._adapter_trees: List[Dict] = []  # host copies, re-stackable
        self._adapters = None                 # stacked device tree or None
        self._sel = np.zeros((n_slots,), np.int32)  # per-slot adapter id
        self._build_programs()
        self._free = deque(range(n_slots))
        self._queue: deque[_Request] = deque()
        self._running: Dict[int, _Request] = {}     # slot -> request
        self._next_tok = np.zeros((n_slots,), np.int32)
        self._next_rid = 0
        self._admit_seq = 0
        self._finished: Dict[int, np.ndarray] = {}
        self._stats = {"completed": 0, "tokens_out": 0,
                       "ttft_sum": 0.0, "itl_sum": 0.0, "itl_n": 0}

    def _shard_cache(self) -> None:
        """Place the freshly created cache on the mesh: kv heads over
        "tp" (dim 2 of every (L, B/NB, KV, S/BS, hd) pool), per-slot
        positions replicated."""
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = {n: P(None, None, "tp", None, None) if v.ndim == 5 else P()
                for n, v in self.cache.items()}
        self.cache = {
            n: jax.device_put(v, NamedSharding(self.mesh, spec[n]))
            for n, v in self.cache.items()
        }

    def _bucket_len(self, n: int) -> int:
        """Padded prompt length for bucketed prefill (min 16, capped at
        max_seq); `n` itself when bucketing is off."""
        b = self.prefill_bucket
        if b is None:
            return n
        if b == "pow2":
            out = max(16, 1 << (n - 1).bit_length())
        else:
            out = -(-n // b) * b
        return min(out, self.cfg.max_seq)

    def _pad_row(self, row: np.ndarray):
        """(padded (1, Pb) array, true length) for the bucketed prefill
        programs."""
        pb = self._bucket_len(row.size)
        out = np.zeros((1, pb), np.int32)
        out[0, :row.size] = row
        return out, row.size

    def _build_programs(self) -> None:
        """Build the jitted prefill/decode programs and the KV cache
        (the paged subclass swaps in block-pool versions)."""
        self._prefill = T.make_slot_prefill(
            self.cfg, self._quant, bucketed=self.prefill_bucket is not None)
        self._step = T.make_slot_decode_step(self.cfg, self._quant)
        self.cache = T.init_slot_cache(self.cfg, self.n_slots,
                                       quant=self._quant)
        self._shard_cache()

    # ------------------------------------------------------------- prefix
    def register_prefix(self, tokens) -> int:
        """Precompute and cache the KV state of a shared prompt prefix
        (a system prompt, few-shot examples, ...). Any later submit
        whose prompt starts with these tokens reuses the cached K/V and
        prefills only the remainder — the prefix's attention FLOPs and
        weight reads are paid once, not per request. Returns a prefix
        id (informational; matching is automatic, longest-prefix-wins).
        State is byte-identical to a full prefill, so outputs do not
        change."""
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        if tokens.size == 0 or tokens.size >= self.cfg.max_seq:
            raise ValueError("prefix must be 1..max_seq-1 tokens")
        if self._suffix_prefill is None:
            self._suffix_prefill = T.make_slot_suffix_prefill(
                self.cfg, self._quant,
                bucketed=self.prefill_bucket is not None)
            self._prefix_fill = T.make_prefill(self.cfg, self._quant)
        mini = T.init_kv_cache(self.cfg, 1)
        _, mini = self._prefix_fill(self.params, mini,
                                    jnp.asarray(tokens[None]))
        self._prefixes.append((tokens, mini["k"], mini["v"], tokens.size))
        # longest-first so the first match is the best match
        self._prefixes.sort(key=lambda e: -e[3])
        return len(self._prefixes) - 1

    def _match_prefix(self, prompt_row: np.ndarray):
        for toks, pk, pv, plen in self._prefixes:
            if plen < prompt_row.size and np.array_equal(
                    prompt_row[:plen], toks):
                return pk, pv, plen
        return None

    # ----------------------------------------------------------- adapters
    def register_adapter(self, lora, alpha: float = 8.0) -> int:
        """Register a LoRA adapter for PER-REQUEST serving (S-LoRA,
        Sheng et al. 2023): a mixed batch serves many fine-tunes of one
        base model in the SAME jitted decode step.

        `lora` is a `models.lora.lora_init`-shaped tree
        ({target: {"A": (L, in, r), "B": (L, r, out)}}); alpha/r is
        folded into B here, so the device-side correction is just
        (h @ A[sel]) @ B[sel] per adapted matmul — merging weights
        per request would copy the whole tree and could never co-batch
        two adapters. All registered adapters are stacked into one
        device tree indexed by a per-slot selector; id 0 is the base
        model (a zero adapter). Ranks and target sets may differ across
        adapters (zero-padded to the per-target max — exact, since
        padded A columns meet zero B rows). Returns the adapter id
        (1-based).

        Registration re-stacks and re-traces the step programs —
        register adapters up front, not mid-serve. Prefix caching
        applies only to base-model requests: a prefix K/V computed
        under the base would be wrong for an adapter, so adapter
        requests always take the full-prefill path."""
        L = self.cfg.n_layer
        tree = {}
        for name, ab in lora.items():
            A = np.asarray(ab["A"], np.float32)
            B = np.asarray(ab["B"], np.float32)
            if (A.ndim != 3 or B.ndim != 3 or A.shape[0] != L
                    or B.shape[0] != L or A.shape[2] != B.shape[1]):
                raise ValueError(
                    f"adapter target {name!r}: want A (L, in, r) / "
                    f"B (L, r, out) with L={L}, got {A.shape} / {B.shape}")
            r = A.shape[2]
            tree[name] = (A, B * (alpha / r))
        if not tree:
            raise ValueError("adapter has no targets")
        self._adapter_trees.append(tree)
        self._restack_adapters()
        return len(self._adapter_trees)

    def _restack_adapters(self) -> None:
        """Rebuild the stacked device tree {target: {"A": (L, NA, in,
        R), "B": (L, NA, R, out)}} from the host copies (adapter 0 =
        zeros = base model). The leading L axis rides the decode step's
        layer scan."""
        L = self.cfg.n_layer
        NA = len(self._adapter_trees) + 1
        names = sorted({n for t in self._adapter_trees for n in t})
        out = {}
        for name in names:
            entries = [t.get(name) for t in self._adapter_trees]
            have = [e for e in entries if e is not None]
            d_in = have[0][0].shape[1]
            d_out = have[0][1].shape[2]
            R = max(e[0].shape[2] for e in have)
            A = np.zeros((L, NA, d_in, R), np.float32)
            B = np.zeros((L, NA, R, d_out), np.float32)
            for i, e in enumerate(entries, start=1):
                if e is None:
                    continue
                r = e[0].shape[2]
                A[:, i, :, :r] = e[0]
                B[:, i, :r, :] = e[1]
            out[name] = {"A": jnp.asarray(A, self.cfg.dtype),
                         "B": jnp.asarray(B, self.cfg.dtype)}
        self._adapters = out

    def _lora_args(self) -> tuple:
        """Trailing (adapters, sel) for the decode step; () when no
        adapter is registered (keeps the no-LoRA trace unchanged)."""
        if self._adapters is None:
            return ()
        return (self._adapters, jnp.asarray(self._sel))

    def _lora_prefill_args(self, req: _Request) -> tuple:
        if self._adapters is None:
            return ()
        return (self._adapters, jnp.full((1,), req.adapter, jnp.int32))

    # ------------------------------------------------------------- intake
    def submit(self, prompt, max_new: int, *, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 0.0, min_p: float = 0.0,
               seed: Optional[int] = None, adapter: int = 0,
               stop=None, on_token=None) -> int:
        """Queue a request (prompt: 1-d int array). Returns a request id;
        the request starts as soon as a slot frees up.

        Sampling is PER-REQUEST (`sample_logits_batched`): temperature 0
        (default) is greedy; temperature/top_k/top_p/min_p mirror
        `make_generate`'s controls. `seed` (default: the request id)
        makes the request's token sequence reproducible regardless of
        what it is co-batched with — the row key is
        fold_in(key(seed), tokens_emitted), so admission order, slot
        placement and even preemption cannot change the output.

        `adapter` selects a LoRA adapter registered with
        `register_adapter` (0 = base model) — requests with different
        adapters co-batch in the same decode step.

        `stop`: iterable of token-id sequences; generation ends as soon
        as the output ends with any of them, and the matched sequence
        is trimmed from the result (eos_id, by contrast, is kept).
        `on_token(rid, token_id)` streams each generated token as it is
        sampled — called inline from `step()`, so keep it cheap (hand
        off to a queue for SSE-style streaming)."""
        prompt = np.asarray(prompt, np.int32).reshape(1, -1)
        if prompt.shape[1] + max_new > self.cfg.max_seq:
            raise ValueError("prompt + max_new exceeds cfg.max_seq")
        if not 0 <= adapter <= len(self._adapter_trees):
            raise ValueError(
                f"adapter id {adapter} not registered (have "
                f"{len(self._adapter_trees)}; 0 = base model)")
        req = _Request(self._next_rid, prompt, max_new,
                       temperature=temperature, top_k=top_k, top_p=top_p,
                       min_p=min_p, seed=seed, adapter=adapter,
                       stop=stop, on_token=on_token)
        self._next_rid += 1
        self._queue.append(req)
        if not self._defer:
            self._admit()
        return req.rid

    def defer_admission(self):
        """Context manager that holds admission while a burst of
        requests is submitted; they admit TOGETHER on exit, so
        same-shape prompts land in one grouped multi-row prefill
        (`_prefill_group` — one weight read + one host round trip per
        group) instead of one program call each. Without it `submit`
        admits eagerly (latency-optimal for online arrivals) and
        grouping only kicks in when several slots free at once.

        >>> with cb.defer_admission():
        ...     rids = [cb.submit(p, 64) for p in prompts]
        """
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            self._defer = True
            try:
                yield
            finally:
                self._defer = False
                self._admit()

        return _ctx()

    # ----------------------------------------------------------- sampling
    def _get_sampler(self):
        if self._sampler is None:
            self._sampler = jax.jit(T.sample_logits_batched)
        return self._sampler

    def _sample_one(self, logits, req: _Request) -> int:
        """Sample the next token for one request from (V,) logits."""
        out = self._get_sampler()(
            jnp.asarray(logits).reshape(1, -1),
            jnp.asarray([req.seed], np.uint32),
            jnp.asarray([len(req.tokens)], np.int32),
            jnp.asarray([req.temperature], np.float32),
            jnp.asarray([req.top_k], np.int32),
            jnp.asarray([req.top_p], np.float32),
            jnp.asarray([req.min_p], np.float32))
        return int(out[0])

    def _sample_batch(self, logits) -> np.ndarray:
        """Sample every running slot's next token from (B, V) logits."""
        B = self.n_slots
        seeds = np.zeros((B,), np.uint32)
        steps = np.zeros((B,), np.int32)
        temp = np.zeros((B,), np.float32)
        top_k = np.zeros((B,), np.int32)
        top_p = np.zeros((B,), np.float32)
        min_p = np.zeros((B,), np.float32)
        for slot, req in self._running.items():
            seeds[slot] = req.seed
            steps[slot] = len(req.tokens)
            temp[slot] = req.temperature
            top_k[slot] = req.top_k
            top_p[slot] = req.top_p
            min_p[slot] = req.min_p
        out = self._get_sampler()(
            logits, jnp.asarray(seeds), jnp.asarray(steps),
            jnp.asarray(temp), jnp.asarray(top_k), jnp.asarray(top_p),
            jnp.asarray(min_p))
        return np.asarray(out, np.int32)

    def _can_admit(self, req: _Request) -> bool:
        """Admission gate beyond a free slot (the paged subclass also
        needs enough free blocks)."""
        return True

    def _req_row(self, req: _Request) -> np.ndarray:
        """The token row a (re-)prefill must cover: the prompt, plus —
        for a preempted request resuming — every generated token except
        the last (whose K/V was never written; it is the pending decode
        input)."""
        row = req.prompt[0]
        if req.tokens:
            row = np.concatenate(
                [row, np.asarray(req.tokens[:-1], np.int32)])
        return row

    # ---------------------------------------------------- chunked prefill
    def _should_chunk(self, req: _Request) -> bool:
        """Chunk a prefill when it is longer than `prefill_chunk` and
        takes the full-prefill path (prefix-cache hits stay one-shot:
        the suffix is already short)."""
        C = self.prefill_chunk
        if not C or self._req_row(req).size <= C:
            return False
        return bool(req.adapter) or self._match_prefix(req.prompt[0]) is None

    def _chunk_call(self, req: _Request, slot: int, chunk: np.ndarray,
                    start: int):
        """One device chunk-prefill call (paged subclass adds the block
        row); returns the chunk's last-position logits."""
        if self._chunk_fill is None:
            self._chunk_fill = T.make_slot_chunk_prefill(self.cfg,
                                                         self._quant)
        logits, self.cache = self._chunk_fill(
            self.params, self.cache, jnp.asarray(chunk[None]),
            jnp.int32(slot), jnp.int32(start),
            *self._lora_prefill_args(req))
        return logits

    def _start_chunked(self, req: _Request, slot: int) -> None:
        """Admit `req` in chunked-prefill mode: process the FIRST chunk
        now, queue the rest for `_advance_chunks` (one chunk per
        `step()`, so co-running decodes stall at most one chunk's
        worth of time per token — SARATHI-style scheduling)."""
        row = self._req_row(req)
        C = self.prefill_chunk
        self._chunk_call(req, slot, row[:C], 0)
        self._chunk_state[slot] = (row, C)
        self._prefilling[slot] = req

    def _note_prefilled(self, slot: int, row_len: int) -> None:
        """Bookkeeping hook when a chunked prefill completes (the paged
        subclass syncs its host position mirror)."""

    def _advance_chunks(self) -> None:
        """Advance ONE mid-prefill slot by one chunk (admission order).
        The final chunk covers the row's LAST `C` tokens — the overlap
        with the previous chunk rewrites identical K/V, so chunk
        geometry never pads (see make_slot_chunk_prefill)."""
        if not self._prefilling:
            return
        slot = min(self._prefilling, key=lambda s: self._prefilling[s]._seq)
        req = self._prefilling[slot]
        row, ns = self._chunk_state[slot]
        C = self.prefill_chunk
        final = ns + C >= row.size
        start = row.size - C if final else ns
        logits = self._chunk_call(req, slot, row[start:start + C], start)
        if not final:
            self._chunk_state[slot] = (row, ns + C)
            return
        del self._prefilling[slot], self._chunk_state[slot]
        self._note_prefilled(slot, row.size)
        if req.tokens:      # resumed after preemption: restore, don't sample
            self._next_tok[slot] = req.tokens[-1]
        else:
            self._next_tok[slot] = self._sample_one(logits, req)
            self._emit(req, int(self._next_tok[slot]))
        self._maybe_finish(slot)

    def _prefill_slot(self, req: _Request, slot: int):
        """Prefill `req` into `slot`; returns the last-position logits."""
        pref = (None if req.adapter
                else self._match_prefix(req.prompt[0]))
        if pref is not None:
            pk, pv, plen = pref
            if self.prefill_bucket is not None:
                padded, cs = self._pad_row(req.prompt[0, plen:])
                if padded.shape[1] > self.cfg.max_seq - plen:
                    padded = padded[:, :self.cfg.max_seq - plen]
                logits, self.cache = self._suffix_prefill(
                    self.params, self.cache, pk, pv, jnp.int32(plen),
                    jnp.asarray(padded), jnp.int32(cs), jnp.int32(slot))
            else:
                logits, self.cache = self._suffix_prefill(
                    self.params, self.cache, pk, pv, jnp.int32(plen),
                    jnp.asarray(req.prompt[:, plen:]), jnp.int32(slot))
        elif self.prefill_bucket is not None:
            padded, plen = self._pad_row(req.prompt[0])
            logits, self.cache = self._prefill(
                self.params, self.cache, jnp.asarray(padded),
                jnp.int32(plen), jnp.int32(slot),
                *self._lora_prefill_args(req))
        else:
            logits, self.cache = self._prefill(
                self.params, self.cache, jnp.asarray(req.prompt),
                jnp.int32(slot), *self._lora_prefill_args(req))
        return logits

    # grouped admission (dense only: the paged subclass prefills through
    # per-request block tables and keeps the single path)
    _group_prefill = True

    def _group_eligible(self, req: _Request) -> bool:
        """A request the multi-row prefill program can admit: base
        model (per-row LoRA stays on the single path), fresh (not a
        preemption resume), un-chunked, no prefix-cache hit."""
        return (req.adapter == 0 and not req.tokens
                and not self._should_chunk(req)
                and self._match_prefix(req.prompt[0]) is None)

    def _pop_prefill_group(self):
        """Pop the run of front-of-queue requests that share a padded
        prefill shape (while free slots last) for ONE multi-row prefill
        call, or None for the single-request path. Grouping never
        reorders the queue — it only widens the front — so admission
        stays FIFO."""
        if (not self._group_prefill or len(self._queue) < 2
                or len(self._free) < 2
                or not self._group_eligible(self._queue[0])):
            return None
        pb = self._bucket_len(self._queue[0].prompt.shape[1])
        claimed = self._group_claim(self._queue[0])
        n = 1
        while (n < len(self._queue) and n < len(self._free)
               and self._group_eligible(self._queue[n])
               and self._bucket_len(self._queue[n].prompt.shape[1]) == pb
               and self._group_can_extend(self._queue[n], claimed)):
            claimed += self._group_claim(self._queue[n])
            n += 1
        if n < 2:
            return None
        group = []
        for _ in range(n):
            req = self._queue.popleft()
            slot = self._free.popleft()
            req.slot = slot
            req._seq = self._admit_seq
            self._admit_seq += 1
            self._sel[slot] = 0
            group.append((req, slot))
        return group

    def _group_claim(self, req: _Request) -> int:
        """Pool resources a group member will consume during grouped
        admission (the paged subclass counts blocks; dense needs
        nothing beyond the slot)."""
        return 0

    def _group_can_extend(self, req: _Request, claimed: int) -> bool:
        """Whether `req` fits the group given resources the earlier
        members already claimed (`_can_admit` alone over-commits: it
        checks the pool as if each member were admitted alone)."""
        return self._can_admit(req)

    def _group_prefill_call(self, prompts, plens, slots, group):
        """Device call for one grouped admission; returns
        (logits (m, V), cache). The paged subclass allocates each row's
        blocks and calls the block-table program instead."""
        if self._multi_prefill is None:
            self._multi_prefill = T.make_slot_prefill_multi(
                self.cfg, self._quant)
        return self._multi_prefill(
            self.params, self.cache, jnp.asarray(prompts),
            jnp.asarray(plens), jnp.asarray(slots))

    def _prefill_group(self, group) -> None:
        """Admit a group in one multi-row prefill call: one weight read
        and one host round trip for the whole group (vs one of each per
        request). The group rounds up to a power-of-two row count by
        replicating row 0 — prompt, plen AND slot — so the duplicate
        scatter rows write byte-identical values and jit compiles at
        most log2(n_slots) row counts per prompt bucket. First tokens
        are sampled in one batched call (same per-request seeded
        sampler as the single path — outputs are identical)."""
        rows = [self._pad_row(req.prompt[0]) for req, _ in group]
        m_real = len(group)
        m = 1 << (m_real - 1).bit_length()
        pad = m - m_real
        prompts = np.concatenate([r[0] for r in rows]
                                 + [rows[0][0]] * pad, axis=0)
        plens = np.asarray([r[1] for r in rows]
                           + [rows[0][1]] * pad, np.int32)
        slots = np.asarray([s for _, s in group]
                           + [group[0][1]] * pad, np.int32)
        logits, self.cache = self._group_prefill_call(
            prompts, plens, slots, group)
        reqs = [req for req, _ in group] + [group[0][0]] * pad
        toks = np.asarray(self._get_sampler()(
            logits,
            jnp.asarray([r.seed for r in reqs], np.uint32),
            jnp.zeros((m,), jnp.int32),       # all fresh: 0 tokens out
            jnp.asarray([r.temperature for r in reqs], np.float32),
            jnp.asarray([r.top_k for r in reqs], np.int32),
            jnp.asarray([r.top_p for r in reqs], np.float32),
            jnp.asarray([r.min_p for r in reqs], np.float32)))
        for i, (req, slot) in enumerate(group):
            self._running[slot] = req
            self._next_tok[slot] = int(toks[i])
            self._emit(req, int(toks[i]))
            self._maybe_finish(slot)

    def _admit(self) -> None:
        while self._queue and self._free and self._can_admit(self._queue[0]):
            group = self._pop_prefill_group()
            if group is not None:
                self._prefill_group(group)
                continue
            req = self._queue.popleft()
            slot = self._free.popleft()
            req.slot = slot
            req._seq = self._admit_seq
            self._admit_seq += 1
            self._sel[slot] = req.adapter
            if self._should_chunk(req):
                self._start_chunked(req, slot)
                self._running[slot] = req
                continue
            logits = self._prefill_slot(req, slot)
            if logits is not None:
                # a resumed (preempted) request restores _next_tok from
                # its own history and returns None instead of logits
                self._next_tok[slot] = self._sample_one(logits, req)
                self._emit(req, int(self._next_tok[slot]))
            self._running[slot] = req
            self._maybe_finish(slot)

    # ------------------------------------------------------------- decode
    def _extra_step_args(self) -> tuple:
        """Extra trailing args for the jitted decode step (the paged
        subclass passes its block table)."""
        return ()

    # --------------------------------------------------------- multi-step
    def _grow_many(self, k: int) -> bool:
        """Reserve whatever the next k decode steps need (the paged
        subclass allocates blocks, preempting under pressure). Returns
        False when the window cannot be reserved."""
        return True

    def _many_prog(self, k: int):
        progs = getattr(self, "_many_progs", None)
        if progs is None:
            progs = self._many_progs = {}
        if k not in progs:
            progs[k] = T.make_slot_decode_many(self.cfg, k, self._quant)
        return progs[k]

    def step_many(self, k: int) -> None:
        """Run up to k decode steps in ONE device program (multi-step
        scheduling). The host-driven `step()` fetches every step's
        sampled tokens to detect finishes — one host<->device round
        trip per token, which on a remote/tunneled host dwarfs the
        device step itself. `step_many` scans k decode+sample steps
        device-side and fetches ONCE.

        Outputs are EXACTLY the per-step path's (tested): each row's
        sampling depends only on its own seed and step count and its
        own causal lane, so tokens a request would not have generated
        (past its stop/eos) are simply discarded; the window is capped
        at the tightest remaining token budget so no row overshoots
        max_new. Trades: finishes are detected at window ends (a freed
        slot re-admits a QUEUED request up to k-1 steps later than with
        `step()` — windows run even while requests wait, because with
        every slot busy the queue drains exactly when a running request
        finishes, and a window reaches that finish k× fewer round trips
        away), and streaming callbacks arrive in window-sized bursts.
        Falls back to `step()` only while a slot is mid-chunked-prefill
        (the chunk advance is host-driven)."""
        if k <= 1 or not self._running or self._prefilling:
            self.step()
            return
        k = min([k] + [r.max_new - len(r.tokens)
                       for r in self._running.values()])
        k = 1 << (k.bit_length() - 1) if k > 0 else 0
        # ^ round down to a power of two: the budget cap varies with the
        # batch mix, and each distinct k is its own compiled program —
        # bucketing bounds the program count at log2(max window)
        if k <= 1 or not self._grow_many(k):
            self.step()
            return
        B = self.n_slots
        active = np.zeros((B,), bool)
        seeds = np.zeros((B,), np.uint32)
        steps0 = np.zeros((B,), np.int32)
        temp = np.zeros((B,), np.float32)
        top_k = np.zeros((B,), np.int32)
        top_p = np.zeros((B,), np.float32)
        min_p = np.zeros((B,), np.float32)
        for slot, req in self._running.items():
            active[slot] = True
            seeds[slot] = req.seed
            steps0[slot] = len(req.tokens)
            temp[slot] = req.temperature
            top_k[slot] = req.top_k
            top_p[slot] = req.top_p
            min_p[slot] = req.min_p
        toks, self.cache = self._many_prog(k)(
            self.params, self.cache, jnp.asarray(self._next_tok),
            jnp.asarray(active), *self._extra_step_args(),
            jnp.asarray(seeds), jnp.asarray(steps0), jnp.asarray(temp),
            jnp.asarray(top_k), jnp.asarray(top_p), jnp.asarray(min_p),
            *self._lora_args())
        toks = np.asarray(toks)          # (k, B) — the ONE fetch
        was_active = [s for s in range(B) if active[s]]
        for slot in was_active:
            req = self._running[slot]
            col = toks[:, slot]
            if req.stop or req.on_token is not None:
                # slow path: stop sequences match across the window
                # boundary and callbacks want per-token calls
                for tok in col:
                    if slot not in self._running:
                        break            # later tokens are discarded
                    self._next_tok[slot] = int(tok)
                    self._emit(req, int(tok))
                    self._maybe_finish(slot)
                continue
            # fast path (one numpy pass per slot, not k Python steps):
            # accept through the first eos, discard the overshoot
            n = k
            if self.eos_id is not None:
                hits = np.flatnonzero(col == self.eos_id)
                if hits.size:
                    n = int(hits[0]) + 1
            if req.t_first is None:
                req.t_first = time.monotonic()
            req.tokens.extend(int(t) for t in col[:n])
            self._next_tok[slot] = int(col[n - 1])
            self._maybe_finish(slot)
        # a slot that finished mid-window kept decoding device-side; its
        # overshoot K/V and position are rewritten by the next prefill
        # into the slot, so no fixup is needed
        self._admit()

    def step(self) -> None:
        """One decode step across all occupied slots (plus at most one
        prefill chunk for a slot still mid-prefill — see
        `prefill_chunk`)."""
        if not self._running:
            return
        self._advance_chunks()
        decodable = [s for s in self._running if s not in self._prefilling]
        if decodable:
            active = np.zeros((self.n_slots,), bool)
            active[decodable] = True
            logits, self.cache = self._step(
                self.params, self.cache, jnp.asarray(self._next_tok),
                jnp.asarray(active), *self._extra_step_args(),
                *self._lora_args())
            nxt = self._sample_batch(logits)
            for slot in decodable:
                if slot not in self._running:
                    continue
                self._next_tok[slot] = nxt[slot]
                self._emit(self._running[slot], int(nxt[slot]))
                self._maybe_finish(slot)
        self._admit()

    def _emit(self, req: _Request, tok: int) -> None:
        """Record one generated token: history, first-token timestamp
        (TTFT), and the streaming callback."""
        req.tokens.append(tok)
        if req.t_first is None:
            req.t_first = time.monotonic()
        if req.on_token is not None:
            req.on_token(req.rid, tok)

    @staticmethod
    def _stop_match(req: _Request) -> int:
        """Length of the stop sequence the output currently ends with
        (0 = none)."""
        for s in req.stop:
            if len(req.tokens) >= len(s) and tuple(
                    req.tokens[-len(s):]) == s:
                return len(s)
        return 0

    def _maybe_finish(self, slot: int) -> None:
        req = self._running.get(slot)
        if req is None:
            return
        trim = self._stop_match(req)
        done = trim > 0 or len(req.tokens) >= req.max_new or (
            self.eos_id is not None and req.tokens
            and req.tokens[-1] == self.eos_id)
        if done:
            out = req.tokens[:-trim] if trim else req.tokens
            self._finished[req.rid] = np.asarray(out, np.int32)
            del self._running[slot]
            self._free.append(slot)
            req.t_done = time.monotonic()
            st = self._stats
            st["completed"] += 1
            st["tokens_out"] += len(req.tokens)
            if req.t_first is not None:
                st["ttft_sum"] += req.t_first - req.t_submit
                if len(req.tokens) > 1:
                    st["itl_sum"] += req.t_done - req.t_first
                    st["itl_n"] += len(req.tokens) - 1

    # ------------------------------------------------------------- drive
    def run(self, max_steps: int = 100000,
            multi_step: int = 1) -> Dict[int, np.ndarray]:
        """Decode until every submitted request finished; returns
        {rid: generated tokens (prompt excluded)}. `multi_step=k` drives
        the loop with `step_many(k)` (one device round trip per k
        tokens; identical outputs — see step_many)."""
        steps = 0
        while (self._running or self._queue) and steps < max_steps:
            if multi_step > 1:
                self.step_many(multi_step)
            else:
                self.step()
            steps += 1
        out, self._finished = self._finished, {}
        return out

    @property
    def stats(self) -> Tuple[int, int, int]:
        """(running, queued, free) slot counts."""
        return len(self._running), len(self._queue), len(self._free)

    @property
    def metrics(self) -> Dict[str, float]:
        """Serving latency/throughput over completed requests:
        `completed`, `tokens_out`, `ttft_mean_s` (submit -> first
        token, prefill + queueing), `itl_mean_s` (mean inter-token
        latency after the first — the per-token SLO chunked prefill
        protects). Means are 0.0 until something completes."""
        st = self._stats
        return {
            "completed": st["completed"],
            "tokens_out": st["tokens_out"],
            "ttft_mean_s": (st["ttft_sum"] / st["completed"]
                            if st["completed"] else 0.0),
            "itl_mean_s": (st["itl_sum"] / st["itl_n"]
                           if st["itl_n"] else 0.0),
        }


class PagedBatcher(ContinuousBatcher):
    """Continuous batching over a PAGED KV cache (vLLM-style block
    tables).

    The dense `ContinuousBatcher` reserves `n_slots x max_seq` of K/V
    whether requests use it or not; here K/V live in a shared pool of
    `n_blocks` fixed-size blocks and a request holds only the blocks
    its current length covers, so the same HBM serves far more
    concurrent requests at typical (short) lengths. Blocks are
    allocated on demand as sequences grow; when the pool runs dry the
    most recently admitted running request is PREEMPTED — its blocks
    are freed and it is re-queued at the front, to be re-prefilled
    (prompt + tokens so far) once space frees up. Preemption preserves
    exact greedy output: the re-prefill rebuilds byte-identical K/V
    state.

    Block 0 is scratch for inactive decode lanes and is never handed
    out. Device programs: `make_paged_prefill` / `make_paged_decode_step`
    (models/transformer.py); the block table is host-managed and passed
    to the decode step each call.

    >>> pb = PagedBatcher(params, cfg, n_slots=8, n_blocks=128,
    ...                   block_size=16, quant="int8")
    >>> rid = pb.submit(prompt_ids, max_new=64)
    >>> done = pb.run()
    """

    def __init__(self, params, cfg: T.GPTConfig, n_slots: int,
                 n_blocks: int, block_size: int = 16,
                 quant: Optional[str] = None,
                 eos_id: Optional[int] = None,
                 kernel: str = "auto",
                 prefill_chunk: Optional[int] = None,
                 mesh=None,
                 prefill_bucket=None):
        if n_blocks < 2:
            raise ValueError("n_blocks must be >= 2 (block 0 is scratch)")
        self.block_size = block_size
        self.n_blocks = n_blocks
        # the fused block-table kernel is a single-chip Pallas program;
        # tp-sharded serving partitions the XLA gather path instead
        if mesh is not None and kernel == "on":
            raise ValueError(
                "kernel='on' cannot run over a tp-sharded KV pool; use "
                "kernel='auto' (routes to the XLA gather path on a mesh) "
                "or drop mesh=")
        self.kernel = "off" if (mesh is not None and kernel == "auto") \
            else kernel
        self._mb = -(-cfg.max_seq // block_size)     # table width
        super().__init__(params, cfg, n_slots, quant=quant, eos_id=eos_id,
                         prefill_chunk=prefill_chunk, mesh=mesh,
                         prefill_bucket=prefill_bucket)
        self._free_blocks: deque[int] = deque(range(1, n_blocks))
        self._table = np.zeros((n_slots, self._mb), np.int32)
        self._slot_blocks: Dict[int, List[int]] = {}
        self._slot_shared: Dict[int, int] = {}       # leading shared blocks
        self._pos = np.zeros((n_slots,), np.int64)   # host mirror of pos
        self.preemptions = 0
        self._paged_prefixes: List[Tuple[np.ndarray, np.ndarray]] = []
        self._n_reserved = 0                         # blocks held by prefixes
        self._paged_suffix = None

    def _build_programs(self) -> None:
        self._prefill = T.make_paged_prefill(
            self.cfg, self.block_size, self._quant,
            bucketed=self.prefill_bucket is not None)
        self._step = T.make_paged_decode_step(self.cfg, self.block_size,
                                              self._quant,
                                              kernel=self.kernel)
        self.cache = T.init_paged_cache(self.cfg, self.n_blocks,
                                        self.block_size, self.n_slots)
        self._shard_cache()

    def register_prefix(self, tokens) -> int:
        """Precompute a shared prompt prefix's K/V into dedicated pool
        blocks (vLLM full-block sharing). Only whole blocks are shared
        — `len(tokens) // block_size` blocks are reserved for the
        lifetime of the batcher; the remainder tokens re-prefill with
        each request's suffix. Matching requests point their table's
        leading entries at the shared blocks (read-only by the
        decode-write invariant: writes land past the prefix), so the
        prefix's attention FLOPs, weight reads AND cache HBM are paid
        once. Longest-prefix-wins; outputs are byte-identical
        (tested)."""
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        BS = self.block_size
        nf = tokens.size // BS
        if nf < 1:
            raise ValueError(
                f"prefix must cover at least one full block "
                f"({BS} tokens); got {tokens.size}")
        if tokens.size >= self.cfg.max_seq:
            raise ValueError("prefix must be < max_seq tokens")
        if len(self._free_blocks) < nf:
            raise ValueError(
                f"prefix needs {nf} pool blocks but only "
                f"{len(self._free_blocks)} are free")
        if self._paged_suffix is None:
            self._paged_suffix = T.make_paged_suffix_prefill(
                self.cfg, BS, self._quant,
                bucketed=self.prefill_bucket is not None)
            self._prefix_fill = T.make_prefill(self.cfg, self._quant)
        cut = nf * BS
        blocks = np.asarray(
            [self._free_blocks.popleft() for _ in range(nf)], np.int32)
        self._n_reserved += nf
        mini = T.init_kv_cache(self.cfg, 1)
        _, mini = self._prefix_fill(self.params, mini,
                                    jnp.asarray(tokens[None, :cut]))
        L = self.cfg.n_layer
        KV = mini["k"].shape[2]
        hd = mini["k"].shape[-1]
        for pool, src in (("pk", mini["k"]), ("pv", mini["v"])):
            t = src[:, 0, :, :cut]                     # (L, KV, cut, hd)
            t = t.reshape(L, KV, nf, BS, hd).transpose(0, 2, 1, 3, 4)
            self.cache[pool] = self.cache[pool].at[jnp.index_exp[
                :, jnp.asarray(blocks)]].set(t.astype(self.cache[pool].dtype))
        self._paged_prefixes.append((tokens[:cut], blocks))
        self._paged_prefixes.sort(key=lambda e: -e[0].size)
        return len(self._paged_prefixes) - 1

    def _match_paged_prefix(self, row: np.ndarray):
        for toks, blocks in self._paged_prefixes:
            if toks.size < row.size and np.array_equal(
                    row[:toks.size], toks):
                return toks.size, blocks
        return None

    # ------------------------------------------------------------ blocks
    def submit(self, prompt, max_new: int, **sampling) -> int:
        p = np.asarray(prompt).reshape(1, -1).shape[1]
        worst = -(-(p + max_new - 1) // self.block_size)
        if worst > self.n_blocks - 1 - self._n_reserved:
            raise ValueError(
                f"request needs up to {worst} blocks but the pool has "
                f"{self.n_blocks - 1 - self._n_reserved}; raise n_blocks "
                f"or block_size")
        return super().submit(prompt, max_new, **sampling)

    def _can_admit(self, req: _Request) -> bool:
        row = self._req_row(req)
        pref = None if req.adapter else self._match_paged_prefix(row)
        nf = len(pref[1]) if pref is not None else 0
        return len(self._free_blocks) >= -(-row.size
                                           // self.block_size) - nf

    def _should_chunk(self, req: _Request) -> bool:
        C = self.prefill_chunk
        row = self._req_row(req)
        if not C or row.size <= C:
            return False
        return (bool(req.adapter)
                or self._match_paged_prefix(row) is None)

    def _start_chunked(self, req: _Request, slot: int) -> None:
        # allocate the whole row's blocks up front (identical accounting
        # to the one-shot path); chunks then fill them progressively
        row = self._req_row(req)
        nb = -(-row.size // self.block_size)
        self._table[slot, :] = 0
        blocks = [self._free_blocks.popleft() for _ in range(nb)]
        self._slot_blocks[slot] = blocks
        self._slot_shared[slot] = 0
        self._table[slot, :nb] = blocks
        super()._start_chunked(req, slot)

    def _chunk_call(self, req: _Request, slot: int, chunk: np.ndarray,
                    start: int):
        if self._chunk_fill is None:
            self._chunk_fill = T.make_paged_chunk_prefill(
                self.cfg, self.block_size, self._quant)
        logits, self.cache = self._chunk_fill(
            self.params, self.cache, jnp.asarray(chunk[None]),
            jnp.int32(slot), jnp.int32(start),
            jnp.asarray(self._table[slot]),
            *self._lora_prefill_args(req))
        return logits

    def _note_prefilled(self, slot: int, row_len: int) -> None:
        self._pos[slot] = row_len

    # ------------------------------------------------- grouped admission
    def _group_eligible(self, req: _Request) -> bool:
        # paged prefix hits go through _match_paged_prefix (block
        # sharing), not the dense _match_prefix
        return (req.adapter == 0 and not req.tokens
                and not self._should_chunk(req)
                and self._match_paged_prefix(req.prompt[0]) is None)

    def _group_claim(self, req: _Request) -> int:
        return -(-req.prompt.shape[1] // self.block_size)

    def _group_can_extend(self, req: _Request, claimed: int) -> bool:
        # the scan must not over-commit the pool: blocks the earlier
        # group members will take are already spoken for
        return (len(self._free_blocks) - claimed
                >= -(-req.prompt.shape[1] // self.block_size))

    def _group_prefill_call(self, prompts, plens, slots, group):
        """Allocate each member's blocks and prefill the group through
        ONE block-table program (make_paged_prefill_multi). Pad rows
        replicate row 0's table (byte-identical duplicate writes);
        table entries past a row's real ceil(plen/BS) blocks point at
        scratch block 0, whose contents are never read — exactly the
        bucketed single-prefill contract."""
        BS = self.block_size
        m, Pb = prompts.shape
        nb_b = -(-Pb // BS)
        m_real = len(group)
        tables = np.zeros((m, nb_b), np.int32)
        for i, (req, slot) in enumerate(group):
            size = int(plens[i])
            nb = -(-size // BS)
            blocks = [self._free_blocks.popleft() for _ in range(nb)]
            self._slot_blocks[slot] = blocks
            self._slot_shared[slot] = 0
            self._table[slot, :] = 0
            self._table[slot, :nb] = blocks
            tables[i, :nb] = blocks
            self._pos[slot] = size
        tables[m_real:] = tables[0]
        if self._multi_prefill is None:
            self._multi_prefill = T.make_paged_prefill_multi(
                self.cfg, self.block_size, self._quant)
        return self._multi_prefill(
            self.params, self.cache, jnp.asarray(prompts),
            jnp.asarray(plens), jnp.asarray(slots), jnp.asarray(tables))

    def _prefill_slot(self, req: _Request, slot: int):
        resumed = bool(req.tokens)
        row = self._req_row(req)
        BS = self.block_size
        pref = None if req.adapter else self._match_paged_prefix(row)
        self._table[slot, :] = 0
        if pref is not None:
            cut, shared_blocks = pref
            nf = len(shared_blocks)
            nb_own = -(-row.size // BS) - nf
            own = [self._free_blocks.popleft() for _ in range(nb_own)]
            self._slot_blocks[slot] = own
            self._slot_shared[slot] = nf
            self._table[slot, :nf] = shared_blocks
            self._table[slot, nf:nf + nb_own] = own
            if self.prefill_bucket is not None:
                padded, cs = self._pad_row(row[cut:])
                if padded.shape[1] > self.cfg.max_seq - cut:
                    padded = padded[:, :self.cfg.max_seq - cut]
                nb_b = -(-(cut + padded.shape[1]) // BS) - nf
                brow = np.zeros((nb_b,), np.int32)
                brow[:nb_own] = own
                logits, self.cache = self._paged_suffix(
                    self.params, self.cache, jnp.asarray(padded),
                    jnp.int32(cs), jnp.int32(slot), jnp.asarray(brow),
                    jnp.asarray(shared_blocks))
            else:
                logits, self.cache = self._paged_suffix(
                    self.params, self.cache, jnp.asarray(row[None, cut:]),
                    jnp.int32(slot),
                    jnp.asarray(np.asarray(own, np.int32)),
                    jnp.asarray(shared_blocks))
        elif self.prefill_bucket is not None:
            nb = -(-row.size // BS)
            blocks = [self._free_blocks.popleft() for _ in range(nb)]
            self._slot_blocks[slot] = blocks
            self._slot_shared[slot] = 0
            self._table[slot, :nb] = blocks
            padded, plen = self._pad_row(row)
            # block row padded to the bucket's static ceil(Pb/BS) width
            # with scratch block 0 — the padded tail's K/V land there
            nb_b = -(-padded.shape[1] // BS)
            brow = np.zeros((nb_b,), np.int32)
            brow[:nb] = blocks
            logits, self.cache = self._prefill(
                self.params, self.cache, jnp.asarray(padded),
                jnp.int32(plen), jnp.int32(slot), jnp.asarray(brow),
                *self._lora_prefill_args(req))
        else:
            nb = -(-row.size // BS)
            blocks = [self._free_blocks.popleft() for _ in range(nb)]
            self._slot_blocks[slot] = blocks
            self._slot_shared[slot] = 0
            self._table[slot, :nb] = blocks
            logits, self.cache = self._prefill(
                self.params, self.cache, jnp.asarray(row[None]),
                jnp.int32(slot), jnp.asarray(np.asarray(blocks, np.int32)),
                *self._lora_prefill_args(req))
        self._pos[slot] = row.size
        if resumed:
            self._next_tok[slot] = req.tokens[-1]
            return None
        return logits

    def _release_blocks(self, slot: int) -> None:
        for b in self._slot_blocks.pop(slot, []):
            self._free_blocks.append(b)
        self._slot_shared.pop(slot, None)
        self._table[slot, :] = 0

    def _preempt(self, slot: int) -> None:
        req = self._running.pop(slot)
        self._release_blocks(slot)
        self._free.append(slot)
        # a mid-prefill victim drops its chunk progress with its blocks;
        # it re-chunks from scratch on re-admission
        self._prefilling.pop(slot, None)
        self._chunk_state.pop(slot, None)
        req.slot = None
        self.preemptions += 1
        self._queue.appendleft(req)     # resumes as soon as blocks free

    def _grow(self) -> None:
        """Before a decode step, every active slot must own the block
        covering the position it is about to write. Allocate on
        demand, oldest request first; when the pool is dry, preempt
        the most recently admitted OTHER request (vLLM scheduling:
        oldest always makes progress, so no livelock)."""
        for slot in sorted(self._running,
                           key=lambda s: self._running[s]._seq):
            if slot not in self._running:    # preempted by an earlier turn
                continue
            if slot in self._prefilling:     # not decoding yet: no growth
                continue
            blocks = self._slot_blocks[slot]
            shared = self._slot_shared.get(slot, 0)
            need = int(self._pos[slot]) // self.block_size
            while shared + len(blocks) <= need:
                if self._free_blocks:
                    b = self._free_blocks.popleft()
                    self._table[slot, shared + len(blocks)] = b
                    blocks.append(b)
                    continue
                victim = max(
                    (s for s in self._running if s != slot),
                    key=lambda s: self._running[s]._seq, default=None)
                if victim is None:      # cannot happen if submit() gated
                    raise RuntimeError("paged KV pool too small for a "
                                       "single request")
                self._preempt(victim)
            self._pos[slot] += 1        # the step about to run writes here

    def step(self) -> None:
        if not self._running:
            self._admit()
            return
        self._grow()
        super().step()

    def _many_prog(self, k: int):
        progs = getattr(self, "_many_progs", None)
        if progs is None:
            progs = self._many_progs = {}
        if k not in progs:
            # "auto" resolves to the XLA gather path INSIDE multi-step
            # windows: measured twice on v5e (BENCH_r04 serving.matrix,
            # d768 B8 int8), the scanned decode_many runs 21-29% faster
            # with kernel off (633 vs 765 tok/s) — the Pallas kernel's
            # per-step fixed cost outweighs its one-HBM-pass win at
            # window-amortised RTT, while the PER-STEP path keeps
            # kernel on (+10% there, where each call pays the RTT
            # anyway). Explicit "on"/"off" still force either tier.
            kern = "off" if self.kernel == "auto" else self.kernel
            progs[k] = T.make_paged_decode_many(
                self.cfg, self.block_size, k, self._quant,
                kernel=kern)
        return progs[k]

    def _grow_many(self, k: int) -> bool:
        """Reserve every running slot's blocks through position pos+k-1
        (the window's table is fixed device-side), preempting the most
        recently admitted other request when the pool runs dry — the
        same discipline as per-step `_grow`, paid up front. Advances
        the host position mirror by k for the slots that will decode
        (matching the device program's k increments)."""
        for slot in sorted(self._running,
                           key=lambda s: self._running[s]._seq):
            if slot not in self._running:    # preempted below
                continue
            blocks = self._slot_blocks[slot]
            shared = self._slot_shared.get(slot, 0)
            # the window writes positions pos .. pos+k-1
            need = (int(self._pos[slot]) + k - 1) // self.block_size
            while shared + len(blocks) <= need:
                if self._free_blocks:
                    b = self._free_blocks.popleft()
                    self._table[slot, shared + len(blocks)] = b
                    blocks.append(b)
                    continue
                # before evicting anyone: is this slot's window satisfiable
                # at all?  Preempting every peer reclaims their held
                # blocks; if even that cannot host the window, bail NOW so
                # an oversized window doesn't evict peers and then abandon
                # the reservation anyway (per-step _grow would not have
                # evicted them). Through the public API this is a
                # defensive invariant rather than a reachable state:
                # submit() gates each request's worst case to fit the
                # pool alone and step_many caps k at the tightest
                # remaining budget, so need <= worst <= usable =
                # free + own + peers' blocks — i.e. reclaimable >=
                # remaining always holds there, and the multi-slot
                # evict-then-abandon chain cannot arise either (each
                # later slot sees earlier slots' reservations as
                # reclaimable). Direct _grow_many callers (tests) can
                # still pass an uncapped k.
                remaining = need + 1 - (shared + len(blocks))
                reclaimable = sum(len(self._slot_blocks[s])
                                  for s in self._running if s != slot)
                if reclaimable < remaining:
                    return False     # shrink the window instead
                victim = max(
                    (s for s in self._running if s != slot),
                    key=lambda s: self._running[s]._seq, default=None)
                if victim is None:
                    return False     # lone request: shrink the window
                self._preempt(victim)
        for slot in self._running:
            self._pos[slot] += k
        return True

    def _extra_step_args(self) -> tuple:
        return (jnp.asarray(self._table),)

    def _maybe_finish(self, slot: int) -> None:
        req = self._running.get(slot)
        super()._maybe_finish(slot)
        if req is not None and slot not in self._running:
            self._release_blocks(slot)

    @property
    def block_stats(self) -> Tuple[int, int]:
        """(blocks in use, blocks free) — block 0 and blocks reserved
        by registered prefixes excluded."""
        used = sum(len(v) for v in self._slot_blocks.values())
        return used, len(self._free_blocks)

    @property
    def reserved_blocks(self) -> int:
        """Pool blocks permanently held by registered prefixes."""
        return self._n_reserved
