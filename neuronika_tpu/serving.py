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

Greedy decoding (the deterministic serving mode); per-request sampling
belongs to the one-shot `make_generate`. Everything device-side is two
jitted programs reused across requests — no recompiles at steady state.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import transformer as T


class _Request:
    __slots__ = ("rid", "prompt", "max_new", "tokens", "slot")

    def __init__(self, rid, prompt, max_new):
        self.rid = rid
        self.prompt = prompt
        self.max_new = max_new
        self.tokens: List[int] = []
        self.slot: Optional[int] = None


class ContinuousBatcher:
    """Slot-based continuous batching over a fixed KV-cache pool.

    >>> cb = ContinuousBatcher(params, cfg, n_slots=8, quant="int8")
    >>> r1 = cb.submit(prompt_ids_1, max_new=64)
    >>> r2 = cb.submit(prompt_ids_2, max_new=16)
    >>> done = cb.run()          # {rid: np.ndarray of generated tokens}
    """

    def __init__(self, params, cfg: T.GPTConfig, n_slots: int,
                 quant: Optional[str] = None,
                 eos_id: Optional[int] = None):
        self.cfg = cfg
        # quantize/cast ONCE: the batcher calls the jitted step per token,
        # so in-program quantization would re-read the f32 weights every
        # step — prepare_decode_params hoists it out of the loop
        self.params = T.prepare_decode_params(params, cfg, quant)
        self.n_slots = n_slots
        self.eos_id = eos_id
        self._quant = quant
        self._prefill = T.make_slot_prefill(cfg, quant)
        self._step = T.make_slot_decode_step(cfg, quant)
        self._suffix_prefill = None          # built on first register_prefix
        self._prefixes: List[Tuple[np.ndarray, object, object, int]] = []
        self.cache = T.init_slot_cache(cfg, n_slots, quant=quant)
        self._free = deque(range(n_slots))
        self._queue: deque[_Request] = deque()
        self._running: Dict[int, _Request] = {}     # slot -> request
        self._next_tok = np.zeros((n_slots,), np.int32)
        self._next_rid = 0
        self._finished: Dict[int, np.ndarray] = {}

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
                self.cfg, self._quant)
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

    # ------------------------------------------------------------- intake
    def submit(self, prompt, max_new: int) -> int:
        """Queue a request (prompt: 1-d int array). Returns a request id;
        the request starts as soon as a slot frees up."""
        prompt = np.asarray(prompt, np.int32).reshape(1, -1)
        if prompt.shape[1] + max_new > self.cfg.max_seq:
            raise ValueError("prompt + max_new exceeds cfg.max_seq")
        req = _Request(self._next_rid, prompt, max_new)
        self._next_rid += 1
        self._queue.append(req)
        self._admit()
        return req.rid

    def _admit(self) -> None:
        while self._queue and self._free:
            req = self._queue.popleft()
            slot = self._free.popleft()
            req.slot = slot
            pref = self._match_prefix(req.prompt[0])
            if pref is not None:
                pk, pv, plen = pref
                logits, self.cache = self._suffix_prefill(
                    self.params, self.cache, pk, pv, jnp.int32(plen),
                    jnp.asarray(req.prompt[:, plen:]), jnp.int32(slot))
            else:
                logits, self.cache = self._prefill(
                    self.params, self.cache, jnp.asarray(req.prompt),
                    jnp.int32(slot))
            self._next_tok[slot] = int(jnp.argmax(logits))
            req.tokens.append(int(self._next_tok[slot]))
            self._running[slot] = req
            self._maybe_finish(slot)

    # ------------------------------------------------------------- decode
    def step(self) -> None:
        """One decode step across all occupied slots."""
        if not self._running:
            return
        active = np.zeros((self.n_slots,), bool)
        for slot in self._running:
            active[slot] = True
        logits, self.cache = self._step(
            self.params, self.cache, jnp.asarray(self._next_tok),
            jnp.asarray(active))
        nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        for slot in list(self._running):
            self._next_tok[slot] = nxt[slot]
            self._running[slot].tokens.append(int(nxt[slot]))
            self._maybe_finish(slot)
        self._admit()

    def _maybe_finish(self, slot: int) -> None:
        req = self._running.get(slot)
        if req is None:
            return
        done = len(req.tokens) >= req.max_new or (
            self.eos_id is not None and req.tokens
            and req.tokens[-1] == self.eos_id)
        if done:
            self._finished[req.rid] = np.asarray(req.tokens, np.int32)
            del self._running[slot]
            self._free.append(slot)

    # ------------------------------------------------------------- drive
    def run(self, max_steps: int = 100000) -> Dict[int, np.ndarray]:
        """Decode until every submitted request finished; returns
        {rid: generated tokens (prompt excluded)}."""
        steps = 0
        while (self._running or self._queue) and steps < max_steps:
            self.step()
            steps += 1
        out, self._finished = self._finished, {}
        return out

    @property
    def stats(self) -> Tuple[int, int, int]:
        """(running, queued, free) slot counts."""
        return len(self._running), len(self._queue), len(self._free)
