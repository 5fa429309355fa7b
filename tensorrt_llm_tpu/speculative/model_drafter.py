"""Draft/target two-model speculative decoding.

Behavioral reference: tensorrt_llm/_torch/speculative/model_drafter.py:1
(ModelDrafter runs a second, smaller engine to propose max_draft_len
tokens per scheduled request; the target verifies them in one step).

TPU-native structure: the draft model is a pure function + its own
small paged-KV pool with one fixed page run per request slot. Each
``prepare_draft_tokens`` call runs ONE jitted program per token bucket:
a ragged catch-up prefill over the tokens accepted since the last call
(positions the draft KV at the target's history), then a K-step greedy
``lax.scan`` proposing the draft — the same device-resident window
trick as the main engine's multi-step decode.

Draft-KV consistency: after a verification round the target keeps only
an accepted prefix; the drafter never trusts its own proposal — it
rolls ``kv_len`` back to the verified history and re-feeds the few
accepted tokens next round (stale KV beyond ``kv_len`` is invisible to
the attention mask and gets overwritten in place).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from ..runtime.request import LlmRequest
from .interface import Drafter


class TwoModelDrafter(Drafter):
    """``parallel_draft`` switches to PARD semantics (reference:
    _torch/speculative/pard.py PARDWorker — "K draft tokens from K
    positions in parallel"): the draft model sees the verified history
    plus K appended MASK tokens and emits all K drafts in ONE forward,
    instead of the K-step autoregressive scan. PARD-trained draft
    checkpoints carry the mask token id; the mechanism is lossless for
    any weights (rejected drafts are discarded by target verification).
    """

    def __init__(self, model, params, *, max_draft_len: int = 4,
                 max_slots: int = 64, page_size: int = 32,
                 max_seq_len: int = 2048,
                 token_buckets: Tuple[int, ...] = (16, 64, 256, 1024),
                 parallel_draft: bool = False, mask_token_id: int = 0):
        super().__init__(max_draft_len)
        self.parallel_draft = parallel_draft
        self.mask_token_id = mask_token_id
        import jax
        self.model = model
        self.params = jax.device_put(params)
        self.page_size = page_size
        self.max_seq_len = max_seq_len
        self.max_slots = max_slots
        self.pages_per_slot = -(-max_seq_len // page_size)
        self.kv = model.make_kv_pages(max_slots * self.pages_per_slot,
                                      page_size)
        # rid -> (slot, kv_len = verified tokens resident in draft KV)
        self._state: Dict[int, Tuple[int, int]] = {}
        self._free = list(range(max_slots - 1, -1, -1))
        self._fns: Dict[int, Any] = {}
        self.token_buckets = tuple(
            t for t in token_buckets if t <= max_seq_len) or (64,)
        # fixed per-slot page runs: slot s owns pages [s*P, (s+1)*P)
        P = self.pages_per_slot
        self._page_indices = np.arange(
            max_slots * P, dtype=np.int32).reshape(max_slots, P)

    # ------------------------------------------------------------------ #
    def _pick_bucket(self, n: int) -> int:
        for b in self.token_buckets:
            if n <= b:
                return b
        return self.token_buckets[-1]

    def _build_fn(self, T: int):
        import jax
        import jax.numpy as jnp
        from ..ops.attention import AttentionMetadata

        model = self.model
        B = self.max_slots
        P = self.pages_per_slot
        ps = self.page_size
        K = self.max_draft_len
        oob = B * P * ps
        page_indices = jnp.asarray(self._page_indices)

        def propose(params, kv, tokens, positions, slot_map, kv_lens,
                    cu_q, logits_idx, hist_len, active):
            iota = jnp.arange(B, dtype=jnp.int32)
            md = AttentionMetadata(
                kv_lens=kv_lens, page_indices=page_indices,
                cu_q_lens=cu_q, num_seqs=jnp.full((1,), B, jnp.int32),
                slot_mapping=slot_map, positions=positions,
                logits_indices=logits_idx)
            logits, kv = model.forward(params, tokens, kv, md)
            tok = jnp.argmax(logits.astype(jnp.float32), -1) \
                .astype(jnp.int32)

            def body(carry, t):
                kv, cur = carry
                pos = hist_len + t
                sm = jnp.where(active,
                               page_indices[iota, jnp.clip(pos // ps, 0,
                                                           P - 1)] * ps
                               + pos % ps, oob)
                md = AttentionMetadata(
                    kv_lens=jnp.where(active, pos + 1, 1),
                    page_indices=page_indices,
                    cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
                    num_seqs=jnp.full((1,), B, jnp.int32),
                    slot_mapping=sm, positions=pos,
                    logits_indices=iota)
                logits, kv = model.forward(params, cur, kv, md)
                nxt = jnp.argmax(logits.astype(jnp.float32), -1) \
                    .astype(jnp.int32)
                return (kv, nxt), nxt

            (kv, _), rest = jax.lax.scan(body, (kv, tok),
                                         jnp.arange(K - 1)) \
                if K > 1 else ((kv, tok), jnp.zeros((0, B), jnp.int32))
            return jnp.concatenate([tok[None], rest], axis=0), kv

        def propose_pard(params, kv, tokens, positions, slot_map,
                         kv_lens, cu_q, logits_idx, hist_len, active):
            # one forward: catch-up tokens + K masks per row; logits
            # gathered at every mask position give all drafts at once
            md = AttentionMetadata(
                kv_lens=kv_lens, page_indices=page_indices,
                cu_q_lens=cu_q, num_seqs=jnp.full((1,), B, jnp.int32),
                slot_mapping=slot_map, positions=positions,
                logits_indices=logits_idx.reshape(-1))   # [B*K]
            logits, kv = model.forward(params, tokens, kv, md)
            tok = jnp.argmax(logits.astype(jnp.float32), -1) \
                .astype(jnp.int32).reshape(B, K)
            return tok.T, kv                              # [K, B]

        if self.parallel_draft:
            return jax.jit(propose_pard, donate_argnums=(1,))
        return jax.jit(propose, donate_argnums=(1,))

    def _get_fn(self, T: int):
        if T not in self._fns:
            self._fns[T] = self._build_fn(T)
        return self._fns[T]

    # ------------------------------------------------------------------ #
    def prepare_draft_tokens(self, requests: Sequence[LlmRequest]) -> None:
        import jax.numpy as jnp

        B = self.max_slots
        ps = self.page_size
        P = self.pages_per_slot
        work: List[Tuple[LlmRequest, int, List[int]]] = []
        for req in requests:
            req.draft_tokens = []
            hist = req.all_token_ids
            if len(hist) + self.max_draft_len + 1 >= self.max_seq_len:
                continue
            st = self._state.get(req.request_id)
            if st is None:
                if not self._free:
                    continue  # no draft slot: run without speculation
                st = (self._free.pop(), 0)
            slot, kv_len = st
            feed = hist[kv_len:]
            if not feed:  # resync guard: re-feed the last token
                kv_len -= 1
                feed = hist[kv_len:]
            if self.parallel_draft:
                feed = list(feed) + [self.mask_token_id] * \
                    self.max_draft_len
            work.append((req, slot, feed))
            self._state[req.request_id] = (slot, kv_len)
        if not work:
            return
        total = sum(len(w[2]) for w in work)
        T = self._pick_bucket(total)
        while total > T:  # bucket overflow: drop longest catch-ups
            work.sort(key=lambda w: len(w[2]))
            dropped = work.pop()
            total -= len(dropped[2])
        tokens = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        slot_map = np.full(T, B * P * ps, np.int32)
        kv_lens = np.ones(B, np.int32)
        cu_q = np.zeros(B + 1, np.int32)
        K = self.max_draft_len
        logits_idx = np.zeros(B * K if self.parallel_draft else B,
                              np.int32)
        hist_len = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        t = 0
        for i, (req, slot, feed) in enumerate(work):
            hist = req.all_token_ids
            # PARD rows: the last K of `feed` are mask tokens OCCUPYING
            # positions len(hist)..len(hist)+K-1 (scratch KV, same
            # contract as chain-draft KV: invisible past kv_len)
            n = len(feed)
            start = len(hist) + (K if self.parallel_draft else 0) - n
            tokens[t:t + n] = feed
            positions[t:t + n] = np.arange(start, start + n)
            pages = self._page_indices[slot]
            pos = np.arange(start, start + n)
            slot_map[t:t + n] = pages[pos // ps] * ps + pos % ps
            kv_lens[i] = start + n
            if self.parallel_draft:
                logits_idx[i * K:(i + 1) * K] = np.arange(
                    t + n - K, t + n)
            else:
                logits_idx[i] = t + n - 1
            hist_len[i] = len(hist)
            active[i] = True
            t += n
        cu_q[1:len(work) + 1] = np.cumsum([len(w[2]) for w in work])
        cu_q[len(work) + 1:] = cu_q[len(work)]

        fn = self._get_fn(T)
        toks, self.kv = fn(self.params, self.kv, jnp.asarray(tokens),
                           jnp.asarray(positions), jnp.asarray(slot_map),
                           jnp.asarray(kv_lens), jnp.asarray(cu_q),
                           jnp.asarray(logits_idx), jnp.asarray(hist_len),
                           jnp.asarray(active))
        toks = np.asarray(toks)
        for i, (req, slot, feed) in enumerate(work):
            hist_n = len(req.all_token_ids)
            # kv_len freezes at the verified history; proposal KV beyond
            # it is invisible and overwritten next round
            self._state[req.request_id] = (slot, hist_n)
            req.draft_tokens = [int(x) for x in toks[:, i]]

    def drop_request(self, request_id: int) -> None:
        st = self._state.pop(request_id, None)
        if st is not None:
            self._free.append(st[0])
