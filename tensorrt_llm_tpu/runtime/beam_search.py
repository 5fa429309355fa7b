"""Beam search on top of the row-request engine.

Role of the reference beam machinery (reference: C++ beamSearchKernels/
+ gatherTree, host bookkeeping BeamHistory sampler.py:1005,
cache_indirection in the attention op). TPU-native shape: each beam is an
ordinary engine row (own sequence slot + KV chain); the group re-ranks
candidates each step from per-row top-B logprobs and *forces* the chosen
token into each row via host_token_override. Forks copy the diverged KV
region page-by-page with the engine's jitted page copier (the
cache_indirection analog — simpler, O(gen_len) copies on fork, fine for
the short generated regions beams are used for).

Runs in sync (non-overlap) executor mode: re-ranking needs step t's
logprobs before step t+1 launches.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

from ..sampling_params import SamplingParams
from .request import FinishReason, LlmRequest, LlmRequestState


@dataclasses.dataclass
class Hypothesis:
    tokens: List[int]
    score: float           # sum of token logprobs

    def final_score(self, length_penalty: float) -> float:
        n = max(len(self.tokens), 1)
        return self.score / (n ** length_penalty)


class BeamGroup:
    def __init__(self, parent: LlmRequest, rows: List[LlmRequest]):
        self.parent = parent
        self.rows = rows
        self.width = len(rows)
        sp = parent.sampling_params
        self.length_penalty = sp.length_penalty
        self.end_id = sp.end_id
        self.max_tokens = sp.max_tokens
        self.n_return = sp.n
        # beam i state: cumulative logprob; -inf = dead slot until grown
        self.scores = [0.0] + [-1e30] * (self.width - 1)
        self.first_step = True
        self.completed: List[Hypothesis] = []
        self.done = False

    # ------------------------------------------------------------------ #
    def update(self, engine, kv_manager) -> None:
        """Called after each processed step: re-rank, force tokens,
        fork KV."""
        rows = self.rows
        # per-row candidates from the just-recorded top-B logprobs
        candidates: List[Tuple[float, int, int]] = []  # (score, row, tok)
        for i, row in enumerate(rows):
            if self.scores[i] <= -1e29:
                continue
            if not row.logprobs:
                continue
            step_lp = row.logprobs[-1]
            for tok, lp in step_lp.items():
                candidates.append((self.scores[i] + lp, i, tok))
        if not candidates:
            self.done = True
            return
        candidates.sort(reverse=True)
        if self.first_step:
            # all rows shared the same prefill logits; dedup by token
            seen = set()
            uniq = []
            for c in candidates:
                if c[2] not in seen:
                    seen.add(c[2])
                    uniq.append(c)
            candidates = uniq
            self.first_step = False

        # split into finished (EOS) and live continuations
        live: List[Tuple[float, int, int]] = []
        for score, i, tok in candidates:
            if self.end_id is not None and tok == self.end_id:
                hist = rows[i].output_token_ids[:-1]
                self.completed.append(Hypothesis(hist + [tok], score))
            else:
                live.append((score, i, tok))
            if len(live) >= self.width:
                break

        gen_len = self.parent.sampling_params.max_tokens
        out_len = len(rows[0].output_token_ids)
        if (len(self.completed) >= self.n_return and
                (not live or self._best_possible(live) <=
                 self._worst_completed())):
            self.done = True
        if out_len >= self.max_tokens:
            for score, i, tok in live[:max(0,
                                           self.n_return - len(self.completed))]:
                self.completed.append(
                    Hypothesis(rows[i].output_token_ids[:-1] + [tok], score))
            self.done = True
        if self.done or not live:
            self.done = True
            return

        # assign the top-`width` live continuations to rows
        new_hists: List[Optional[List[int]]] = [None] * self.width
        plans: List[Tuple[int, int, int, float]] = []  # (dst, src, tok, score)
        for j, (score, src, tok) in enumerate(live[:self.width]):
            plans.append((j, src, tok, score))
        # snapshot source data before mutation
        src_hist = {src: list(rows[src].output_token_ids)
                    for _, src, _, _ in plans}
        src_blocks = {src: list(rows[src].kv_block_ids)
                      for _, src, _, _ in plans}
        ps = kv_manager.tokens_per_block
        first_gen_page = rows[0].prompt_len // ps
        new_scores = [-1e30] * self.width
        for dst, src, tok, score in plans:
            row = rows[dst]
            if src != dst:
                # fork: copy diverged pages (partial prompt page onward)
                dstb = row.kv_block_ids
                for p in range(first_gen_page, len(src_blocks[src])):
                    if p < len(dstb) and src_blocks[src][p] != dstb[p]:
                        engine.copy_page(src_blocks[src][p], dstb[p])
            row.output_token_ids = src_hist[src][:-1] + [tok]
            row.host_token_override = tok
            new_scores[dst] = score
        self.scores = new_scores

    def _best_possible(self, live) -> float:
        return max(s for s, _, _ in live) / \
            (max(len(self.rows[0].output_token_ids), 1)
             ** self.length_penalty)

    def _worst_completed(self) -> float:
        return min(h.final_score(self.length_penalty)
                   for h in self.completed)

    # ------------------------------------------------------------------ #
    def finalize(self) -> List[Hypothesis]:
        hyps = list(self.completed)
        for i, row in enumerate(self.rows):
            if self.scores[i] > -1e29:
                hyps.append(Hypothesis(list(row.output_token_ids),
                                       self.scores[i]))
        hyps.sort(key=lambda h: h.final_score(self.length_penalty),
                  reverse=True)
        return hyps[:self.n_return]


def make_beam_rows(parent: LlmRequest) -> List[LlmRequest]:
    """Build the engine row-requests for a beam group."""
    sp = parent.sampling_params
    width = sp.best_of
    rows = []
    for _ in range(width):
        row_sp = SamplingParams(
            max_tokens=sp.max_tokens + 1,  # group terminates before this
            top_k=1, logprobs=width,
            end_id=None, ignore_eos=True)   # EOS handled by the group
        rows.append(LlmRequest(prompt_token_ids=list(parent.prompt_token_ids),
                               sampling_params=row_sp,
                               cache_salt=parent.cache_salt))
    return rows
