"""Attention-DP request router: balance new requests across DP ranks.

Behavioral reference: tensorrt_llm/_torch/pyexecutor/scheduler/
adp_router.py:136 (ADPRouter ABC, DefaultADPRouter:259 token balancing
with relax windows, KVCacheAwareADPRouter:422 prefix-fingerprint
scoring; RankState/RankIterStatsPayload int-serialization for the
cross-rank allgather) and the "ADP Balance" strategy from
AttentionDpConfig (llm_args.py:633): a request may wait up to
``timeout_iters`` for its best rank, and ranks batch-wait up to
``batching_wait_iters`` to even out context phases.

TPU shape: a single routing authority (the leader of the multi-host
orchestration, or the sole process) assigns ``request.dp_rank`` before
requests enter the per-rank schedulers; rank states ride the existing
msgpack broadcast channel as flat int lists.
"""
from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Sequence

from .request import LlmRequest


@dataclasses.dataclass
class RankState:
    """Flat-int-serializable per-rank load (reference: RankState:80)."""
    rank: int = 0
    num_active_requests: int = 0
    num_active_tokens: int = 0
    kv_free_blocks: int = 0

    def serialize(self) -> List[int]:
        return [self.rank, self.num_active_requests,
                self.num_active_tokens, self.kv_free_blocks]

    @classmethod
    def deserialize(cls, data: Sequence[int]) -> "RankState":
        return cls(*data[:4])


class ADPRouter(ABC):
    def __init__(self, num_ranks: int,
                 timeout_iters: int = 50,
                 batching_wait_iters: int = 10):
        self.num_ranks = num_ranks
        self.timeout_iters = timeout_iters
        self.batching_wait_iters = batching_wait_iters
        self.rank_states: List[RankState] = [
            RankState(rank=r) for r in range(num_ranks)]

    def update_rank_states(self, states: Sequence[RankState]) -> None:
        for st in states:
            if 0 <= st.rank < self.num_ranks:
                self.rank_states[st.rank] = st

    def remove_rank(self, rank: int) -> None:
        """Stop routing to a dead rank (worker-death liveness): its
        load reads as +inf so the balancers never pick it again."""
        if 0 <= rank < self.num_ranks:
            st = self.rank_states[rank]
            st.num_active_tokens = 1 << 60
            st.num_active_requests = 1 << 30
            st.kv_free_blocks = 0

    @abstractmethod
    def route_requests(self,
                       requests: Sequence[LlmRequest]) -> List[int]:
        """Assign a dp rank per request; also sets ``req.dp_rank``."""


class DefaultADPRouter(ADPRouter):
    """Token balancing (reference: DefaultADPRouter:259): each request
    goes to the least-token-loaded rank; a request may *relax* (stay
    unrouted) for up to ``timeout_iters`` iterations if every rank is
    more than ``imbalance_ratio`` above the minimum load — the Balance
    strategy's waiting room."""

    def __init__(self, num_ranks: int, timeout_iters: int = 50,
                 batching_wait_iters: int = 10,
                 imbalance_ratio: float = 1.5):
        super().__init__(num_ranks, timeout_iters, batching_wait_iters)
        self.imbalance_ratio = imbalance_ratio
        self._wait_iters: Dict[int, int] = {}

    def route_requests(self, requests: Sequence[LlmRequest]) -> List[int]:
        loads = [st.num_active_tokens for st in self.rank_states]
        out = []
        for req in requests:
            cost = req.context_len + req.sampling_params.max_tokens
            rank = min(range(self.num_ranks), key=lambda r: loads[r])
            waited = self._wait_iters.get(req.request_id, 0)
            lo = min(loads)
            if (loads[rank] > 0 and lo > 0
                    and max(loads) > lo * self.imbalance_ratio
                    and loads[rank] != lo
                    and waited < self.timeout_iters):
                # unbalanced and best rank is hot: relax this iteration
                self._wait_iters[req.request_id] = waited + 1
                out.append(-1)
                continue
            self._wait_iters.pop(req.request_id, None)
            loads[rank] += cost
            req.dp_rank = rank
            out.append(rank)
        return out


class KVCacheAwareADPRouter(DefaultADPRouter):
    """Prefix-fingerprint scoring (reference: KVCacheAwareADPRouter:422):
    ranks remember the first-``fingerprint_tokens`` fingerprints of
    requests they served; a new request routes to the rank with the
    longest expected prefix reuse unless it is overloaded."""

    def __init__(self, num_ranks: int, timeout_iters: int = 50,
                 batching_wait_iters: int = 10,
                 fingerprint_tokens: int = 64,
                 load_penalty: float = 0.25,
                 max_fingerprints_per_rank: int = 2048):
        super().__init__(num_ranks, timeout_iters, batching_wait_iters)
        self.fingerprint_tokens = fingerprint_tokens
        self.load_penalty = load_penalty
        self.max_fp = max_fingerprints_per_rank
        self._rank_fps: List[dict] = [dict() for _ in range(num_ranks)]

    def _fingerprint(self, token_ids: Sequence[int]) -> tuple:
        return tuple(token_ids[:self.fingerprint_tokens])

    def record_served(self, rank: int, request: LlmRequest) -> None:
        fps = self._rank_fps[rank]
        fps[self._fingerprint(request.prompt_token_ids)] = True
        while len(fps) > self.max_fp:
            fps.pop(next(iter(fps)))

    def _match_len(self, rank: int, token_ids: Sequence[int]) -> int:
        fp = self._fingerprint(token_ids)
        best = 0
        for stored in self._rank_fps[rank]:
            n = 0
            for a, b in zip(stored, fp):
                if a != b:
                    break
                n += 1
            best = max(best, n)
        return best

    def route_requests(self, requests: Sequence[LlmRequest]) -> List[int]:
        loads = [st.num_active_tokens for st in self.rank_states]
        out = []
        for req in requests:
            cost = req.context_len + req.sampling_params.max_tokens

            def score(r):
                return self._match_len(r, req.prompt_token_ids) \
                    - loads[r] * self.load_penalty
            rank = max(range(self.num_ranks), key=score)
            loads[rank] += cost
            req.dp_rank = rank
            self.record_served(rank, req)
            out.append(rank)
        return out


def create_adp_router(num_ranks: int, config=None,
                      kv_aware: bool = False) -> ADPRouter:
    kw = {}
    if config is not None:
        kw = dict(timeout_iters=config.timeout_iters,
                  batching_wait_iters=config.batching_wait_iters)
    cls = KVCacheAwareADPRouter if kv_aware else DefaultADPRouter
    return cls(num_ranks, **kw)
