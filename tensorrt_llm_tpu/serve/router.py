"""Request routers for disaggregated / fleet serving.

Behavioral reference: tensorrt_llm/serve/router.py:1 (Router ABC,
RoundRobinRouter:578, LoadBalancingRouter:624, KvCacheAwareRouter:789
with block_key_hasher:664 and the per-server block trie:892) — re-built
for the aiohttp stack used by this repo's servers.

Routers hold a set of worker base-URLs, track per-server load, poll
worker health (``/health``) and KV events (``/kv_cache_events``), and
pick a server per request:

  * round_robin   — rotate.
  * load_balancing — least outstanding tokens (falls back to requests).
  * kv_cache_aware — score = matched-prefix-tokens − load·penalty, with
    block hashes chained exactly like
    ``runtime.kv_cache_manager.stable_block_hash`` so the router's
    predictions line up with the workers' stored-block events.
"""
from __future__ import annotations

import asyncio
import itertools
import random
from abc import ABC, abstractmethod
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import aiohttp

from ..logger import logger
from ..runtime.kv_cache_manager import stable_block_hash


def get_request_num_tokens(request: dict) -> int:
    """Rough token weight of an OpenAI-style request body (reference:
    router.py:36 — char/4 heuristic for text, exact for id prompts)."""
    total = 0
    if "prompt" in request and request["prompt"] is not None:
        prompts = request["prompt"]
        if isinstance(prompts, str):
            prompts = [prompts]
        elif prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        for p in prompts:
            total += len(p) if not isinstance(p, str) else \
                max(1, len(p) // 4)
    for m in request.get("messages", []) or []:
        c = m.get("content") or ""
        if isinstance(c, str):
            total += max(1, len(c) // 4)
    total += int(request.get("max_tokens") or
                 request.get("max_completion_tokens") or 16)
    return total


class ServerState:
    """Per-worker load/health bookkeeping (reference: router.py:62)."""

    def __init__(self, url: str):
        self.url = url
        self.num_active_requests = 0
        self.num_active_tokens = 0
        self.healthy = True

    def increment(self, request: dict) -> None:
        self.num_active_requests += 1
        self.num_active_tokens += get_request_num_tokens(request)

    def decrement(self, request: dict) -> None:
        self.num_active_requests = max(0, self.num_active_requests - 1)
        self.num_active_tokens = max(
            0, self.num_active_tokens - get_request_num_tokens(request))


class Router(ABC):
    """Server-selection policy over a mutable worker fleet."""

    def __init__(self, servers: Optional[Sequence[str]] = None):
        self._states: Dict[str, ServerState] = {}
        self._lock = asyncio.Lock()
        self._session: Optional[aiohttp.ClientSession] = None
        self._monitor_task: Optional[asyncio.Task] = None
        for s in servers or []:
            self._states[self._ensure_url(s)] = self._make_state(
                self._ensure_url(s))

    # -- fleet membership ------------------------------------------------
    @staticmethod
    def _ensure_url(server: str) -> str:
        if not server.startswith(("http://", "https://")):
            server = "http://" + server
        return server.rstrip("/")

    def _make_state(self, url: str) -> ServerState:
        return ServerState(url)

    @property
    def servers(self) -> List[str]:
        return list(self._states)

    async def add_server(self, server: str) -> None:
        url = self._ensure_url(server)
        async with self._lock:
            if url not in self._states:
                self._states[url] = self._make_state(url)
                logger.info("router: added server %s", url)

    async def remove_server(self, server: str) -> None:
        url = self._ensure_url(server)
        async with self._lock:
            if self._states.pop(url, None) is not None:
                logger.info("router: removed server %s", url)

    # -- selection -------------------------------------------------------
    @abstractmethod
    async def get_next_server(self, request: dict) -> str:
        """Pick a worker for this request and register its load."""

    async def finish_request(self, request: dict, server: str) -> None:
        async with self._lock:
            st = self._states.get(server)
            if st is not None:
                st.decrement(request)

    def _healthy_states(self) -> List[ServerState]:
        up = [s for s in self._states.values() if s.healthy]
        if not up:
            raise RuntimeError("router: no healthy servers "
                               f"(fleet={list(self._states)})")
        return up

    # -- health / event monitoring --------------------------------------
    @property
    def session(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=10))
        return self._session

    async def check_health(self) -> Dict[str, bool]:
        out = {}
        for st in list(self._states.values()):
            try:
                async with self.session.get(st.url + "/health") as r:
                    st.healthy = r.status == 200
            except Exception:
                st.healthy = False
            out[st.url] = st.healthy
        return out

    async def _poll_once(self) -> None:
        await self.check_health()

    async def start_monitoring(self, poll_interval: float = 10.0) -> None:
        async def loop():
            while True:
                try:
                    await self._poll_once()
                except Exception as e:     # monitoring must never die
                    logger.warning("router monitor: %s", e)
                await asyncio.sleep(poll_interval)
        self._monitor_task = asyncio.get_running_loop().create_task(loop())

    async def close(self) -> None:
        if self._monitor_task is not None:
            self._monitor_task.cancel()
            self._monitor_task = None
        if self._session is not None and not self._session.closed:
            await self._session.close()


class RoundRobinRouter(Router):
    """Reference: router.py:578."""

    def __init__(self, servers: Optional[Sequence[str]] = None):
        super().__init__(servers)
        self._cycle = 0

    async def get_next_server(self, request: dict) -> str:
        async with self._lock:
            up = self._healthy_states()
            st = up[self._cycle % len(up)]
            self._cycle += 1
            st.increment(request)
            return st.url


class LoadBalancingRouter(Router):
    """Least-loaded selection (reference: router.py:624 with the
    use_tokens knob from LoadBalancingMixin)."""

    def __init__(self, servers: Optional[Sequence[str]] = None,
                 use_tokens: bool = True):
        super().__init__(servers)
        self._use_tokens = use_tokens

    def _load(self, st: ServerState) -> Tuple[int, int]:
        if self._use_tokens:
            return (st.num_active_tokens, st.num_active_requests)
        return (st.num_active_requests, st.num_active_tokens)

    async def get_next_server(self, request: dict) -> str:
        async with self._lock:
            st = min(self._healthy_states(), key=self._load)
            st.increment(request)
            return st.url


class KvCacheAwareServerState(ServerState):
    def __init__(self, url: str):
        super().__init__(url)
        self.block_hashes: set = set()
        self.last_event_id = 0

    def apply_events(self, events: Iterable[dict]) -> None:
        for ev in events:
            if ev.get("event_id", 0) <= self.last_event_id:
                continue
            self.last_event_id = ev.get("event_id", self.last_event_id)
            kind = ev.get("kind")
            hashes = ev.get("block_hashes", [])
            if kind == "stored":
                self.block_hashes.update(hashes)
            elif kind == "removed":
                self.block_hashes.difference_update(hashes)
            # "offloaded" blocks still serve reuse (host tier onboard)


class KvCacheAwareRouter(Router):
    """Prefix-cache-aware selection (reference: router.py:789): hash the
    prompt's full blocks with the workers' own chained hash, count how
    many lead blocks each worker holds, and pick

        argmax(matched_tokens − load_tokens · load_penalty)

    Block sets are kept fresh by polling each worker's
    ``/kv_cache_events`` endpoint (workers must enable
    ``KvCacheConfig.event_buffer_max_size``)."""

    def __init__(self, servers: Optional[Sequence[str]] = None,
                 tokens_per_block: int = 32,
                 load_penalty: float = 0.5,
                 tokenizer=None):
        super().__init__(servers)
        self.tokens_per_block = tokens_per_block
        self.load_penalty = load_penalty
        self.tokenizer = tokenizer

    def _make_state(self, url: str) -> KvCacheAwareServerState:
        return KvCacheAwareServerState(url)

    # -- hashing ---------------------------------------------------------
    def _request_token_ids(self, request: dict) -> List[int]:
        p = request.get("prompt")
        if isinstance(p, list) and p and isinstance(p[0], int):
            return list(p)
        if isinstance(p, list) and p and isinstance(p[0], list):
            return list(p[0])
        text = None
        if isinstance(p, str):
            text = p
        elif request.get("messages"):
            text = "\n".join(
                str(m.get("content") or "")
                for m in request["messages"])
        if text is None:
            return []
        if self.tokenizer is not None:
            return list(self.tokenizer.encode(text))
        # tokenizer-less fallback: byte stream as pseudo-tokens — still
        # deterministic and shared with nothing, so it only ever
        # demotes to load balancing (scores tie at 0)
        return list(text.encode())

    def block_hashes_for(self, token_ids: Sequence[int]) -> List[int]:
        hashes, parent = [], None
        tb = self.tokens_per_block
        for i in range(0, len(token_ids) - tb + 1, tb):
            parent = stable_block_hash(tuple(token_ids[i:i + tb]), parent)
            hashes.append(parent)
        return hashes

    # -- event polling ---------------------------------------------------
    async def _poll_once(self) -> None:
        await self.check_health()
        for st in list(self._states.values()):
            if not st.healthy:
                continue
            try:
                async with self.session.get(
                        st.url + "/kv_cache_events") as r:
                    if r.status == 200:
                        st.apply_events(await r.json())
            except Exception as e:
                logger.debug("kv event poll %s: %s", st.url, e)

    async def poll_kv_events(self) -> None:
        await self._poll_once()

    # -- selection -------------------------------------------------------
    async def get_next_server(self, request: dict) -> str:
        hashes = self.block_hashes_for(self._request_token_ids(request))
        async with self._lock:
            best, best_score = None, None
            for st in self._healthy_states():
                matched = 0
                for h in hashes:           # longest-prefix match
                    if h in st.block_hashes:
                        matched += self.tokens_per_block
                    else:
                        break
                score = matched - st.num_active_tokens * self.load_penalty
                if best_score is None or score > best_score:
                    best, best_score = st, score
            best.increment(request)
            return best.url


def create_router(policy: str,
                  servers: Optional[Sequence[str]] = None,
                  **kwargs: Any) -> Router:
    """Factory (reference: router.py create_router)."""
    policies = {
        "round_robin": RoundRobinRouter,
        "load_balancing": LoadBalancingRouter,
        "kv_cache_aware": KvCacheAwareRouter,
    }
    if policy not in policies:
        raise ValueError(f"unknown router policy {policy!r}; "
                         f"choose from {sorted(policies)}")
    return policies[policy](servers, **kwargs)
