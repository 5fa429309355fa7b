"""Pluggable external KV-cache connector API.

Behavioral reference: tensorrt_llm/_torch/pyexecutor/connectors/
kv_cache_connector.py:94 (KvCacheConnectorWorker),
:192 (KvCacheConnectorScheduler), :402 (KvCacheConnectorManager) — the
vLLM-style split where a *scheduler half* decides which tokens an
external store can supply / whether a finished request saves
asynchronously, and a *worker half* moves the bytes.

TPU shape: device KV lives as one stacked pages array
``[L, pages, page, 2*nkv, hd]``; the worker half moves data through the
engine's jitted gather/scatter (``extract_kv`` / ``inject_kv``) rather
than per-layer CUDA-stream hooks — one DMA per request instead of a
layer pipeline, which is the natural granularity under XLA.

The executor drives the manager:
  admission  → get_num_new_matched_tokens → (load) → update_state_after_alloc
  per batch  → build_connector_meta → worker.bind … start_load_kv
  finish     → request_finished (True ⇒ blocks held until saved)
"""
from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

from ..logger import logger


@dataclasses.dataclass
class RequestData:
    """Per-request view handed to build_connector_meta (reference:
    kv_cache_connector.py:61)."""
    request_id: int
    new_tokens: List[int]
    new_block_ids: List[int]
    computed_position: int


@dataclasses.dataclass
class SchedulerOutput:
    """Batch view for connector metadata (reference: :86)."""
    new_requests: List[RequestData] = dataclasses.field(default_factory=list)
    cached_requests: List[RequestData] = dataclasses.field(
        default_factory=list)


class KvCacheConnectorWorker(ABC):
    """Data-plane half. Runs wherever the engine runs."""

    def __init__(self):
        self._meta: Any = None
        self.engine = None

    def register_engine(self, engine) -> None:
        """Called once; gives the worker the jitted KV movers."""
        self.engine = engine

    def bind_connector_meta(self, metadata: Any) -> None:
        self._meta = metadata

    def get_connector_meta(self) -> Any:
        return self._meta

    def _clear_connector_meta(self) -> None:
        self._meta = None

    @abstractmethod
    def start_load_kv(self) -> None:
        """Begin loading the blocks named by the bound metadata into the
        device pool (may be async; completion is polled via
        get_finished)."""

    def wait_for_save(self) -> None:
        """Block until every pending save has durably landed."""

    def get_finished(self) -> Tuple[Set[int], Set[int]]:
        """(request_ids finished saving, request_ids finished loading)
        for async connectors; sync connectors return empty sets."""
        return set(), set()


class KvCacheConnectorScheduler(ABC):
    """Control-plane half. Runs on the scheduling rank only."""

    @abstractmethod
    def get_num_new_matched_tokens(
            self, request, num_computed_tokens: int) -> Tuple[int, bool]:
        """How many tokens beyond ``num_computed_tokens`` the external
        store can supply for this request, and whether the load is
        asynchronous (reference: :210)."""

    def update_state_after_alloc(self, request,
                                 block_ids: List[int]) -> None:
        """Blocks were allocated for a request whose prefix this
        connector promised (reference: :242)."""

    def build_connector_meta(self, scheduler_output: SchedulerOutput) -> Any:
        """Metadata shipped to the worker for this batch (reference:
        :198)."""
        return None

    def request_finished(self, request,
                         cache_block_ids: List[int]) -> bool:
        """Request completed; return True to save asynchronously (the
        manager holds the blocks until the worker reports the save done;
        reference: :227)."""
        return False


class KvConnectorManager:
    """Executor-side driver gluing both halves into the iteration loop
    (reference: :402 — implementation detail, not connector API)."""

    def __init__(self, worker: KvCacheConnectorWorker,
                 scheduler: Optional[KvCacheConnectorScheduler]):
        self.worker = worker
        self.scheduler = scheduler
        # request_id -> (request, block_ids) awaiting async save
        self._saving: Dict[int, Tuple[Any, List[int]]] = {}
        self._output = SchedulerOutput()

    # -- admission -------------------------------------------------------
    def query_match(self, request, num_computed_tokens: int) -> int:
        if self.scheduler is None:
            return 0
        n, _async = self.scheduler.get_num_new_matched_tokens(
            request, num_computed_tokens)
        return max(0, int(n))

    def after_alloc(self, request, matched_extra: int) -> None:
        if self.scheduler is not None and matched_extra > 0:
            self.scheduler.update_state_after_alloc(
                request, list(request.kv_block_ids))
        self._output.new_requests.append(RequestData(
            request_id=request.request_id,
            new_tokens=list(request.prompt_token_ids),
            new_block_ids=list(request.kv_block_ids),
            computed_position=request.context_current_position))

    # -- per iteration ---------------------------------------------------
    def begin_batch(self) -> None:
        if self.scheduler is not None:
            meta = self.scheduler.build_connector_meta(self._output)
        else:
            meta = None
        self._output = SchedulerOutput()
        self.worker.bind_connector_meta(meta)
        self.worker.start_load_kv()
        self.worker._clear_connector_meta()

    # -- completion ------------------------------------------------------
    def on_request_finished(self, request) -> bool:
        """True ⇒ the executor must NOT free the blocks yet."""
        if self.scheduler is None:
            return False
        hold = self.scheduler.request_finished(
            request, list(request.kv_block_ids))
        if hold:
            self._saving[request.request_id] = (
                request, list(request.kv_block_ids))
        return hold

    def poll_finished_saves(self) -> List[Any]:
        """Requests whose async save completed; caller frees their KV."""
        if not self._saving:
            return []
        saved_ids, _ = self.worker.get_finished()
        done = []
        for rid in list(saved_ids):
            entry = self._saving.pop(rid, None)
            if entry is not None:
                done.append(entry[0])
        return done

    def shutdown(self) -> None:
        self.worker.wait_for_save()


# --------------------------------------------------------------------- #
# In-repo reference connector: external host-memory prefix store
# --------------------------------------------------------------------- #
class HostMemoryKvConnector(KvCacheConnectorWorker,
                            KvCacheConnectorScheduler):
    """Both halves in one object (single-process deployments): finished
    requests' KV is copied to host memory keyed by stable block hashes;
    later requests with a matching token prefix skip recompute by
    loading it back. The external twin of the in-device radix tree —
    same role as the reference's LMCache-style connectors."""

    def __init__(self, tokens_per_block: int, max_blocks: int = 4096):
        KvCacheConnectorWorker.__init__(self)
        self.tokens_per_block = tokens_per_block
        self.max_blocks = max_blocks
        self._store: Dict[int, Any] = {}     # block_hash -> host kv [L,...]
        self._loads: List[Tuple[List[int], List[int]]] = []
        # request_id -> tokens already on-device when we were queried
        # (radix-reused prefix: those blocks are shared — never write them)
        self._computed: Dict[int, int] = {}
        self.stats = {"saved_blocks": 0, "loaded_blocks": 0}

    # -- hashing ---------------------------------------------------------
    def _hashes(self, tokens: Sequence[int]) -> List[int]:
        from .kv_cache_manager import stable_block_hash
        out, parent = [], None
        tb = self.tokens_per_block
        for i in range(0, len(tokens) - tb + 1, tb):
            parent = stable_block_hash(tuple(tokens[i:i + tb]), parent)
            out.append(parent)
        return out

    # -- scheduler half --------------------------------------------------
    def get_num_new_matched_tokens(self, request,
                                   num_computed_tokens: int):
        tokens = request.prompt_token_ids
        # last token is never supplied: its KV must be recomputed for
        # logits (same rule as the in-device radix reuse)
        hashes = self._hashes(tokens[:len(tokens) - 1]
                              if len(tokens) % self.tokens_per_block == 0
                              else tokens)
        matched = 0
        for h in hashes:
            if h in self._store:
                matched += self.tokens_per_block
            else:
                break
        self._computed[request.request_id] = num_computed_tokens
        return max(0, matched - num_computed_tokens), False

    def update_state_after_alloc(self, request, block_ids) -> None:
        tokens = request.prompt_token_ids
        hashes = self._hashes(tokens)
        tb = self.tokens_per_block
        skip = self._computed.pop(request.request_id, 0) // tb
        n_load = request.context_current_position // tb
        want = [h for h in hashes[skip:n_load] if h in self._store]
        if want:
            self._loads.append((want, block_ids[skip:skip + len(want)]))

    def request_finished(self, request, cache_block_ids) -> bool:
        if self.engine is None:
            return False
        import numpy as np
        tokens = request.all_token_ids
        hashes = self._hashes(tokens)
        keep = [i for i, h in enumerate(hashes)
                if h not in self._store][:len(cache_block_ids)]
        if keep and len(self._store) < self.max_blocks:
            full = self.engine.extract_kv(
                cache_block_ids[:len(hashes)],
                len(hashes) * self.tokens_per_block)
            full = np.asarray(full)   # [L, nblocks*page, 2nkv, hd]
            per = full.reshape(full.shape[0], len(hashes),
                               self.tokens_per_block, *full.shape[2:])
            for i in keep:
                self._store[hashes[i]] = per[:, i].copy()
                self.stats["saved_blocks"] += 1
        return False    # synchronous save: blocks free immediately

    # -- worker half -----------------------------------------------------
    def start_load_kv(self) -> None:
        import numpy as np
        while self._loads:
            want, block_ids = self._loads.pop()
            parts = [self._store[h] for h in want]
            kv = np.concatenate(parts, axis=1)   # [L, n*page, 2nkv, hd]
            self.engine.inject_kv(block_ids, kv)
            self.stats["loaded_blocks"] += len(want)


class DiskKvConnector(HostMemoryKvConnector):
    """Disk-tier prefix store (reference: the KV manager v2 disk tier /
    LMCache-style connectors): block payloads live as memory-mapped
    files under ``cache_dir`` keyed by stable block hash; the in-memory
    index holds only paths. Survives engine restarts — a new LLM over
    the same cache_dir re-serves saved prefixes."""

    def __init__(self, tokens_per_block: int, cache_dir: str,
                 max_blocks: int = 1 << 20):
        super().__init__(tokens_per_block, max_blocks)
        import os
        from pathlib import Path
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        # restart recovery: adopt existing block files
        self._store = _DiskStore(self.cache_dir)


class _DiskStore(dict):
    """dict façade over <hash>.npy files (np.load mmap on read)."""

    def __init__(self, root):
        super().__init__()
        self.root = root
        for f in root.glob("*.npy"):
            try:
                super().__setitem__(int(f.stem), f)
            except ValueError:
                continue

    def __setitem__(self, h, arr):
        import numpy as _np
        path = self.root / f"{h}.npy"
        _np.save(path, _np.asarray(arr))
        super().__setitem__(h, path)

    def __getitem__(self, h):
        import numpy as _np
        v = super().__getitem__(h)
        return _np.load(v, mmap_mode="r")
