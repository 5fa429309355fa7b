"""Disk tier for the unified KV paging hierarchy.

Role of the reference KV cache manager **v2** storage stack (reference:
tensorrt_llm/runtime/kv_cache_manager_v2/_storage_manager.py — GPU/host/
disk CacheTier page lifecycle, _copy_engine.py async prioritized
transfers with bandwidth accounting, _eviction_controller/ policy):
the radix tree in runtime/kv_cache_manager.py already demotes device
pages to the host tier on eviction; this module adds the third tier.
Host-LRU victims demote to DISK instead of being dropped, and a later
prefix match promotes disk → device directly.

Copy-engine semantics:
  * ``put`` is async (single writer thread) and never blocks the
    executor loop; ``get`` joins an in-flight write when a block is
    promoted before it lands.
  * **Write backpressure**: at most ``max_inflight_bytes`` of queued
    writes; past that, new demotions are DROPPED (counted) rather than
    queueing unboundedly behind a slow disk — the copy engine's
    bandwidth-management role. Reads (promotions) always proceed.
  * **Byte-capacity eviction**: the store tracks real file bytes and
    evicts in priority-then-LRU order: lower retention priority
    evicts first, ties broken oldest-first (the eviction-controller
    role; reference evictionPolicy.h priority levels).
  * Stats: hits/misses/drops/bytes for /metrics + IterationStats.
"""
from __future__ import annotations

import os
import threading
import uuid
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..logger import logger


@dataclass
class DiskTierStats:
    puts: int = 0
    put_drops: int = 0          # backpressure: demotion skipped
    hits: int = 0
    misses: int = 0
    evictions: int = 0
    bytes_stored: int = 0
    bytes_written: int = 0
    bytes_read: int = 0

    def as_dict(self) -> Dict[str, int]:
        return dict(self.__dict__)


@dataclass(order=True)
class _Entry:
    priority: int
    seq: int
    key: str = field(compare=False)
    nbytes: int = field(compare=False, default=0)


class DiskKvStore:
    def __init__(self, directory: str, max_blocks: int = 1 << 20,
                 max_bytes: Optional[int] = None,
                 max_inflight_bytes: int = 256 << 20):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.max_blocks = max_blocks
        self.max_bytes = max_bytes
        self.max_inflight_bytes = max_inflight_bytes
        self._entries: "OrderedDict[str, _Entry]" = OrderedDict()
        self._pending: Dict[str, Future] = {}
        self._inflight_bytes = 0
        self._seq = 0
        self._lock = threading.Lock()
        self._writer = ThreadPoolExecutor(1, thread_name_prefix="kv-disk")
        self.stats = DiskTierStats()

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key + ".npy")

    # ------------------------------------------------------------------ #
    def put(self, data, priority: int = 35) -> Optional[str]:
        """Schedule one block's write; returns the key, or None when
        write backpressure drops the demotion (the block is simply not
        cached — correctness is unaffected, it recomputes on miss).
        ``priority`` follows the retention convention (higher = keep
        longer; default 35 matches the radix tree's default)."""
        arr = np.asarray(data)
        nbytes = arr.nbytes
        with self._lock:
            if self._inflight_bytes + nbytes > self.max_inflight_bytes:
                self.stats.put_drops += 1
                return None
            self._inflight_bytes += nbytes
            self._seq += 1
            key = uuid.uuid4().hex
            self._entries[key] = _Entry(priority, self._seq, key, nbytes)
            self._pending[key] = self._writer.submit(
                self._write, key, arr)
            self.stats.puts += 1
            self.stats.bytes_stored += nbytes
            self._evict_over_capacity_nolock()
        return key

    def _write(self, key: str, arr: np.ndarray) -> None:
        try:
            np.save(self._path(key), arr)
            self.stats.bytes_written += arr.nbytes
        except OSError as e:
            logger.warning("KV disk tier write failed: %s", e)
        finally:
            with self._lock:
                self._pending.pop(key, None)
                self._inflight_bytes = max(
                    0, self._inflight_bytes - arr.nbytes)

    def _evict_over_capacity_nolock(self) -> None:
        def over():
            if len(self._entries) > self.max_blocks:
                return True
            return (self.max_bytes is not None
                    and self.stats.bytes_stored > self.max_bytes)
        while over() and self._entries:
            # lowest (priority, seq): lowest retention priority first,
            # ties oldest-first (priority-aware LRU)
            victim = min(self._entries.values())
            self._drop_nolock(victim.key)
            self.stats.evictions += 1

    # ------------------------------------------------------------------ #
    def get(self, key: str) -> Optional[np.ndarray]:
        with self._lock:
            ent = self._entries.get(key)
            if ent is None:
                self.stats.misses += 1
                return None
            fut = self._pending.get(key)
            self._seq += 1
            ent.seq = self._seq          # LRU touch
        if fut is not None:
            fut.result()                 # join the in-flight write
        try:
            arr = np.load(self._path(key))
            self.stats.hits += 1
            self.stats.bytes_read += arr.nbytes
            return arr
        except OSError:
            with self._lock:
                self.stats.misses += 1
            return None

    def get_many(self, keys: List[str]) -> List[Optional[np.ndarray]]:
        """Promotion read-ahead: join all in-flight writes first, then
        stream reads in order (the copy engine batches promotions the
        same way so the device onboard never interleaves with seeks)."""
        with self._lock:
            futs = [self._pending.get(k) for k in keys]
        for f in futs:
            if f is not None:
                f.result()
        return [self.get(k) for k in keys]

    def drop(self, key: str) -> None:
        with self._lock:
            self._drop_nolock(key)

    def _drop_nolock(self, key: str) -> None:
        ent = self._entries.pop(key, None)
        if ent is not None:
            self.stats.bytes_stored -= ent.nbytes
        fut = self._pending.pop(key, None)
        if fut is not None:
            fut.cancel()
        try:
            os.remove(self._path(key))
        except OSError:
            pass

    def shutdown(self) -> None:
        self._writer.shutdown(wait=True)
