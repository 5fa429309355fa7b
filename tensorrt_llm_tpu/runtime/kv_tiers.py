"""Disk tier for the unified KV paging hierarchy.

Role of the reference KV cache manager **v2** storage stack (reference:
tensorrt_llm/runtime/kv_cache_manager_v2/_storage_manager.py — GPU/host/
disk CacheTier page lifecycle, _copy_engine.py async transfers,
_eviction_controller/): the radix tree in runtime/kv_cache_manager.py
already demotes device pages to the host tier on eviction; this module
adds the third tier. Host-LRU victims demote to DISK instead of being
dropped, and a later prefix match promotes disk → device directly.

The copy engine is a single writer thread: ``put`` returns immediately
(the executor loop never blocks on disk), ``get`` joins the in-flight
write if the block is promoted before it lands. Files are one .npy per
block under ``dir``; the store LRU-caps total blocks.
"""
from __future__ import annotations

import os
import threading
import uuid
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional

import numpy as np

from ..logger import logger


class DiskKvStore:
    def __init__(self, directory: str, max_blocks: int = 1 << 20):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.max_blocks = max_blocks
        self._lru: "OrderedDict[str, None]" = OrderedDict()
        self._pending: dict = {}
        self._lock = threading.Lock()
        self._writer = ThreadPoolExecutor(1, thread_name_prefix="kv-disk")

    def __len__(self) -> int:
        with self._lock:
            return len(self._lru)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key + ".npy")

    def put(self, data) -> Optional[str]:
        """Schedule one block's write; returns the key (or None when the
        store is disabled). Evicts the LRU block past capacity."""
        key = uuid.uuid4().hex
        arr = np.asarray(data)
        fut: Future = self._writer.submit(self._write, key, arr)
        with self._lock:
            self._pending[key] = fut
            self._lru[key] = None
            while len(self._lru) > self.max_blocks:
                victim, _ = self._lru.popitem(last=False)
                self._drop_nolock(victim)
        return key

    def _write(self, key: str, arr: np.ndarray) -> None:
        try:
            np.save(self._path(key), arr)
        except OSError as e:
            logger.warning("KV disk tier write failed: %s", e)
        finally:
            with self._lock:
                self._pending.pop(key, None)

    def get(self, key: str) -> Optional[np.ndarray]:
        with self._lock:
            fut = self._pending.get(key)
            if key not in self._lru:
                return None
            self._lru.move_to_end(key)
        if fut is not None:
            fut.result()
        try:
            return np.load(self._path(key))
        except OSError:
            return None

    def drop(self, key: str) -> None:
        with self._lock:
            self._lru.pop(key, None)
            self._drop_nolock(key)

    def _drop_nolock(self, key: str) -> None:
        fut = self._pending.pop(key, None)
        if fut is not None:
            fut.cancel()
        try:
            os.remove(self._path(key))
        except OSError:
            pass

    def shutdown(self) -> None:
        self._writer.shutdown(wait=True)
