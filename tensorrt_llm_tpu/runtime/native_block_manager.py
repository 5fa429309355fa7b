"""ctypes bindings + drop-in native KVCacheManager.

Binds cpp/block_manager.cpp (built as libtllm_tpu_host.so). The native
manager mirrors the python ``KVCacheManager`` API surface used by the
executor; the python implementation remains the behavioral reference and
the automatic fallback. Selection: ``NativeKVCacheManager.available()``
plus the ``TLLM_TPU_NATIVE`` env var (default: use native when built).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional

import numpy as np

from .kv_cache_manager import KvCacheStats, NoFreeBlocksError
from .request import LlmRequest

_LIB = None
_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "cpp" / \
    "libtllm_tpu_host.so"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.bm_create.restype = ctypes.c_void_p
    lib.bm_create.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.bm_destroy.argtypes = [ctypes.c_void_p]
    lib.bm_free_blocks.restype = ctypes.c_longlong
    lib.bm_free_blocks.argtypes = [ctypes.c_void_p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bm_add_sequence.restype = ctypes.c_longlong
    lib.bm_add_sequence.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, i32p]
    lib.bm_grow.restype = ctypes.c_longlong
    lib.bm_grow.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                            ctypes.c_longlong, i32p]
    lib.bm_rewind.restype = ctypes.c_longlong
    lib.bm_rewind.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                              ctypes.c_longlong]
    lib.bm_free_sequence.restype = ctypes.c_longlong
    lib.bm_free_sequence.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32]
    lib.bm_set_priority.restype = ctypes.c_longlong
    lib.bm_set_priority.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                    ctypes.c_int32]
    lib.bm_num_seq_blocks.restype = ctypes.c_longlong
    lib.bm_num_seq_blocks.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.bm_stats.restype = ctypes.c_longlong
    lib.bm_stats.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_longlong),
                             ctypes.POINTER(ctypes.c_longlong),
                             ctypes.POINTER(ctypes.c_longlong)]
    _LIB = lib
    return lib


class NativeKVCacheManager:
    """API-compatible with runtime.kv_cache_manager.KVCacheManager."""

    def __init__(self, num_blocks: int, tokens_per_block: int,
                 max_seq_len: int = 1 << 30, enable_block_reuse: bool = True,
                 event_buffer_max_size: int = 0, sink_token_length: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native block manager library not built "
                               "(run `make -C cpp`)")
        self._lib = lib
        self.num_blocks = num_blocks
        self.tokens_per_block = tokens_per_block
        self.max_seq_len = max_seq_len
        self.enable_block_reuse = enable_block_reuse
        self._h = lib.bm_create(num_blocks, tokens_per_block,
                                int(enable_block_reuse))
        self._stats = KvCacheStats(max_blocks=num_blocks)
        self._seq_ids = set()

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def __del__(self):
        try:
            self._lib.bm_destroy(self._h)
        except Exception:
            pass

    # ------------------------------------------------------------------ #
    @staticmethod
    def _salt(request: LlmRequest) -> int:
        parts = (request.cache_salt, request.lora_task_id)
        return (hash(parts) & 0x7FFFFFFF) if any(p is not None
                                                 for p in parts) else 0

    @property
    def free_block_count(self) -> int:
        return int(self._lib.bm_free_blocks(self._h))

    def get_num_free_blocks(self) -> int:
        return self.free_block_count

    def blocks_for_tokens(self, num_tokens: int) -> int:
        return -(-num_tokens // self.tokens_per_block)

    @staticmethod
    def _device_progress(request: LlmRequest) -> int:
        return max(request.num_total_tokens, request.num_device_tokens)

    def get_needed_blocks_one_step(self, request: LlmRequest) -> int:
        have = int(self._lib.bm_num_seq_blocks(self._h, request.request_id))
        if request.is_context_init_state:
            end = min(request.prompt_len,
                      request.context_current_position +
                      request.context_chunk_size)
            return max(0, self.blocks_for_tokens(end) - have)
        return max(0, self.blocks_for_tokens(
            self._device_progress(request) + 1) - have)

    def get_remaining_blocks_to_completion(self, request: LlmRequest) -> int:
        total = request.prompt_len + request.max_new_tokens
        have = int(self._lib.bm_num_seq_blocks(self._h, request.request_id))
        return max(0, self.blocks_for_tokens(total) - have)

    # ------------------------------------------------------------------ #
    def add_sequence(self, request: LlmRequest,
                     enable_reuse: Optional[bool] = None) -> int:
        prompt = np.asarray(request.prompt_token_ids, np.int32)
        out = np.zeros(self.blocks_for_tokens(len(prompt)), np.int32)
        reuse = self.enable_block_reuse if enable_reuse is None \
            else enable_reuse
        r = self._lib.bm_add_sequence(
            self._h, request.request_id, prompt, len(prompt),
            self._salt(request), int(reuse), out)
        if r == -1:
            raise NoFreeBlocksError("no free or evictable KV blocks")
        if r == -2:
            raise ValueError(f"request {request.request_id} already added")
        self._seq_ids.add(request.request_id)
        request.kv_block_ids = out.tolist()
        request.num_cached_tokens = int(r)
        self._stats.reused_blocks += int(r) // self.tokens_per_block
        return int(r)

    def _grow(self, request: LlmRequest, total: int) -> None:
        out = np.zeros(self.blocks_for_tokens(max(total, 1)), np.int32)
        r = self._lib.bm_grow(self._h, request.request_id, total, out)
        if r == -1:
            raise NoFreeBlocksError("no free or evictable KV blocks")
        request.kv_block_ids = out[:int(r)].tolist()

    def add_token(self, request: LlmRequest) -> None:
        self._grow(request, self._device_progress(request) + 1)

    def add_tokens(self, request: LlmRequest, num_tokens: int) -> None:
        self._grow(request, self._device_progress(request) + num_tokens)

    def add_draft_tokens(self, request: LlmRequest, num_draft: int) -> None:
        self._grow(request, self._device_progress(request) + 1 + num_draft)

    def rewind_tokens(self, request: LlmRequest, num_tokens: int) -> None:
        total = max(1, request.num_total_tokens - num_tokens)
        r = self._lib.bm_rewind(self._h, request.request_id, total)
        if r >= 0:
            request.kv_block_ids = request.kv_block_ids[:int(r)]

    def free_resources(self, request: LlmRequest,
                       store_for_reuse: Optional[bool] = None) -> None:
        if request.request_id not in self._seq_ids:
            return
        store = self.enable_block_reuse if store_for_reuse is None \
            else store_for_reuse
        tokens = np.asarray(request.all_token_ids, np.int32)
        self._lib.bm_free_sequence(self._h, request.request_id, tokens,
                                   len(tokens), self._salt(request),
                                   int(store))
        self._seq_ids.discard(request.request_id)
        request.kv_block_ids = []

    def update_priority(self, request: LlmRequest, priority: int) -> None:
        self._lib.bm_set_priority(self._h, request.request_id, priority)

    def get_cache_block_ids(self, request: LlmRequest) -> List[int]:
        return list(request.kv_block_ids)

    # compat shims used by schedulers/executor ------------------------- #
    @property
    def _seq_blocks(self):
        return {rid: True for rid in self._seq_ids}

    def get_stats(self) -> KvCacheStats:
        reused = ctypes.c_longlong()
        missed = ctypes.c_longlong()
        reusable = ctypes.c_longlong()
        self._lib.bm_stats(self._h, ctypes.byref(reused),
                           ctypes.byref(missed), ctypes.byref(reusable))
        s = self._stats
        s.free_blocks = self.free_block_count
        s.used_blocks = self.num_blocks - s.free_blocks
        s.reusable_blocks = int(reusable.value)
        s.reused_blocks = int(reused.value)
        s.missed_blocks = int(missed.value)
        total = s.reused_blocks + s.missed_blocks
        s.cache_hit_rate = s.reused_blocks / total if total else 0.0
        return s

    def get_latest_events(self, clear: bool = True):
        return []
