"""Paged KV-cache block manager with radix-tree prefix reuse.

Host-side analog of the reference C++ ``KVCacheManager``/``BlockManager``
(reference: cpp/include/tensorrt_llm/batch_manager/kvCacheManager.h:358-2201,
blockKey.h:43-110, evictionPolicy.h:71-125; python facade
tensorrt_llm/_torch/pyexecutor/resource_manager.py:535). The reference keeps
this in C++ for speed but also ships a pure-Python v2
(tensorrt_llm/runtime/kv_cache_manager_v2/) — we start pure-Python with the
same semantics and keep the door open for a C-extension hot path.

Semantics replicated:
  * Block identity: ``BlockKey`` = (tokens_in_block, lora_task_id,
    cache_salt, extra multimodal hashes); exact-key matching per block,
    longest-prefix matching over the chain (blockKey.h:43-110).
  * Reuse: finished sequences re-attach their block chain to a radix tree;
    new sequences claim the longest matched prefix (ref-counted sharing).
  * Eviction: priority-bucketed LRU over *leaf* blocks only
    (evictionPolicy.h:71-125; docs/source/features/kvcache.md), default
    priority 35 on a 0-100 scale.
  * The device tensors are NOT owned here: this class hands out integer
    page ids; the model engine owns the `[layers, pages, page, heads, dim]`
    pools (see runtime/model_engine.py).
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

from ..logger import logger
from .request import LlmRequest

DEFAULT_PRIORITY = 35  # reference: docs/source/features/kvcache.md


@dataclasses.dataclass(frozen=True)
class BlockKey:
    """Identity of one full KV block (reference: blockKey.h:43-110)."""
    tokens: Tuple[int, ...]
    lora_task_id: Optional[int] = None
    cache_salt: Optional[str] = None
    extra_hashes: Tuple[int, ...] = ()


class Block:
    """One KV page. ``ref_count`` counts active sequences using the page;
    a page may additionally be retained by the reuse tree (``in_tree``)."""
    __slots__ = ("block_id", "ref_count", "key", "parent", "children",
                 "in_tree", "priority", "_lru_tick")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.key: Optional[BlockKey] = None
        self.parent: Optional["Block"] = None
        self.children: Dict[BlockKey, "Block"] = {}
        self.in_tree = False
        self.priority = DEFAULT_PRIORITY
        self._lru_tick = 0

    @property
    def is_leaf(self) -> bool:
        return not self.children

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.children.pop(self.key, None)
        self.parent = None
        self.key = None
        self.in_tree = False
        self.children = {}


@dataclasses.dataclass
class KvCacheStats:
    max_blocks: int = 0
    free_blocks: int = 0
    used_blocks: int = 0
    reusable_blocks: int = 0
    alloc_total_blocks: int = 0
    alloc_new_blocks: int = 0
    reused_blocks: int = 0
    missed_blocks: int = 0
    cache_hit_rate: float = 0.0


@dataclasses.dataclass
class KVCacheEvent:
    """Block stored/removed events for external routers
    (reference: kvCacheEventManager.h:38, resource_manager.py:1678)."""
    event_id: int
    kind: str                   # "created" | "stored" | "removed"
    block_hashes: List[int]


class KVCacheManager:
    """Paged KV allocator for one attention-window size.

    Multiple window sizes (VSWA) each get their own manager instance, as in
    the reference's pool-per-window design (resource_manager.py:1878).
    """

    def __init__(self,
                 num_blocks: int,
                 tokens_per_block: int,
                 max_seq_len: int = 1 << 30,
                 enable_block_reuse: bool = True,
                 event_buffer_max_size: int = 0,
                 sink_token_length: int = 0):
        if tokens_per_block <= 0:
            raise ValueError("tokens_per_block must be positive")
        self.num_blocks = num_blocks
        self.tokens_per_block = tokens_per_block
        self.max_seq_len = max_seq_len
        self.enable_block_reuse = enable_block_reuse
        self.sink_token_length = sink_token_length

        self._blocks = [Block(i) for i in range(num_blocks)]
        self._free: List[int] = list(range(num_blocks - 1, -1, -1))  # LIFO
        # reusable leaves: priority -> OrderedDict[block_id, None] (LRU order)
        self._reusable: Dict[int, OrderedDict] = {}
        self._num_reusable = 0
        self._root = Block(-1)  # sentinel radix-tree root (no storage)
        self._root.in_tree = True
        self._lru_clock = 0

        # per-request allocations
        self._seq_blocks: Dict[int, List[Block]] = {}

        self._stats = KvCacheStats(max_blocks=num_blocks)
        self._events: List[KVCacheEvent] = []
        self._event_buffer_max_size = event_buffer_max_size
        self._event_id = 0

    # ------------------------------------------------------------------ #
    # Capacity queries (used by the capacity scheduler)
    # ------------------------------------------------------------------ #
    @property
    def free_block_count(self) -> int:
        return len(self._free) + self._num_reusable

    def get_num_free_blocks(self) -> int:
        return self.free_block_count

    def blocks_for_tokens(self, num_tokens: int) -> int:
        return -(-num_tokens // self.tokens_per_block)

    def get_needed_blocks_one_step(self, request: LlmRequest) -> int:
        """Blocks needed to schedule `request` for one more iteration."""
        if request.is_context_init_state:
            end = min(request.prompt_len,
                      request.context_current_position + request.context_chunk_size)
            have = len(self._seq_blocks.get(request.request_id, ()))
            return max(0, self.blocks_for_tokens(end) - have)
        # generation: one more token
        have = len(self._seq_blocks.get(request.request_id, ()))
        return max(0, self.blocks_for_tokens(
            self._device_progress(request) + 1) - have)

    def get_remaining_blocks_to_completion(self, request: LlmRequest) -> int:
        """Worst-case blocks to finish the request (GuaranteedNoEvict policy;
        reference: capacityScheduler.h:109)."""
        total = request.prompt_len + request.max_new_tokens
        have = len(self._seq_blocks.get(request.request_id, ()))
        return max(0, self.blocks_for_tokens(total) - have)

    # ------------------------------------------------------------------ #
    # Allocation API (called from prepare_resources each iteration)
    # ------------------------------------------------------------------ #
    def add_sequence(self, request: LlmRequest,
                     enable_reuse: Optional[bool] = None) -> int:
        """Claim blocks for a new context-phase sequence.

        Performs longest-prefix reuse over full blocks of the prompt (all
        but the final token — its KV must be recomputed to produce logits,
        matching kvCacheManager.cpp loadOrAllocateBlocks). Returns the
        number of prefix tokens reused. Two-phase claim-then-allocate so a
        matched block is never evicted to serve the same request's tail
        allocation (resource_manager.py:986-1066).
        """
        rid = request.request_id
        if rid in self._seq_blocks:
            raise ValueError(f"request {rid} already has KV blocks")
        chain: List[Block] = []
        reused_tokens = 0
        reuse = self.enable_block_reuse if enable_reuse is None else enable_reuse
        if reuse:
            node = self._root
            matchable = len(request.prompt_token_ids) - 1
            pos = 0
            while matchable - pos >= self.tokens_per_block:
                key = self._make_key(request, pos)
                child = node.children.get(key)
                if child is None:
                    break
                self._claim_reused(child)
                chain.append(child)
                pos += self.tokens_per_block
                node = child
            reused_tokens = pos

        total_needed = self.blocks_for_tokens(request.prompt_len)
        new_needed = total_needed - len(chain)
        if new_needed > len(self._free) + self._num_reusable:
            # roll back claims
            for b in chain:
                self._release_block(b, request)
            raise NoFreeBlocksError(
                f"need {new_needed} blocks, have {self.free_block_count}")
        for _ in range(new_needed):
            chain.append(self._allocate_block())
        self._seq_blocks[rid] = chain
        request.kv_block_ids = [b.block_id for b in chain]
        request.num_cached_tokens = reused_tokens
        self._stats.reused_blocks += len(chain) - new_needed
        self._stats.missed_blocks += new_needed
        self._stats.alloc_new_blocks += new_needed
        self._stats.alloc_total_blocks += len(chain)
        return reused_tokens

    @staticmethod
    def _device_progress(request: LlmRequest) -> int:
        """Allocation follows *device* progress, which runs ahead of the
        host-accepted token count by up to the executor pipeline depth."""
        return max(request.num_total_tokens, request.num_device_tokens)

    def add_token(self, request: LlmRequest) -> None:
        """Ensure capacity for one more generated token."""
        chain = self._seq_blocks[request.request_id]
        needed = self.blocks_for_tokens(self._device_progress(request) + 1)
        while len(chain) < needed:
            chain.append(self._allocate_block())
            self._stats.alloc_new_blocks += 1
            self._stats.alloc_total_blocks += 1
        request.kv_block_ids = [b.block_id for b in chain]

    def add_draft_tokens(self, request: LlmRequest, num_draft: int) -> None:
        """Capacity for speculative draft tokens verified next step."""
        chain = self._seq_blocks[request.request_id]
        needed = self.blocks_for_tokens(
            self._device_progress(request) + 1 + num_draft)
        while len(chain) < needed:
            chain.append(self._allocate_block())
            self._stats.alloc_new_blocks += 1
            self._stats.alloc_total_blocks += 1
        request.kv_block_ids = [b.block_id for b in chain]

    def free_resources(self, request: LlmRequest,
                       store_for_reuse: Optional[bool] = None) -> None:
        """Release a sequence's blocks; optionally attach them to the reuse
        tree keyed by the tokens they hold."""
        rid = request.request_id
        chain = self._seq_blocks.pop(rid, None)
        if chain is None:
            return
        store = self.enable_block_reuse if store_for_reuse is None else store_for_reuse
        tokens = request.all_token_ids
        node = self._root
        stored_hashes: List[int] = []
        for i, block in enumerate(chain):
            start = i * self.tokens_per_block
            full = start + self.tokens_per_block <= len(tokens)
            if store and full and node is not None and not block.in_tree:
                key = BlockKey(
                    tokens=tuple(tokens[start:start + self.tokens_per_block]),
                    lora_task_id=request.lora_task_id,
                    cache_salt=request.cache_salt)
                if key in node.children and node.children[key] is not block:
                    # duplicate content: keep existing tree block, just release ours
                    self._release_block(block, request)
                    node = node.children[key]
                    continue
                block.key = key
                block.parent = node
                block.in_tree = True
                node.children[key] = block
                stored_hashes.append(hash(key))
                node = block
                self._release_block(block, request)
            elif block.in_tree:
                node = block
                self._release_block(block, request)
            else:
                node = None  # chain broken: deeper blocks cannot attach
                self._release_block(block, request)
        if stored_hashes:
            self._push_event("stored", stored_hashes)
        request.kv_block_ids = []

    def update_priority(self, request: LlmRequest, priority: int) -> None:
        for b in self._seq_blocks.get(request.request_id, ()):
            b.priority = priority

    def get_cache_block_ids(self, request: LlmRequest) -> List[int]:
        return [b.block_id for b in self._seq_blocks[request.request_id]]

    def rewind_tokens(self, request: LlmRequest, num_tokens: int) -> None:
        """Drop KV for the last ``num_tokens`` (speculative rejection);
        frees now-unused tail blocks (reference: kvCacheManager rewind)."""
        chain = self._seq_blocks[request.request_id]
        needed = self.blocks_for_tokens(max(1, request.num_total_tokens - num_tokens))
        while len(chain) > needed:
            block = chain.pop()
            self._release_block(block, request)
        request.kv_block_ids = [b.block_id for b in chain]

    # ------------------------------------------------------------------ #
    # Stats / events
    # ------------------------------------------------------------------ #
    def get_stats(self) -> KvCacheStats:
        s = self._stats
        s.free_blocks = self.free_block_count
        s.used_blocks = self.num_blocks - s.free_blocks
        s.reusable_blocks = self._num_reusable
        total = s.reused_blocks + s.missed_blocks
        s.cache_hit_rate = s.reused_blocks / total if total else 0.0
        return s

    def get_latest_events(self, clear: bool = True) -> List[KVCacheEvent]:
        ev = self._events
        if clear:
            self._events = []
        return ev

    # ------------------------------------------------------------------ #
    # Internals
    # ------------------------------------------------------------------ #
    def _make_key(self, request: LlmRequest, start: int) -> BlockKey:
        return BlockKey(
            tokens=tuple(request.prompt_token_ids[start:start + self.tokens_per_block]),
            lora_task_id=request.lora_task_id,
            cache_salt=request.cache_salt)

    def _claim_reused(self, block: Block) -> None:
        if block.ref_count == 0:
            self._reusable_remove(block)
        block.ref_count += 1

    def _release_block(self, block: Block, request: LlmRequest) -> None:
        block.ref_count -= 1
        if block.ref_count < 0:
            raise AssertionError(f"double free of block {block.block_id}")
        if block.ref_count == 0:
            if block.in_tree:
                self._reusable_add(block)
            else:
                self._free.append(block.block_id)

    def _allocate_block(self) -> Block:
        if self._free:
            block = self._blocks[self._free.pop()]
        else:
            block = self._evict_one()
        block.ref_count = 1
        block.priority = DEFAULT_PRIORITY
        return block

    def _evict_one(self) -> Block:
        """Evict the lowest-priority, least-recently-used *leaf* reusable
        block (evictionPolicy.h:71-125)."""
        for priority in sorted(self._reusable):
            bucket = self._reusable[priority]
            for block_id in bucket:
                block = self._blocks[block_id]
                if block.is_leaf:
                    self._reusable_remove(block)
                    self._push_event("removed", [hash(block.key)])
                    block.detach()
                    # parent may become an evictable leaf; nothing to do —
                    # it is already in the reusable structure if ref==0.
                    return block
        raise NoFreeBlocksError("no free or evictable KV blocks")

    def _reusable_add(self, block: Block) -> None:
        self._lru_clock += 1
        block._lru_tick = self._lru_clock
        self._reusable.setdefault(block.priority, OrderedDict())[block.block_id] = None
        self._num_reusable += 1

    def _reusable_remove(self, block: Block) -> None:
        bucket = self._reusable.get(block.priority)
        if bucket is not None and block.block_id in bucket:
            del bucket[block.block_id]
            if not bucket:
                del self._reusable[block.priority]
            self._num_reusable -= 1

    def _push_event(self, kind: str, hashes: List[int]) -> None:
        if self._event_buffer_max_size <= 0:
            return
        self._event_id += 1
        self._events.append(KVCacheEvent(self._event_id, kind, hashes))
        if len(self._events) > self._event_buffer_max_size:
            self._events.pop(0)


class NoFreeBlocksError(RuntimeError):
    pass
