"""Paged KV-cache block manager with radix-tree prefix reuse and an
optional host-memory secondary tier.

Host-side analog of the reference C++ ``KVCacheManager``/``BlockManager``
(reference: cpp/include/tensorrt_llm/batch_manager/kvCacheManager.h:358-2201,
blockKey.h:43-110, evictionPolicy.h:71-125; python facade
tensorrt_llm/_torch/pyexecutor/resource_manager.py:535). The reference
keeps this in C++ but also ships a pure-Python v2
(tensorrt_llm/runtime/kv_cache_manager_v2/); we do the same — this module
is the behavioral reference, cpp/block_manager.cpp the native twin.

Semantics replicated:
  * Block identity: ``BlockKey`` = (tokens_in_block, lora_task_id,
    cache_salt, extra hashes); exact-key per block, longest-prefix over
    the chain.
  * Reuse: finished sequences attach their chain to a radix tree;
    new sequences claim the longest matched prefix (ref-counted).
  * Eviction: priority-bucketed LRU over *leaf* blocks only; with a host
    tier configured, evicted primary blocks offload to host memory and
    re-onboard on a later prefix match (primary→secondary flow of
    evictionPolicy.h:71-125 + KvCacheConfig.host_cache_size).
  * Device tensors are NOT owned here: integer page ids only; the
    offload/onboard data movers are injected callbacks (the engine's
    jitted page gather/scatter).
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

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


def stable_block_hash(tokens, parent_hash: Optional[int] = None,
                      lora_task_id: Optional[int] = None,
                      cache_salt: Optional[str] = None) -> int:
    """Chained content hash of one full KV block, stable across processes
    (the reference's block_key_hasher, serve/router.py:664: sha256 over
    parent hash + token ids). Routers reproduce these from raw prompts to
    predict prefix-cache hits on remote servers, so process-local
    ``hash()`` is not usable here."""
    import hashlib
    import struct as _struct
    h = hashlib.sha256()
    if parent_hash is not None:
        h.update(_struct.pack("<q", parent_hash))
    if lora_task_id is not None:
        h.update(b"L" + _struct.pack("<q", lora_task_id))
    if cache_salt:
        h.update(b"S" + cache_salt.encode())
    h.update(_struct.pack(f"<{len(tokens)}i", *tokens))
    return int.from_bytes(h.digest()[:8], "little", signed=True)


class RadixNode:
    """Reuse-tree node: holds either a primary block, offloaded host
    data, or (transiently) neither before being pruned."""
    __slots__ = ("key", "parent", "children", "block", "host_data",
                 "disk_key", "priority", "_lru_tick", "content_hash")

    def __init__(self, key: Optional[BlockKey] = None,
                 parent: Optional["RadixNode"] = None):
        self.content_hash: Optional[int] = None
        self.key = key
        self.parent = parent
        self.children: Dict[BlockKey, "RadixNode"] = {}
        self.block: Optional["Block"] = None
        self.host_data = None
        self.disk_key = None
        self.priority = DEFAULT_PRIORITY
        self._lru_tick = 0

    @property
    def is_leaf(self) -> bool:
        return not self.children

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.children.pop(self.key, None)
        self.parent = None
        self.children = {}
        self.host_data = None
        if self.block is not None:
            self.block.node = None
            self.block = None


class Block:
    __slots__ = ("block_id", "ref_count", "node")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.node: Optional[RadixNode] = None


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
    offloaded_blocks: int = 0
    disk_blocks: int = 0
    disk_onboarded_blocks: int = 0
    onboarded_blocks: int = 0
    host_blocks: int = 0


@dataclasses.dataclass
class KVCacheEvent:
    """Block stored/removed events for external routers
    (reference: kvCacheEventManager.h:38, resource_manager.py:1678)."""
    event_id: int
    kind: str                   # "created" | "stored" | "removed" | "offloaded"
    block_hashes: List[int]


class KVCacheManager:
    """Paged KV allocator for one attention-window size.

    Multiple window sizes (VSWA) each get their own manager instance, as
    in the reference's pool-per-window design (resource_manager.py:1878).
    """

    def __init__(self,
                 num_blocks: int,
                 tokens_per_block: int,
                 max_seq_len: int = 1 << 30,
                 enable_block_reuse: bool = True,
                 event_buffer_max_size: int = 0,
                 sink_token_length: int = 0,
                 host_cache_blocks: int = 0,
                 offload_fn: Optional[Callable[[int], object]] = None,
                 onboard_fn: Optional[Callable[[int, object], None]] = None,
                 secondary_offload_min_priority: int = 0,
                 disk_store=None):
        if tokens_per_block <= 0:
            raise ValueError("tokens_per_block must be positive")
        self.num_blocks = num_blocks
        self.tokens_per_block = tokens_per_block
        self.max_seq_len = max_seq_len
        self.enable_block_reuse = enable_block_reuse
        self.sink_token_length = sink_token_length
        # host secondary tier
        self.host_cache_blocks = host_cache_blocks
        self._offload_fn = offload_fn
        self._onboard_fn = onboard_fn
        self.secondary_offload_min_priority = secondary_offload_min_priority
        self._host_lru: "OrderedDict[RadixNode, None]" = OrderedDict()
        # tertiary tier (runtime/kv_tiers.py DiskKvStore; reference:
        # kv_cache_manager_v2/_storage_manager.py CacheTier.DISK): host
        # LRU victims demote to disk instead of dropping
        self._disk = disk_store

        self._blocks = [Block(i) for i in range(num_blocks)]
        self._free: List[int] = list(range(num_blocks - 1, -1, -1))  # LIFO
        # reusable tree-attached blocks with ref 0:
        # priority -> OrderedDict[block_id, None] (LRU order)
        self._reusable: Dict[int, OrderedDict] = {}
        self._num_reusable = 0
        self._root = RadixNode()
        self._lru_clock = 0

        self._seq_blocks: Dict[int, List[Block]] = {}
        self._req_priority: Dict[int, int] = {}
        self._reusable_prio: Dict[int, int] = {}  # block_id -> bucket used

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

    @staticmethod
    def _device_progress(request: LlmRequest) -> int:
        """Allocation follows *device* progress, which runs ahead of the
        host-accepted token count by up to the executor pipeline depth."""
        return max(request.num_total_tokens, request.num_device_tokens)

    def get_needed_blocks_one_step(self, request: LlmRequest) -> int:
        if request.is_context_init_state:
            end = min(request.context_len,
                      request.context_current_position + request.context_chunk_size)
            have = len(self._seq_blocks.get(request.request_id, ()))
            return max(0, self.blocks_for_tokens(end) - have)
        have = len(self._seq_blocks.get(request.request_id, ()))
        return max(0, self.blocks_for_tokens(
            self._device_progress(request) + 1) - have)

    def get_remaining_blocks_to_completion(self, request: LlmRequest) -> int:
        """Worst-case blocks to finish the request (GuaranteedNoEvict
        policy; reference: capacityScheduler.h:109)."""
        total = request.prompt_len + request.max_new_tokens
        have = len(self._seq_blocks.get(request.request_id, ()))
        return max(0, self.blocks_for_tokens(total) - have)

    # ------------------------------------------------------------------ #
    # Allocation API
    # ------------------------------------------------------------------ #
    def add_sequence(self, request: LlmRequest,
                     enable_reuse: Optional[bool] = None) -> int:
        """Claim blocks for a new context-phase sequence with
        longest-prefix reuse over full blocks (all but the final token —
        its KV must be recomputed for logits; kvCacheManager.cpp
        loadOrAllocateBlocks). Offloaded host blocks re-onboard."""
        rid = request.request_id
        if rid in self._seq_blocks:
            raise ValueError(f"request {rid} already has KV blocks")
        chain: List[Block] = []
        reused_tokens = 0
        reuse = self.enable_block_reuse if enable_reuse is None else enable_reuse
        if reuse:
            node = self._root
            matchable = request.context_len - 1
            pos = 0
            while matchable - pos >= self.tokens_per_block:
                key = self._make_key(request, pos)
                child = node.children.get(key)
                if child is None:
                    break
                block = self._claim_node(child)
                if block is None:
                    break  # onboard failed (no capacity)
                chain.append(block)
                pos += self.tokens_per_block
                node = child
            reused_tokens = pos

        total_needed = self.blocks_for_tokens(request.context_len)
        new_needed = total_needed - len(chain)
        if new_needed > self.free_block_count:
            for b in chain:
                self._release_block(b)
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

    def add_token(self, request: LlmRequest) -> None:
        self._grow(request, self._device_progress(request) + 1)

    def add_tokens(self, request: LlmRequest, num_tokens: int) -> None:
        """Pre-allocate pages for a multi-step decode window (the device
        writes KV for up to ``num_tokens`` positions before the host sees
        the results)."""
        self._grow(request, self._device_progress(request) + num_tokens)

    def add_draft_tokens(self, request: LlmRequest, num_draft: int) -> None:
        self._grow(request, self._device_progress(request) + 1 + num_draft)

    def _grow(self, request: LlmRequest, total_tokens: int) -> None:
        chain = self._seq_blocks[request.request_id]
        needed = self.blocks_for_tokens(total_tokens)
        while len(chain) < needed:
            chain.append(self._allocate_block())
            self._stats.alloc_new_blocks += 1
            self._stats.alloc_total_blocks += 1
        request.kv_block_ids = [b.block_id for b in chain]

    def free_resources(self, request: LlmRequest,
                       store_for_reuse: Optional[bool] = None) -> None:
        """Release a sequence's blocks; optionally attach them to the
        reuse tree keyed by the tokens they hold."""
        rid = request.request_id
        chain = self._seq_blocks.pop(rid, None)
        if chain is None:
            return
        store = self.enable_block_reuse if store_for_reuse is None else store_for_reuse
        tokens = request.all_token_ids
        node: Optional[RadixNode] = self._root
        stored_hashes: List[int] = []
        phash: Optional[int] = None   # chained stable hash of the prefix
        for i, block in enumerate(chain):
            start = i * self.tokens_per_block
            full = start + self.tokens_per_block <= len(tokens)
            if store and full and node is not None and block.node is None:
                blk_tokens = tuple(
                    tokens[start:start + self.tokens_per_block])
                key = BlockKey(
                    tokens=blk_tokens,
                    lora_task_id=request.lora_task_id,
                    cache_salt=request.cache_salt)
                phash = stable_block_hash(blk_tokens, phash,
                                          request.lora_task_id,
                                          request.cache_salt)
                existing = node.children.get(key)
                if existing is not None:
                    # duplicate content: keep the existing node
                    self._release_block(block)
                    node = existing
                    continue
                child = RadixNode(key, node)
                child.block = block
                child.content_hash = phash
                child.priority = self._req_priority.get(
                    rid, DEFAULT_PRIORITY)
                block.node = child
                node.children[key] = child
                stored_hashes.append(phash)
                node = child
                self._release_block(block)
            elif block.node is not None:
                node = block.node
                phash = node.content_hash
                self._release_block(block)
            else:
                node = None  # chain broken: deeper blocks cannot attach
                self._release_block(block)
        if stored_hashes:
            self._push_event("stored", stored_hashes)
        request.kv_block_ids = []

    def rewind_tokens(self, request: LlmRequest, num_tokens: int) -> None:
        """Drop KV for the last ``num_tokens`` (speculative rejection)."""
        chain = self._seq_blocks[request.request_id]
        needed = self.blocks_for_tokens(
            max(1, request.num_total_tokens - num_tokens))
        while len(chain) > needed:
            self._release_block(chain.pop())
        request.kv_block_ids = [b.block_id for b in chain]

    def update_priority(self, request: LlmRequest, priority: int) -> None:
        """Retention priority (KvCacheRetentionConfig semantics): applied
        to tree nodes now and remembered for blocks stored at free time."""
        self._req_priority[request.request_id] = priority
        for b in self._seq_blocks.get(request.request_id, ()):
            if b.node is not None:
                b.node.priority = priority

    # ------------------------------------------------------------------ #
    # Stats / events
    # ------------------------------------------------------------------ #
    def get_stats(self) -> KvCacheStats:
        s = self._stats
        s.free_blocks = self.free_block_count
        s.used_blocks = self.num_blocks - s.free_blocks
        s.reusable_blocks = self._num_reusable
        s.host_blocks = len(self._host_lru)
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
            tokens=tuple(request.context_token_ids[start:start + self.tokens_per_block]),
            lora_task_id=request.lora_task_id,
            cache_salt=request.cache_salt)

    def _claim_node(self, node: RadixNode) -> Optional[Block]:
        """Take a reference on a matched node's block, onboarding from the
        host tier if necessary. Returns None if onboarding is impossible."""
        if node.block is not None:
            if node.block.ref_count == 0:
                self._reusable_remove(node.block, node)
            node.block.ref_count += 1
            return node.block
        if node.host_data is not None and self._onboard_fn is not None:
            try:
                block = self._allocate_block()
            except NoFreeBlocksError:
                return None
            self._onboard_fn(block.block_id, node.host_data)
            self._host_lru.pop(node, None)
            node.host_data = None
            node.block = block
            block.node = node
            self._stats.onboarded_blocks += 1
            return block
        dkey = getattr(node, "disk_key", None)
        if dkey is not None and self._disk is not None \
                and self._onboard_fn is not None:
            data = self._disk.get(dkey)
            if data is None:
                node.disk_key = None
                return None
            try:
                block = self._allocate_block()
            except NoFreeBlocksError:
                return None
            # disk -> device promotion (skips the host tier on a hit)
            self._onboard_fn(block.block_id, data)
            self._disk.drop(dkey)
            node.disk_key = None
            node.block = block
            block.node = node
            self._stats.onboarded_blocks += 1
            self._stats.disk_onboarded_blocks += 1
            return block
        return None

    def _release_block(self, block: Block) -> None:
        block.ref_count -= 1
        if block.ref_count < 0:
            raise AssertionError(f"double free of block {block.block_id}")
        if block.ref_count == 0:
            if block.node is not None:
                self._reusable_add(block, block.node)
            else:
                self._free.append(block.block_id)

    def _allocate_block(self) -> Block:
        if self._free:
            block = self._blocks[self._free.pop()]
        else:
            block = self._evict_one()
        block.ref_count = 1
        return block

    def _evict_one(self) -> Block:
        """Evict the lowest-priority LRU *leaf* reusable block; offload to
        the host tier when configured (evictionPolicy.h:71-125)."""
        def primary_below(n: RadixNode) -> bool:
            return any(c.block is not None or primary_below(c)
                       for c in n.children.values())

        for priority in sorted(self._reusable):
            bucket = self._reusable[priority]
            for block_id in bucket:
                block = self._blocks[block_id]
                node = block.node
                # evictable = deepest primary block on its path (children
                # may remain as host-tier/offloaded descendants)
                if node is not None and not primary_below(node):
                    self._reusable_remove(block, node)
                    if (self._offload_fn is not None
                            and self.host_cache_blocks > 0
                            and node.priority >=
                            self.secondary_offload_min_priority):
                        self._offload_node(node)
                    else:
                        self._push_event("removed", [
                            node.content_hash if node.content_hash
                            is not None else hash(node.key)])
                        parent = node.parent
                        node.detach()
                        self._maybe_prune(parent)
                    block.node = None
                    return block
        raise NoFreeBlocksError("no free or evictable KV blocks")

    def _offload_node(self, node: RadixNode) -> None:
        node.host_data = self._offload_fn(node.block.block_id)
        node.block = None
        self._host_lru[node] = None
        self._stats.offloaded_blocks += 1
        self._push_event("offloaded", [
            node.content_hash if node.content_hash is not None
            else hash(node.key)])
        while len(self._host_lru) > self.host_cache_blocks:
            victim, _ = self._host_lru.popitem(last=False)
            if self._disk is not None:
                # demote host -> disk (async copy engine; the executor
                # loop never blocks on the write)
                victim.disk_key = self._disk.put(victim.host_data)
                victim.host_data = None
                self._stats.disk_blocks += 1
                self._push_event("demoted_disk", [
                    victim.content_hash if victim.content_hash
                    is not None else hash(victim.key)])
            # only detach subtree-safe (leaf) victims; non-leaves wait
            elif victim.is_leaf:
                victim.detach()
            else:
                victim.host_data = None

    def _maybe_prune(self, node: Optional[RadixNode]) -> None:
        """Remove dataless interior nodes that became childless."""
        while (node is not None and node is not self._root and node.is_leaf
               and node.block is None and node.host_data is None
               and getattr(node, "disk_key", None) is None):
            parent = node.parent
            node.detach()
            node = parent

    def _reusable_add(self, block: Block, node: RadixNode) -> None:
        self._lru_clock += 1
        node._lru_tick = self._lru_clock
        self._reusable.setdefault(node.priority, OrderedDict())[
            block.block_id] = None
        self._reusable_prio[block.block_id] = node.priority
        self._num_reusable += 1

    def _reusable_remove(self, block: Block, node: RadixNode) -> None:
        prio = self._reusable_prio.pop(block.block_id, node.priority)
        bucket = self._reusable.get(prio)
        if bucket is not None and block.block_id in bucket:
            del bucket[block.block_id]
            if not bucket:
                del self._reusable[prio]
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


class _TrimmedBlock:
    """Placeholder for a sliding-window-evicted block: the page id stays
    in the sequence's table (kernels mask those positions anyway) but
    the physical block has returned to the free pool."""
    __slots__ = ("block_id",)

    def __init__(self, block_id: int):
        self.block_id = block_id


# ------------------------------------------------------------------- #
# VSWA: sliding-window eviction + dual-pool facade
# (reference: resource_manager.py:1878 — per-window KV pools;
#  kvCacheManager window-block eviction)
# ------------------------------------------------------------------- #
def _trim_prefix(mgr: "KVCacheManager", request, keep_from_block: int
                 ) -> int:
    """Release chain blocks fully below ``keep_from_block`` back to the
    free pool while leaving their ids in request.kv_block_ids (the page
    table stays absolutely indexed; evicted entries are stale-but-valid
    pool indices whose contents attention masks out)."""
    chain = mgr._seq_blocks.get(request.request_id)
    if chain is None:
        return 0
    freed = 0
    for i in range(min(keep_from_block, len(chain))):
        b = chain[i]
        if isinstance(b, _TrimmedBlock):
            continue
        mgr._release_block(b)
        chain[i] = _TrimmedBlock(b.block_id)
        freed += 1
    return freed


KVCacheManager.trim_prefix = _trim_prefix


_orig_free = KVCacheManager.free_resources


def _free_resources_vswa(self, request, store_for_reuse=None):
    chain = self._seq_blocks.get(request.request_id)
    if chain is not None and any(isinstance(b, _TrimmedBlock)
                                 for b in chain):
        # trimmed chains never re-enter the reuse tree (their prefix
        # content is gone); release remaining real blocks directly
        self._seq_blocks.pop(request.request_id, None)
        for b in chain:
            if not isinstance(b, _TrimmedBlock):
                self._release_block(b)
        request.kv_block_ids = []
        return
    return _orig_free(self, request, store_for_reuse)


KVCacheManager.free_resources = _free_resources_vswa


class _SwRequestView:
    """Adapter letting the sliding-pool manager keep its own block list
    on the same request (kv_block_ids -> kv_block_ids_sw)."""

    def __init__(self, req):
        object.__setattr__(self, "_req", req)

    def __getattr__(self, name):
        if name == "kv_block_ids":
            return self._req.kv_block_ids_sw
        return getattr(self._req, name)

    def __setattr__(self, name, value):
        if name == "kv_block_ids":
            self._req.kv_block_ids_sw = value
        elif name == "num_cached_tokens":
            pass                      # reuse stats belong to the global pool
        else:
            setattr(self._req, name, value)


class VswaKvManager:
    """Dual-pool facade: full-attention layers allocate from the global
    manager, sliding layers from a small pool whose out-of-window blocks
    are evicted block-granularly every growth step. Unknown attributes
    delegate to the global manager (scheduler capacity math, events,
    stats all key off the dominant pool)."""

    def __init__(self, global_mgr: KVCacheManager,
                 sliding_mgr: KVCacheManager, window: int):
        self.g = global_mgr
        self.s = sliding_mgr
        self.window = window
        self.tokens_per_block = global_mgr.tokens_per_block

    def __getattr__(self, name):
        return getattr(self.g, name)

    # -- allocation ----------------------------------------------------- #
    def _view(self, req):
        if not hasattr(req, "kv_block_ids_sw"):
            req.kv_block_ids_sw = []
        return _SwRequestView(req)

    def _trim(self, req):
        total = max(req.num_total_tokens, req.num_device_tokens)
        keep_from = max(0, (total - self.window - 1)
                        // self.tokens_per_block)
        self.s.trim_prefix(self._view(req), keep_from)

    def add_sequence(self, req, enable_reuse=None):
        # prefix reuse is off for VSWA: a globally-reused prefix has no
        # sliding-pool twin (those positions were never recomputed), so
        # sliding layers would read garbage for in-window history
        reused = self.g.add_sequence(req, enable_reuse=False)
        self.s.add_sequence(self._view(req), enable_reuse=False)
        self._trim(req)
        return reused

    def add_token(self, req):
        self.g.add_token(req)
        self.s.add_token(self._view(req))
        self._trim(req)

    def add_tokens(self, req, num_tokens):
        self.g.add_tokens(req, num_tokens)
        self.s.add_tokens(self._view(req), num_tokens)
        self._trim(req)

    def add_draft_tokens(self, req, num_draft):
        self.g.add_draft_tokens(req, num_draft)
        self.s.add_draft_tokens(self._view(req), num_draft)
        self._trim(req)

    def rewind_tokens(self, req, num_tokens):
        self.g.rewind_tokens(req, num_tokens)
        # sliding chain may have trimmed blocks at the tail boundary;
        # rewind only full untrimmed tail blocks
        self.s.rewind_tokens(self._view(req), num_tokens)

    def free_resources(self, req, store_for_reuse=None):
        self.g.free_resources(req, store_for_reuse=store_for_reuse)
        self.s.free_resources(self._view(req), store_for_reuse=False)

    def get_num_free_blocks(self):
        return self.g.get_num_free_blocks()
