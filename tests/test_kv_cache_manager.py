"""Unit tests for the paged KV block manager (semantics mirror the
reference C++ tests cpp/tests/unit_tests/batch_manager/kvCacheManagerTest,
radixBlockTreeTest, evictionPolicyTest)."""
import pytest

from tensorrt_llm_tpu.runtime.kv_cache_manager import (KVCacheManager,
                                                       NoFreeBlocksError)
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.sampling_params import SamplingParams


def make_req(tokens, max_tokens=8, **kw):
    return LlmRequest(prompt_token_ids=list(tokens),
                      sampling_params=SamplingParams(max_tokens=max_tokens),
                      **kw)


def test_basic_allocation():
    kv = KVCacheManager(num_blocks=16, tokens_per_block=4)
    req = make_req(range(10))
    reused = kv.add_sequence(req)
    assert reused == 0
    assert len(req.kv_block_ids) == 3  # ceil(10/4)
    assert kv.get_num_free_blocks() == 13
    kv.free_resources(req, store_for_reuse=False)
    assert kv.get_num_free_blocks() == 16


def test_add_token_allocates_on_boundary():
    kv = KVCacheManager(num_blocks=16, tokens_per_block=4)
    req = make_req(range(8))
    kv.add_sequence(req)
    assert len(req.kv_block_ids) == 2
    req.output_token_ids = [1]      # total 9 → needs 3 blocks for +1
    kv.add_token(req)
    assert len(req.kv_block_ids) == 3
    req.output_token_ids = [1, 2]   # total 10 → +1 = 11 still 3 blocks
    kv.add_token(req)
    assert len(req.kv_block_ids) == 3


def test_prefix_reuse():
    kv = KVCacheManager(num_blocks=32, tokens_per_block=4)
    a = make_req(list(range(12)))
    kv.add_sequence(a)
    a_blocks = list(a.kv_block_ids)
    a.output_token_ids = [100, 101]
    kv.free_resources(a)  # stores blocks in radix tree

    # same first 8 tokens, different tail: full blocks 0-1 reusable
    b = make_req(list(range(8)) + [99, 98, 97, 96])
    reused = kv.add_sequence(b)
    assert reused == 8
    assert b.num_cached_tokens == 8
    assert b.kv_block_ids[:2] == a_blocks[:2]
    stats = kv.get_stats()
    assert stats.reused_blocks == 2


def test_reuse_excludes_last_token():
    """The final prompt token's KV must be recomputed for logits."""
    kv = KVCacheManager(num_blocks=32, tokens_per_block=4)
    a = make_req(list(range(8)))
    kv.add_sequence(a)
    kv.free_resources(a)
    b = make_req(list(range(8)))  # identical prompt
    reused = kv.add_sequence(b)
    assert reused == 4  # only block 0: block 1 holds the last token


def test_reuse_respects_salt_and_lora():
    kv = KVCacheManager(num_blocks=32, tokens_per_block=4)
    a = make_req(list(range(12)), cache_salt="tenant-a")
    kv.add_sequence(a)
    kv.free_resources(a)
    b = make_req(list(range(12)), cache_salt="tenant-b")
    assert kv.add_sequence(b) == 0
    c = make_req(list(range(12)), cache_salt="tenant-a")
    assert kv.add_sequence(c) == 8


def test_ref_counted_sharing():
    kv = KVCacheManager(num_blocks=32, tokens_per_block=4)
    a = make_req(list(range(12)))
    kv.add_sequence(a)
    kv.free_resources(a)
    b = make_req(list(range(12)))
    c = make_req(list(range(12)))
    kv.add_sequence(b)
    kv.add_sequence(c)
    assert b.kv_block_ids[:2] == c.kv_block_ids[:2]  # shared prefix
    assert b.kv_block_ids[2] != c.kv_block_ids[2]    # private last block
    kv.free_resources(b)
    kv.free_resources(c)


def test_eviction_lru_leaf_only():
    kv = KVCacheManager(num_blocks=4, tokens_per_block=4)
    a = make_req(list(range(8)))   # 2 blocks: [parent, leaf]
    kv.add_sequence(a)
    kv.free_resources(a)
    assert kv.get_num_free_blocks() == 4  # 2 free + 2 reusable
    # allocate 4 blocks: must evict leaf before parent
    b = make_req(list(range(100, 116)))  # 16 tokens → 4 blocks
    kv.add_sequence(b)
    assert len(b.kv_block_ids) == 4
    assert kv.get_num_free_blocks() == 0


def test_eviction_priority_order():
    kv = KVCacheManager(num_blocks=6, tokens_per_block=4)
    low = make_req(list(range(8)))
    kv.add_sequence(low)
    kv.update_priority(low, 10)
    kv.free_resources(low)
    high = make_req(list(range(50, 58)))
    kv.add_sequence(high)
    kv.update_priority(high, 90)
    kv.free_resources(high)
    # two free blocks + 4 reusable; allocate 3 → takes 2 free + evicts
    # the low-priority leaf first
    c = make_req(list(range(200, 212)))
    kv.add_sequence(c)
    # high-priority chain should still be matchable
    d = make_req(list(range(50, 62)))
    assert kv.add_sequence(d) >= 4


def test_out_of_blocks_raises():
    kv = KVCacheManager(num_blocks=2, tokens_per_block=4)
    a = make_req(list(range(8)))
    kv.add_sequence(a)
    b = make_req(list(range(100, 108)))
    with pytest.raises(NoFreeBlocksError):
        kv.add_sequence(b)


def test_rewind_frees_tail_blocks():
    kv = KVCacheManager(num_blocks=8, tokens_per_block=4)
    req = make_req(list(range(8)))
    kv.add_sequence(req)
    req.output_token_ids = list(range(5))  # total 13 → 4 blocks
    kv.add_token(req)
    kv.add_draft_tokens(req, 3)
    n_before = len(req.kv_block_ids)
    req.output_token_ids = req.output_token_ids[:1]  # rejected drafts
    kv.rewind_tokens(req, 4)
    assert len(req.kv_block_ids) <= n_before


def test_events_stream():
    kv = KVCacheManager(num_blocks=8, tokens_per_block=4,
                        event_buffer_max_size=100)
    a = make_req(list(range(8)))
    kv.add_sequence(a)
    kv.free_resources(a)
    events = kv.get_latest_events()
    assert any(e.kind == "stored" for e in events)


def test_needed_blocks_calculations():
    kv = KVCacheManager(num_blocks=100, tokens_per_block=4)
    req = make_req(list(range(10)), max_tokens=6)
    # full completion: 16 tokens → 4 blocks
    assert kv.get_remaining_blocks_to_completion(req) == 4
    kv.add_sequence(req)
    assert kv.get_remaining_blocks_to_completion(req) == 1  # 3 held
