"""Host secondary KV tier: offload on eviction, onboard on prefix match
(reference: evictionPolicy.h primary→secondary flow, host_cache_size)."""
import numpy as np
import pytest

from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.sampling_params import SamplingParams


def make_req(tokens, max_tokens=8, **kw):
    return LlmRequest(prompt_token_ids=list(tokens),
                      sampling_params=SamplingParams(max_tokens=max_tokens),
                      **kw)


class FakeDevice:
    """Stands in for the engine's page gather/scatter."""

    def __init__(self, num_blocks):
        self.pages = {i: None for i in range(num_blocks)}

    def write(self, bid, content):
        self.pages[bid] = content

    def offload(self, bid):
        return self.pages[bid]

    def onboard(self, bid, data):
        self.pages[bid] = data


def test_offload_and_onboard_roundtrip():
    dev = FakeDevice(4)
    kv = KVCacheManager(num_blocks=4, tokens_per_block=4,
                        host_cache_blocks=8,
                        offload_fn=dev.offload, onboard_fn=dev.onboard)
    a = make_req(list(range(8)))
    kv.add_sequence(a)
    for bid in a.kv_block_ids:
        dev.write(bid, f"kv-of-{bid}")
    a_blocks = list(a.kv_block_ids)
    kv.free_resources(a)

    # pressure: allocate all 4 blocks → a's 2 stored blocks evict to host
    b = make_req(list(range(100, 116)))
    kv.add_sequence(b)
    assert kv.get_stats().offloaded_blocks >= 1
    for bid in b.kv_block_ids:
        dev.write(bid, f"kv-of-b-{bid}")
    kv.free_resources(b, store_for_reuse=False)

    # re-request a's prefix: blocks onboard from host with original data
    c = make_req(list(range(8)) + [1, 2, 3, 4])
    reused = kv.add_sequence(c)
    assert reused == 8
    assert kv.get_stats().onboarded_blocks >= 2
    restored = [dev.pages[bid] for bid in c.kv_block_ids[:2]]
    assert restored == [f"kv-of-{a_blocks[0]}", f"kv-of-{a_blocks[1]}"]


def test_host_tier_capacity_bound():
    dev = FakeDevice(4)
    kv = KVCacheManager(num_blocks=4, tokens_per_block=4,
                        host_cache_blocks=1,
                        offload_fn=dev.offload, onboard_fn=dev.onboard)
    a = make_req(list(range(8)))
    kv.add_sequence(a)
    for bid in a.kv_block_ids:
        dev.write(bid, bid)
    kv.free_resources(a)
    b = make_req(list(range(50, 66)))
    kv.add_sequence(b)
    assert kv.get_stats().host_blocks <= 1


def test_without_host_tier_still_evicts():
    kv = KVCacheManager(num_blocks=4, tokens_per_block=4)
    a = make_req(list(range(8)))
    kv.add_sequence(a)
    kv.free_resources(a)
    b = make_req(list(range(100, 116)))
    kv.add_sequence(b)
    assert len(b.kv_block_ids) == 4
