"""Unified three-tier KV paging: device -> host -> disk demotion with
direct disk -> device promotion on prefix match (reference:
runtime/kv_cache_manager_v2/_storage_manager.py CacheTier hierarchy +
_copy_engine.py async transfers)."""
import numpy as np
import pytest

from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.runtime.kv_tiers import DiskKvStore
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.sampling_params import SamplingParams


def make_req(tokens, max_tokens=4):
    return LlmRequest(prompt_token_ids=list(tokens),
                      sampling_params=SamplingParams(max_tokens=max_tokens))


class FakeDevice:
    def __init__(self, n):
        self.pages = {i: np.zeros(4) for i in range(n)}

    def write(self, bid, content):
        self.pages[bid] = np.asarray(content, float)

    def offload(self, bid):
        return self.pages[bid].copy()

    def onboard(self, bid, data):
        self.pages[bid] = np.asarray(data, float)


def test_disk_store_roundtrip(tmp_path):
    store = DiskKvStore(str(tmp_path), max_blocks=2)
    k1 = store.put(np.arange(8.0))
    np.testing.assert_allclose(store.get(k1), np.arange(8.0))
    k2 = store.put(np.ones(4))
    k3 = store.put(np.zeros(4))   # LRU-evicts k1 (capacity 2)
    store._writer.shutdown(wait=True)
    assert store.get(k1) is None
    np.testing.assert_allclose(store.get(k2), np.ones(4))
    np.testing.assert_allclose(store.get(k3), np.zeros(4))
    assert len(store) == 2


def test_three_tier_demotion_and_promotion(tmp_path):
    """Fill the device pool, overflow the host tier into disk, then hit
    the prefix: the block promotes disk -> device with its bytes
    intact."""
    dev = FakeDevice(4)
    store = DiskKvStore(str(tmp_path), max_blocks=8)
    mgr = KVCacheManager(num_blocks=4, tokens_per_block=4,
                         host_cache_blocks=1,
                         offload_fn=dev.offload, onboard_fn=dev.onboard,
                         disk_store=store)
    # three distinct 1-block-reusable sequences (5 tokens: one full
    # matchable block each); device pool forces evictions
    prompts = [[i, i, i, i, i + 10] for i in (1, 2, 3)]
    for i, ptoks in enumerate(prompts):
        r = make_req(ptoks)
        mgr.add_sequence(r)
        # distinct page contents so promotion is verifiable
        dev.write(r.kv_block_ids[0], np.full(4, float(i + 1)))
        r.num_device_tokens = len(ptoks)
        mgr.free_resources(r, store_for_reuse=True)
    # force evictions: allocate all 4 blocks for a non-reusable request
    big = make_req(list(range(40, 53)), max_tokens=2)
    mgr.add_sequence(big, enable_reuse=False)
    # all three reusable blocks were evicted: 1 in host LRU, rest disk
    assert mgr.get_stats().disk_blocks >= 1
    mgr.free_resources(big, store_for_reuse=False)
    # prefix hit on sequence 0 (the oldest -> demoted to disk)
    r2 = make_req(prompts[0])
    reused = mgr.add_sequence(r2)
    assert reused == 4
    np.testing.assert_allclose(dev.pages[r2.kv_block_ids[0]],
                               np.full(4, 1.0))
    assert mgr.get_stats().disk_onboarded_blocks >= 1


def test_e2e_disk_tier_prefix_reuse(tmp_path):
    """Through the LLM API: a long shared prefix survives device+host
    eviction via the disk tier and still reuses (token-identical,
    kv_cache_hit_tokens > 0)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    m = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=m, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=2, max_input_len=96, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(
                  tokens_per_block=16, max_tokens=8 * 16,
                  host_cache_size=1,            # ~1 block of host tier
                  disk_cache_dir=str(tmp_path)))
    prefix = list(range(2, 66))                 # 4 full blocks
    sp = SamplingParams(max_tokens=4, top_k=1)
    first = llm.generate(prefix, sp).outputs[0].token_ids
    # churn the pool with disjoint requests so the prefix evicts
    for i in range(4):
        llm.generate([70 + i] * 40, sp)
    again = llm.generate(prefix, sp)
    assert again.outputs[0].token_ids == first
    stats = llm.kv_cache_manager.get_stats()
    assert stats.disk_blocks >= 1, stats
    assert again._result.request.perf.kv_cache_hit_tokens > 0
    llm.shutdown()


def test_disk_tier_byte_capacity_and_priority_eviction(tmp_path):
    """Eviction-controller semantics (reference: _eviction_controller/):
    byte-capacity eviction removes lowest-retention-priority first,
    ties oldest-first."""
    from tensorrt_llm_tpu.runtime.kv_tiers import DiskKvStore
    blk = np.ones((4, 1024), np.float32)           # 16KB each
    st = DiskKvStore(str(tmp_path / "d"), max_bytes=3 * blk.nbytes + 1)
    k_low = st.put(blk, priority=10)
    k_hi1 = st.put(blk * 2, priority=80)
    k_hi2 = st.put(blk * 3, priority=80)
    k_new = st.put(blk * 4, priority=50)           # over budget now
    st.shutdown()
    assert st.get(k_low) is None                   # lowest priority went
    assert st.stats.evictions == 1
    for k, mul in ((k_hi1, 2), (k_hi2, 3), (k_new, 4)):
        got = st.get(k)
        assert got is not None and got[0, 0] == mul


def test_disk_tier_write_backpressure(tmp_path):
    """Copy-engine bandwidth management: past the in-flight budget,
    demotions are dropped (counted) instead of queueing unboundedly."""
    from tensorrt_llm_tpu.runtime.kv_tiers import DiskKvStore
    blk = np.ones((1024, 256), np.float32)         # 1MB
    st = DiskKvStore(str(tmp_path / "d"),
                     max_inflight_bytes=2 * blk.nbytes + 1)
    keys = [st.put(blk) for _ in range(8)]
    dropped = sum(k is None for k in keys)
    st.shutdown()
    assert st.stats.put_drops == dropped
    # at least the admitted ones read back
    for k in keys:
        if k is not None:
            assert st.get(k) is not None


def test_disk_tier_stats_and_get_many(tmp_path):
    from tensorrt_llm_tpu.runtime.kv_tiers import DiskKvStore
    st = DiskKvStore(str(tmp_path / "d"))
    ks = [st.put(np.full((8,), i, np.int32)) for i in range(4)]
    outs = st.get_many(ks + ["missing"])
    assert [o[0] for o in outs[:4]] == [0, 1, 2, 3]
    assert outs[4] is None
    d = st.stats.as_dict()
    assert d["puts"] == 4 and d["hits"] == 4 and d["misses"] >= 1
    assert d["bytes_stored"] == 4 * 32
    st.shutdown()
