"""Scheduler tests (reference: capacitySchedulerTest.cpp,
microBatchSchedulerTest.cpp semantics)."""
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.runtime.request import LlmRequest, LlmRequestState
from tensorrt_llm_tpu.runtime.scheduler import (CapacityScheduler,
                                                CapacitySchedulerPolicy,
                                                ContextChunkingPolicy,
                                                MicroBatchScheduler,
                                                RequestScheduler)
from tensorrt_llm_tpu.sampling_params import SamplingParams


def make_req(n_prompt, max_tokens=8):
    return LlmRequest(prompt_token_ids=list(range(n_prompt)),
                      sampling_params=SamplingParams(max_tokens=max_tokens))


def test_no_evict_admission():
    kv = KVCacheManager(num_blocks=8, tokens_per_block=4)
    sched = CapacityScheduler(max_num_requests=8, kv_cache_manager=kv,
                              policy=CapacitySchedulerPolicy.GUARANTEED_NO_EVICT)
    # each req needs ceil((8+8)/4)=4 blocks to complete → only 2 fit in 8
    reqs = [make_req(8, 8) for _ in range(4)]
    fitting, paused = sched.schedule(reqs)
    assert len(fitting) == 2
    assert not paused


def test_no_evict_prioritizes_running():
    kv = KVCacheManager(num_blocks=8, tokens_per_block=4)
    sched = CapacityScheduler(max_num_requests=8, kv_cache_manager=kv,
                              policy=CapacitySchedulerPolicy.GUARANTEED_NO_EVICT)
    running = make_req(8, 8)
    kv.add_sequence(running)
    running.state = LlmRequestState.GENERATION_IN_PROGRESS
    new = [make_req(8, 8) for _ in range(3)]
    fitting, _ = sched.schedule(new + [running])  # running listed last
    assert running in fitting


def test_max_utilization_admits_more():
    kv = KVCacheManager(num_blocks=8, tokens_per_block=4)
    sched = CapacityScheduler(max_num_requests=8, kv_cache_manager=kv,
                              policy=CapacitySchedulerPolicy.MAX_UTILIZATION)
    reqs = [make_req(8, 8) for _ in range(4)]
    fitting, _ = sched.schedule(reqs)
    # one-step need = 2 blocks each → all 4 fit under max-util
    assert len(fitting) == 4


def test_max_batch_size_cap():
    sched = CapacityScheduler(max_num_requests=2, kv_cache_manager=None)
    reqs = [make_req(4) for _ in range(5)]
    fitting, _ = sched.schedule(reqs)
    assert len(fitting) == 2


def test_micro_batch_token_budget_chunks_context():
    micro = MicroBatchScheduler(max_batch_size=8, max_num_tokens=64,
                                enable_chunked_prefill=True,
                                chunk_unit_size=16)
    reqs = [make_req(100), make_req(100)]
    out = micro.schedule(reqs)
    assert len(out.context_requests) >= 1
    total = sum(r.context_chunk_size for r in out.context_requests)
    assert total <= 64
    assert all(r.context_chunk_size % 16 == 0 or
               r.context_chunk_size == r.prompt_len
               for r in out.context_requests)


def test_micro_batch_no_chunking_skips_oversized():
    micro = MicroBatchScheduler(max_batch_size=8, max_num_tokens=64,
                                enable_chunked_prefill=False)
    out = micro.schedule([make_req(100), make_req(32)])
    scheduled = [r.prompt_len for r in out.context_requests]
    assert scheduled == [32]


def test_generation_requests_take_priority():
    micro = MicroBatchScheduler(max_batch_size=4, max_num_tokens=32,
                                chunk_unit_size=16)
    gen = make_req(8)
    gen.state = LlmRequestState.GENERATION_IN_PROGRESS
    ctx = make_req(100)
    out = micro.schedule([ctx, gen])
    assert gen in out.generation_requests
    assert sum(r.context_chunk_size for r in out.context_requests) <= 31


def test_equal_progress_chunking():
    micro = MicroBatchScheduler(
        max_batch_size=8, max_num_tokens=64,
        chunking_policy=ContextChunkingPolicy.EQUAL_PROGRESS,
        chunk_unit_size=16)
    a, b = make_req(100), make_req(100)
    out = micro.schedule([a, b])
    assert len(out.context_requests) == 2
    assert abs(a.context_chunk_size - b.context_chunk_size) <= 16


def test_combined_scheduler():
    kv = KVCacheManager(num_blocks=64, tokens_per_block=4)
    sched = RequestScheduler(
        CapacityScheduler(8, kv),
        MicroBatchScheduler(max_batch_size=8, max_num_tokens=128))
    reqs = [make_req(16) for _ in range(3)]
    out = sched.schedule(reqs)
    assert len(out.context_requests) == 3
    assert out.batch_size == 3
