"""Scheduler v2 pieces: waiting queues, ADP router, admission wiring
(reference: scheduler/waiting_queue.py, scheduler/adp_router.py,
scheduler_v2.py)."""
import pytest

from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.sampling_params import SamplingParams


def _req(rid=None, prompt=None, priority=0.5, max_tokens=8):
    r = LlmRequest(prompt_token_ids=prompt or [1, 2, 3],
                   sampling_params=SamplingParams(max_tokens=max_tokens))
    r.priority = priority
    return r


# --------------------------------------------------------------------- #
# Waiting queues
# --------------------------------------------------------------------- #
def test_fcfs_order_and_prepend():
    from tensorrt_llm_tpu.runtime.waiting_queue import FCFSWaitingQueue
    q = FCFSWaitingQueue()
    a, b, c = _req(), _req(), _req()
    q.add_requests([a, b, c])
    first = q.pop_request()
    assert first is a
    q.prepend_request(first)          # deferred: keeps its turn
    assert q.pop_request() is a
    assert q.peek_request() is b
    q.remove_by_ids({b.request_id})
    assert q.pop_request() is c
    assert not q


def test_priority_queue_orders_and_is_fifo_within_level():
    from tensorrt_llm_tpu.runtime.waiting_queue import PriorityWaitingQueue
    q = PriorityWaitingQueue()
    lo1, hi, lo2 = _req(priority=0.2), _req(priority=0.9), _req(priority=0.2)
    q.add_requests([lo1, hi, lo2])
    assert q.pop_request() is hi
    assert q.pop_request() is lo1     # FIFO among equals
    # deferred request keeps its arrival rank
    q.prepend_request(lo1)
    assert q.pop_request() is lo1
    assert q.pop_request() is lo2
    assert len(q) == 0


# --------------------------------------------------------------------- #
# ADP router
# --------------------------------------------------------------------- #
def test_default_adp_balances_tokens():
    from tensorrt_llm_tpu.runtime.adp_router import (DefaultADPRouter,
                                                     RankState)
    r = DefaultADPRouter(num_ranks=2)
    reqs = [_req(prompt=[1] * 10, max_tokens=10) for _ in range(4)]
    ranks = r.route_requests(reqs)
    assert sorted(ranks) == [0, 0, 1, 1]          # even split
    assert all(req.dp_rank is not None for req in reqs)
    # a loaded rank repels traffic
    r.update_rank_states([RankState(rank=0, num_active_tokens=10_000),
                          RankState(rank=1, num_active_tokens=0)])
    ranks = r.route_requests([_req(), _req()])
    assert ranks == [1, 1]


def test_rank_state_roundtrip():
    from tensorrt_llm_tpu.runtime.adp_router import RankState
    st = RankState(rank=3, num_active_requests=7, num_active_tokens=123,
                   kv_free_blocks=42)
    assert RankState.deserialize(st.serialize()) == st


def test_kv_aware_adp_prefers_prefix_rank():
    from tensorrt_llm_tpu.runtime.adp_router import KVCacheAwareADPRouter
    r = KVCacheAwareADPRouter(num_ranks=2, load_penalty=0.0)
    shared = list(range(100, 140))
    first = _req(prompt=shared)
    r.route_requests([first])
    again = _req(prompt=shared + [7, 8])
    ranks = r.route_requests([again])
    assert ranks[0] == first.dp_rank      # prefix affinity wins


# --------------------------------------------------------------------- #
# Executor admission wiring
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def tmodel():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def test_priority_admission_e2e(tmodel):
    """With max_active_requests=1 and a priority queue, a high-priority
    late arrival is admitted before earlier low-priority ones."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    from tensorrt_llm_tpu.llmapi.llm_args import SchedulerConfig

    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=2, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              scheduler_config=SchedulerConfig(
                  waiting_queue_policy="priority",
                  max_active_requests=2),
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    sp = SamplingParams(max_tokens=12, top_k=1)
    outs = [llm.generate_async([3 + i] * 6, sp) for i in range(6)]
    results = [o.result(120) for o in outs]
    assert all(len(r.outputs[0].token_ids) == 12 for r in results)
    llm.shutdown()
