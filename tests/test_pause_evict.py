"""MAX_UTILIZATION pause/evict-under-pressure and penalty slot isolation
(reference semantics: capacityScheduler.cpp MaxUtilizationScheduler +
PauseRequests; penaltyKernels.cu per-sequence state)."""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.llmapi.llm_args import SchedulerConfig
from tensorrt_llm_tpu.runtime.scheduler import CapacitySchedulerPolicy


def _tiny_model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def hf_greedy(tmodel, prompt, n):
    import torch
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n):
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


@pytest.fixture(scope="module")
def pressured_llm():
    tmodel = _tiny_model()
    # KV pool of 12 blocks x 8 tokens = 96 tokens for up to 4 sequences
    # that each want 16 prompt + 32 output = 48 tokens (24 blocks total
    # demand): MAX_UTILIZATION must over-admit and then pause under
    # pressure.
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=128,
              scheduler_config=SchedulerConfig(
                  capacity_scheduler_policy=
                  CapacitySchedulerPolicy.MAX_UTILIZATION),
              kv_cache_config=KvCacheConfig(tokens_per_block=8,
                                            max_tokens=96))
    yield llm, tmodel
    llm.shutdown()


def test_pause_resume_under_pressure(pressured_llm):
    """Four requests whose combined KV demand exceeds the pool: the
    executor must pause the tail, let the head finish, resume, and still
    produce exactly the single-request greedy tokens for every request."""
    llm, tmodel = pressured_llm
    prompts = [[i + 1] * 16 for i in range(4)]
    outs = llm.generate(prompts, SamplingParams(max_tokens=32, top_k=1))
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == hf_greedy(tmodel, p, 32), \
            "paused/resumed request diverged from baseline greedy"


def test_penalty_state_isolated_across_slot_reuse(pressured_llm):
    """A finished request's token history must not bleed into the next
    occupant of its sequence slot (ADVICE r1: counts read by batch row
    and never reset on slot recycle)."""
    llm, tmodel = pressured_llm
    sp = SamplingParams(max_tokens=12, top_k=1, repetition_penalty=1.5)
    # run one request to populate token_counts for its slot
    first = llm.generate([[7] * 10], sp)[0].outputs[0].token_ids
    # run again with identical input: same slot is recycled; with stale
    # counts the penalties differ and the tokens diverge
    second = llm.generate([[7] * 10], sp)[0].outputs[0].token_ids
    assert first == second, "slot reuse leaked penalty state"
