"""Scaffolding controllers (best-of-N, majority vote) over a tiny LLM."""
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.scaffolding import (BestOfNController,
                                          MajorityVoteController,
                                          ScaffoldingLlm)


@pytest.fixture(scope="module")
def llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    llm = LLM(model=LlamaForCausalLM(cfg).eval(), skip_tokenizer_init=True,
              dtype="float32", max_batch_size=8, max_input_len=64,
              max_seq_len=128, max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    yield llm
    llm.shutdown()


def test_best_of_n(llm):
    ctrl = BestOfNController(n=3, reward_fn=lambda s: -len(s))
    s = ScaffoldingLlm(llm, ctrl)
    res = s.generate([5, 9, 23], SamplingParams(max_tokens=8))
    assert len(res.candidates) == 3
    assert res.best in res.candidates
    assert res.scores is not None
    # reward_fn prefers the shortest
    assert len(res.best) == min(len(c) for c in res.candidates)


def test_majority_vote(llm):
    ctrl = MajorityVoteController(n=4, extract_fn=lambda t: t.split()[-1]
                                  if t.split() else t)
    s = ScaffoldingLlm(llm, ctrl)
    res = s.generate([3, 7, 11], SamplingParams(max_tokens=6))
    assert len(res.candidates) == 4
    assert res.best in res.candidates
