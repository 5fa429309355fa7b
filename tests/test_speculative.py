"""Speculative decoding tests: NGram drafter unit tests + e2e
equivalence (greedy spec decode must be lossless — reference gsm8k.yaml
lists NGram/Eagle at parity with the base model)."""
import pytest

from tensorrt_llm_tpu import SamplingParams
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.speculative.ngram import NGramDrafter


def make_req(prompt, outputs=()):
    r = LlmRequest(prompt_token_ids=list(prompt),
                   sampling_params=SamplingParams(max_tokens=32))
    r.output_token_ids = list(outputs)
    return r


def test_ngram_draft_from_prompt():
    # prompt contains "7 8 9 10" and generation just emitted "7 8"
    req = make_req([1, 2, 7, 8, 9, 10, 3], [5, 7, 8])
    d = NGramDrafter(max_draft_len=2, max_matching_ngram_size=3)
    d.prepare_draft_tokens([req])
    assert req.draft_tokens == [9, 10]


def test_ngram_prefers_longest_match():
    # "2 3" occurs twice: after first → 99; the trigram "1 2 3" → 50
    req = make_req([1, 2, 3, 50, 9, 2, 3, 99, 1, 2, 3])
    d = NGramDrafter(max_draft_len=1, max_matching_ngram_size=4)
    d.prepare_draft_tokens([req])
    assert req.draft_tokens == [50]


def test_ngram_no_match():
    req = make_req([1, 2, 3, 4])
    d = NGramDrafter(max_draft_len=4)
    d.prepare_draft_tokens([req])
    assert req.draft_tokens == []


@pytest.fixture(scope="module")
def repeat_model():
    """Tiny llama; greedy outputs with repetitive structure so ngram
    drafting actually accepts tokens."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(3)
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def test_e2e_ngram_lossless(repeat_model):
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3], [11] * 12]
    sp = SamplingParams(max_tokens=16, top_k=1)

    base = LLM(model=repeat_model, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=8, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()

    spec = LLM(model=repeat_model, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=8, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               speculative_config=SpeculativeConfig(mode="NGRAM",
                                                    max_draft_len=3),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref
