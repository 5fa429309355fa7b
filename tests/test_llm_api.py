"""End-to-end LLM API tests with a tiny inline Llama — the minimum
end-to-end slice (SURVEY.md §7 phase 2; reference:
tests/unittest/llmapi/test_llm.py shapes)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def tiny_llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True,
              dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    yield llm, tmodel
    llm.shutdown()


def hf_greedy(tmodel, prompt, n):
    import torch
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n):
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_greedy_matches_hf(tiny_llm):
    llm, tmodel = tiny_llm
    prompt = [5, 9, 23, 44, 17]
    out = llm.generate(prompt, SamplingParams(max_tokens=8, top_k=1))
    got = out.outputs[0].token_ids
    assert got == hf_greedy(tmodel, prompt, 8)
    assert out.outputs[0].finish_reason == "length"


def test_batch_generation(tiny_llm):
    llm, tmodel = tiny_llm
    prompts = [[3, 7, 11], [2, 90, 31, 45, 60, 8], [1] * 20]
    outs = llm.generate(prompts, SamplingParams(max_tokens=6, top_k=1))
    assert len(outs) == 3
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == hf_greedy(tmodel, p, 6)


def test_async_and_streaming(tiny_llm):
    llm, tmodel = tiny_llm
    prompt = [4, 8, 15, 16, 23, 42]
    fut = llm.generate_async(prompt, SamplingParams(max_tokens=5, top_k=1),
                             streaming=True)
    streamed = []
    for out in fut:
        streamed.extend(out.token_ids)
    fut.result(timeout=60)
    assert streamed == hf_greedy(tmodel, prompt, 5)


def test_stop_token(tiny_llm):
    llm, tmodel = tiny_llm
    prompt = [5, 9, 23, 44, 17]
    ref = hf_greedy(tmodel, prompt, 8)
    stop_tok = ref[3]
    out = llm.generate(prompt, SamplingParams(
        max_tokens=8, top_k=1, stop_token_ids=[stop_tok]))
    got = out.outputs[0].token_ids
    assert got == ref[:4]
    assert out.outputs[0].finish_reason in ("stop_words", "end_id")


def test_prefix_cache_reuse(tiny_llm):
    llm, tmodel = tiny_llm
    prompt = list(range(2, 50))  # long shared prefix (3 pages)
    out1 = llm.generate(prompt, SamplingParams(max_tokens=4, top_k=1))
    out2 = llm.generate(prompt, SamplingParams(max_tokens=4, top_k=1))
    assert out1.outputs[0].token_ids == out2.outputs[0].token_ids
    stats = llm.kv_cache_manager.get_stats()
    assert stats.reused_blocks > 0


def test_sampling_with_seed_variability(tiny_llm):
    llm, _ = tiny_llm
    prompt = [7, 3, 99]
    outs = [llm.generate(prompt,
                         SamplingParams(max_tokens=12, temperature=5.0,
                                        top_k=0))
            for _ in range(3)]
    seqs = {tuple(o.outputs[0].token_ids) for o in outs}
    assert len(seqs) > 1  # hot temperature ⇒ diverse outputs


def test_max_tokens_respected(tiny_llm):
    llm, _ = tiny_llm
    out = llm.generate([1, 2, 3], SamplingParams(max_tokens=3, top_k=1))
    assert len(out.outputs[0].token_ids) == 3
