"""Device-resident multi-step decode window (K tokens per dispatch).

Parity contract: for greedy and *seeded* sampled requests the token
stream must be identical to single-step decoding, because greedy is
deterministic and seeded noise is a pure function of (seed, position).
Stop handling (EOS / stop ids / min_tokens / max_tokens) moves in-graph
(reference analog: stopCriteriaKernels.cu + CUDA-graph replay loop)."""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


def _model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def _llm(tmodel, multi_step):
    return LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=8, max_input_len=64, max_seq_len=160,
               max_num_tokens=256, decode_multi_step=multi_step,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))


@pytest.fixture(scope="module")
def llms():
    tmodel = _model()
    multi = _llm(tmodel, 8)
    single = _llm(tmodel, 1)
    yield multi, single, tmodel
    multi.shutdown()
    single.shutdown()


def hf_greedy(tmodel, prompt, n):
    import torch
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n):
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_greedy_non_multiple_of_window(llms):
    """max_tokens not a multiple of K: the final window is budget-capped."""
    multi, _, tmodel = llms
    prompt = [5, 9, 23, 44, 17]
    out = multi.generate(prompt, SamplingParams(max_tokens=13, top_k=1))
    assert out.outputs[0].token_ids == hf_greedy(tmodel, prompt, 13)
    assert out.outputs[0].finish_reason == "length"


def test_eos_mid_window(llms):
    """end_id hit inside a window: the overshoot is discarded and the
    finish reason is end_id, identical to single-step."""
    multi, single, tmodel = llms
    prompt = [3, 7, 11, 19]
    ref = hf_greedy(tmodel, prompt, 40)
    # pick the 5th generated token as EOS so it lands mid-window (K=8)
    eos = ref[4]
    stop_at = ref.index(eos) + 1
    sp = SamplingParams(max_tokens=40, top_k=1, end_id=eos)
    o_multi = multi.generate(prompt, sp)
    o_single = single.generate(prompt, sp)
    assert o_multi.outputs[0].token_ids == o_single.outputs[0].token_ids
    assert o_multi.outputs[0].token_ids == ref[:stop_at]
    assert o_multi.outputs[0].finish_reason == "end_id"


def test_min_tokens_suppresses_early_stop(llms):
    """A stop id inside the min_tokens window must be ignored in-graph."""
    multi, single, tmodel = llms
    prompt = [3, 7, 11, 19]
    ref = hf_greedy(tmodel, prompt, 40)
    eos = ref[2]  # would stop at 3 tokens without min_tokens
    sp = SamplingParams(max_tokens=24, top_k=1, end_id=eos, min_tokens=10)
    o_multi = multi.generate(prompt, sp)
    o_single = single.generate(prompt, sp)
    assert o_multi.outputs[0].token_ids == o_single.outputs[0].token_ids
    assert len(o_multi.outputs[0].token_ids) >= 10


def test_stop_token_ids(llms):
    multi, single, tmodel = llms
    prompt = [2, 90, 31, 45]
    ref = hf_greedy(tmodel, prompt, 30)
    stop_tok = ref[10]
    sp = SamplingParams(max_tokens=30, top_k=1, stop_token_ids=[stop_tok])
    o_multi = multi.generate(prompt, sp)
    o_single = single.generate(prompt, sp)
    assert o_multi.outputs[0].token_ids == o_single.outputs[0].token_ids
    assert o_multi.outputs[0].token_ids[-1] == stop_tok


def test_seeded_sampling_parity(llms):
    """Seeded noise is position-keyed: multi-step and single-step must
    produce the same sampled stream."""
    multi, single, _ = llms
    sp = SamplingParams(max_tokens=20, temperature=0.9, top_k=0,
                        top_p=0.95, seed=1234)
    a = multi.generate([11, 22, 33], sp).outputs[0].token_ids
    b = single.generate([11, 22, 33], sp).outputs[0].token_ids
    assert a == b


def test_penalties_parity(llms):
    multi, single, _ = llms
    sp = SamplingParams(max_tokens=18, top_k=1, repetition_penalty=1.4,
                        presence_penalty=0.3, frequency_penalty=0.2)
    a = multi.generate([7] * 10, sp).outputs[0].token_ids
    b = single.generate([7] * 10, sp).outputs[0].token_ids
    assert a == b


def test_mixed_batch_with_arrivals(llms):
    """Requests submitted while decode windows are in flight: prefill
    iterations interleave with multi-step windows and every request
    still matches baseline greedy."""
    multi, _, tmodel = llms
    import threading, time
    sp = SamplingParams(max_tokens=25, top_k=1)
    futs = [multi.generate_async([1, 2, 3, 4], sp)]
    time.sleep(0.05)  # let the first request enter decode
    futs.append(multi.generate_async([9, 8, 7], sp))
    time.sleep(0.03)
    futs.append(multi.generate_async([40] * 12, sp))
    outs = [f.result(timeout=120) for f in futs]
    for prompt, o in zip([[1, 2, 3, 4], [9, 8, 7], [40] * 12], outs):
        assert o.outputs[0].token_ids == hf_greedy(tmodel, prompt, 25)
