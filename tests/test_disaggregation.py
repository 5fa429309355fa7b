"""Disaggregated serving: context→generation KV handoff must reproduce
the single-engine greedy output (reference: disaggregated serving docs —
ctx server returns first token + DisaggregatedParams; gen server
request_and_receive, kv_cache_transceiver.py:107)."""
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.disaggregation import DisaggregatedParams


@pytest.fixture(scope="module")
def model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def make_llm(model):
    return LLM(model=model, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=1024))


def test_ctx_gen_handoff_matches_single_engine(model):
    prompt = [5, 9, 23, 44, 17, 3, 77]
    n_total = 9

    single = make_llm(model)
    ref = single.generate(prompt, SamplingParams(
        max_tokens=n_total, top_k=1)).outputs[0].token_ids
    single.shutdown()

    ctx_llm = make_llm(model)
    gen_llm = make_llm(model)   # InProcess transport store is class-level

    ctx_out = ctx_llm.generate_async(
        prompt, SamplingParams(max_tokens=1, top_k=1),
        disaggregated_params=DisaggregatedParams(
            request_type="context_only")).result(60)
    first = ctx_out.outputs[0].token_ids
    assert first == ref[:1]

    gen_out = gen_llm.generate_async(
        prompt, SamplingParams(max_tokens=n_total, top_k=1),
        disaggregated_params=DisaggregatedParams(
            request_type="generation_only",
            ctx_request_id=ctx_out.request_id,
            first_gen_tokens=first)).result(60)
    assert gen_out.outputs[0].token_ids == ref
    ctx_llm.shutdown()
    gen_llm.shutdown()


def make_llm_par(model, **par):
    return LLM(model=model, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=1024), **par)


@pytest.mark.parametrize("ctx_par,gen_par", [
    (dict(tensor_parallel_size=2), dict()),                  # TP2 -> TP1
    (dict(), dict(tensor_parallel_size=2)),                  # TP1 -> TP2
    (dict(pipeline_parallel_size=2), dict(tensor_parallel_size=2)),
])
def test_heterogeneous_ctx_gen_handoff(model, ctx_par, gen_par):
    """Heterogeneous disagg: context and generation engines with
    DIFFERENT parallel layouts exchange KV bit-exactly (reference:
    cacheFormatter.cpp layout conversion between mismatched TP/PP).
    The TPU design needs no formatter: extract_kv gathers the pool into
    a canonical layout-neutral [L, T, 2*kvh, hd] host blob regardless
    of mesh, and injection rescatters under the target engine's own
    sharding."""
    prompt = [5, 9, 23, 44, 17, 3, 77]
    n_total = 9

    single = make_llm(model)
    ref = single.generate(prompt, SamplingParams(
        max_tokens=n_total, top_k=1)).outputs[0].token_ids
    single.shutdown()

    ctx_llm = make_llm_par(model, **ctx_par)
    gen_llm = make_llm_par(model, **gen_par)

    ctx_out = ctx_llm.generate_async(
        prompt, SamplingParams(max_tokens=1, top_k=1),
        disaggregated_params=DisaggregatedParams(
            request_type="context_only")).result(120)
    first = ctx_out.outputs[0].token_ids
    assert first == ref[:1]

    gen_out = gen_llm.generate_async(
        prompt, SamplingParams(max_tokens=n_total, top_k=1),
        disaggregated_params=DisaggregatedParams(
            request_type="generation_only",
            ctx_request_id=ctx_out.request_id,
            first_gen_tokens=first)).result(120)
    assert gen_out.outputs[0].token_ids == ref
    ctx_llm.shutdown()
    gen_llm.shutdown()
