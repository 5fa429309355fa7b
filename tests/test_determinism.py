"""Determinism suite (reference: golden-token determinism tests,
FORCE_DETERMINISTIC): seeded sampling reproduces exactly across calls,
across engine rebuilds ("restarts"), and independent of batch
composition; greedy decoding is bit-stable."""
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def tmodel():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def _llm(tmodel, **kw):
    return LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=1024), **kw)


PROMPT = [5, 9, 23, 44, 17]
SEEDED = SamplingParams(max_tokens=12, temperature=0.9, top_p=0.9, seed=1234)
GREEDY = SamplingParams(max_tokens=12, top_k=1)


def test_seeded_sampling_repeats_within_engine(tmodel):
    llm = _llm(tmodel)
    a = llm.generate(PROMPT, SEEDED).outputs[0].token_ids
    b = llm.generate(PROMPT, SEEDED).outputs[0].token_ids
    llm.shutdown()
    assert a == b


def test_seeded_sampling_survives_restart(tmodel):
    """Golden tokens across engine rebuilds — seeds are a pure function
    of (seed, position), not engine state."""
    llm1 = _llm(tmodel)
    a = llm1.generate(PROMPT, SEEDED).outputs[0].token_ids
    llm1.shutdown()
    llm2 = _llm(tmodel)
    b = llm2.generate(PROMPT, SEEDED).outputs[0].token_ids
    llm2.shutdown()
    assert a == b


def test_seeded_sampling_batch_invariant(tmodel):
    """The same seeded request yields the same stream whether it runs
    alone or alongside other traffic (per-request position-folded
    seeds; reference: FORCE_DETERMINISTIC batch invariance)."""
    llm = _llm(tmodel)
    alone = llm.generate(PROMPT, SEEDED).outputs[0].token_ids
    futs = [llm.generate_async([7, 8, 9, 10], GREEDY) for _ in range(3)]
    crowd = llm.generate_async(PROMPT, SEEDED)
    got = crowd.result(120).outputs[0].token_ids
    for f in futs:
        f.result(120)
    llm.shutdown()
    assert got == alone


def test_greedy_bit_stable_across_runs(tmodel):
    llm = _llm(tmodel)
    runs = [llm.generate(PROMPT, GREEDY).outputs[0].token_ids
            for _ in range(3)]
    llm.shutdown()
    assert runs[0] == runs[1] == runs[2]


def test_distinct_seeds_diverge(tmodel):
    llm = _llm(tmodel)
    import dataclasses
    a = llm.generate(PROMPT, SEEDED).outputs[0].token_ids
    other = dataclasses.replace(SEEDED, seed=99)
    b = llm.generate(PROMPT, other).outputs[0].token_ids
    llm.shutdown()
    assert a != b
