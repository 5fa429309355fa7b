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


def test_e2e_draft_target_lossless_same_model(repeat_model):
    """Draft == target: greedy acceptance is 100% and the stream is
    byte-identical to the baseline (reference: model_drafter.py)."""
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
               speculative_config=SpeculativeConfig(
                   mode="DRAFT_TARGET", max_draft_len=3,
                   draft_model=repeat_model),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    # draft == target (float32): every draft accepted -> requests
    # finish in ceil(16/(3+1)) verify steps; acceptance is visible as
    # fewer executor iterations than tokens
    iters = spec.executor.iter_counter
    spec.shutdown()
    assert got == ref
    assert iters < 16  # 16 tokens would need 16 iters without drafts


def test_e2e_draft_target_lossless_different_model(repeat_model):
    """A DIFFERENT (random) draft model: low acceptance, still lossless."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    torch.manual_seed(99)
    dcfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=1, num_attention_heads=2,
                       num_key_value_heads=2, max_position_embeddings=512)
    draft = LlamaForCausalLM(dcfg).eval()

    prompts = [[5, 9, 23, 44, 17], [11] * 12]
    sp = SamplingParams(max_tokens=12, top_k=1)

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
               speculative_config=SpeculativeConfig(
                   mode="DRAFT_TARGET", max_draft_len=3, draft_model=draft),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref


def test_e2e_seeded_sampled_spec_lossless(repeat_model):
    """Seeded sampled requests with drafts: sample-and-match acceptance
    with position-keyed noise must reproduce the non-speculative stream
    bit-exactly (reference: rejection-sampling acceptance, lossless)."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=14, temperature=0.9, top_k=0,
                        top_p=0.95, seed=4242)

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
               speculative_config=SpeculativeConfig(
                   mode="DRAFT_TARGET", max_draft_len=3,
                   draft_model=repeat_model),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref


def test_e2e_unseeded_sampled_spec_valid(repeat_model):
    """Unseeded sampled requests take the true rejection-sampling path:
    completion must be well-formed (right length, in-vocab tokens)."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    spec = LLM(model=repeat_model, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=8, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               speculative_config=SpeculativeConfig(
                   mode="DRAFT_TARGET", max_draft_len=3,
                   draft_model=repeat_model),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    sp = SamplingParams(max_tokens=12, temperature=0.8, top_k=0,
                        ignore_eos=True)
    outs = spec.generate([[5, 9, 23], [11] * 8], sp)
    spec.shutdown()
    for o in outs:
        ids = o.outputs[0].token_ids
        assert len(ids) == 12
        assert all(0 <= t < 64 for t in ids)


def test_e2e_eagle3_lossless(repeat_model):
    """EAGLE3 one-model head (random weights: ~zero acceptance, but the
    mechanism — feature capture, head KV, verify, rewind — must be
    lossless vs baseline greedy). (reference: speculative/eagle3.py)"""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3], [11] * 12]
    sp = SamplingParams(max_tokens=14, top_k=1)

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
               speculative_config=SpeculativeConfig(mode="EAGLE3",
                                                    max_draft_len=3),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref


def test_e2e_mtp_lossless():
    """DeepSeek-V3 MTP one-model module (random weights: ~zero
    acceptance, but feature capture, latent KV, verify, rewind must be
    lossless vs baseline greedy). (reference: speculative/mtp.py
    MTPEagleWorker + modeling_deepseekv3.py DeepseekV3MTP)."""
    import torch
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig
    from tests.test_deepseek import tiny_cfg

    torch.manual_seed(0)
    from transformers import DeepseekV3ForCausalLM
    tmodel = DeepseekV3ForCausalLM(tiny_cfg()).eval()

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=10, top_k=1)
    kw = dict(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    base = LLM(**kw)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()

    spec = LLM(speculative_config=SpeculativeConfig(mode="MTP",
                                                    max_draft_len=2), **kw)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref


def test_mtp_drafter_unit():
    """Drafter mechanics: drafts produced per feature stream, slot
    lifecycle, feature queue drain."""
    import jax.numpy as jnp
    import numpy as np
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.speculative.mtp import MtpDrafter
    from tests.test_deepseek import tiny_cfg

    cfg = tiny_cfg()
    mc = ModelConfig(hf_config=cfg, dtype=jnp.float32)
    model = get_model_class("deepseek_v3")(mc)
    import jax
    params = model.init_params(jax.random.PRNGKey(0))
    d = MtpDrafter(model, params, max_draft_len=3, max_slots=4,
                   page_size=16, max_seq_len=64, token_buckets=(16,))
    reqs = [make_req([1, 2, 3]), make_req([4, 5])]
    rng = np.random.default_rng(0)
    for r, n in zip(reqs, (2, 1)):
        r.eagle_feats = [(int(i + 7),
                          rng.standard_normal(cfg.hidden_size,
                                              np.float32))
                         for i in range(n)]
    d.prepare_draft_tokens(reqs)
    for r in reqs:
        assert len(r.draft_tokens) == 3
        assert all(0 <= t < cfg.vocab_size for t in r.draft_tokens)
        assert r.eagle_feats == []
    assert len(d._state) == 2
    d.drop_request(reqs[0].request_id)
    assert len(d._free) == 3


def test_e2e_pard_lossless(repeat_model):
    """PARD parallel draft (reference: speculative/pard.py): the draft
    model emits all K drafts in ONE forward over K mask tokens. With an
    untrained-for-masks draft, acceptance is incidental but the stream
    must stay byte-identical to baseline greedy (target verification
    discards every wrong draft)."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=14, top_k=1)
    kw = dict(model=repeat_model, skip_tokenizer_init=True,
              dtype="float32", max_batch_size=8, max_input_len=64,
              max_seq_len=128, max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    base = LLM(**kw)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = LLM(**kw, speculative_config=SpeculativeConfig(
        mode="PARD", max_draft_len=3, draft_model=repeat_model,
        pard_mask_token_id=0))
    drafter = spec.executor.drafter
    assert drafter.parallel_draft and drafter.mask_token_id == 0
    # spy: PARD must propose exactly K drafts per request in one call
    seen = []
    orig = drafter.prepare_draft_tokens

    def spy(reqs):
        orig(reqs)
        seen.extend(len(r.draft_tokens) for r in reqs if r.draft_tokens)
    drafter.prepare_draft_tokens = spy
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref
    assert seen and all(n == 3 for n in seen)


def test_pard_requires_mask_token(repeat_model):
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig
    with pytest.raises(ValueError, match="mask"):
        LLM(model=repeat_model, skip_tokenizer_init=True,
            dtype="float32", max_batch_size=4, max_input_len=32,
            max_seq_len=96, max_num_tokens=128,
            speculative_config=SpeculativeConfig(
                mode="PARD", max_draft_len=2, draft_model=repeat_model),
            kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                          max_tokens=1024))


def test_e2e_dflash_block_lossless(repeat_model):
    """DFlash block proposal (reference: speculative/dflash.py):
    target-feature-conditioned head emits the whole K-token draft block
    in ONE forward over mask rows. Untrained head -> near-zero
    acceptance, but the stream must stay byte-identical to baseline
    greedy (host drafter path; device windows keep the chain head)."""
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig

    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=12, top_k=1)
    kw = dict(model=repeat_model, skip_tokenizer_init=True,
              dtype="float32", max_batch_size=8, max_input_len=64,
              max_seq_len=128, max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    base = LLM(**kw)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = LLM(**kw, speculative_config=SpeculativeConfig(
        mode="DFLASH", max_draft_len=3, pard_mask_token_id=0))
    drafter = spec.executor.drafter
    assert drafter.parallel_block
    assert spec.engine.sd is None          # host drafter path
    seen = []
    orig = drafter.prepare_draft_tokens

    def spy(reqs):
        orig(reqs)
        seen.extend(len(r.draft_tokens) for r in reqs if r.draft_tokens)
    drafter.prepare_draft_tokens = spy
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref
    assert seen and all(n == 3 for n in seen)
