"""Fused device-resident speculative windows (runtime/spec_window.py):
EAGLE3/MTP propose→verify→accept in one dispatch, riding the overlap
scheduler (reference contract: drafter inside the overlap loop,
py_executor.py:2671)."""
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig


@pytest.fixture(scope="module")
def tiny_model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(3)
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def make_llm(tiny_model, **kw):
    defaults = dict(model=tiny_model, skip_tokenizer_init=True,
                    dtype="float32", max_batch_size=8, max_input_len=64,
                    max_seq_len=128, max_num_tokens=256,
                    kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                  max_tokens=2048))
    defaults.update(kw)
    return LLM(**defaults)


def test_eagle3_rides_overlap(tiny_model):
    """The VERDICT-r2 contract: EAGLE3 runs with
    disable_overlap_scheduler=False and stays lossless."""
    prompts = [[5, 9, 23, 44, 17], [3, 3, 7, 3, 3, 7, 3, 3]]
    sp = SamplingParams(max_tokens=12, top_k=1)
    base = make_llm(tiny_model)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=3))
    assert spec.executor.enable_overlap          # NOT forced sync
    assert spec.engine.sd is not None            # device windows armed
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    # a fused window actually compiled and ran
    assert any(k[0] == "spec" for k in spec.engine.sd.fns)
    spec.shutdown()
    assert got == ref


def test_spec_window_stop_ids_and_budget(tiny_model):
    """Stop tokens inside a window truncate in-graph; max_tokens is an
    absolute gate on the device-resident emitted count."""
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=3, device_window_iters=4))
    base = make_llm(tiny_model)
    prompt = [5, 9, 23, 44, 17]
    ref_out = base.generate(
        [prompt], SamplingParams(max_tokens=20, top_k=1)
    )[0].outputs[0].token_ids
    base.shutdown()
    # stop on the 4th reference token: the spec run must cut there
    stop_tok = ref_out[3]
    sp = SamplingParams(max_tokens=20, top_k=1, stop_token_ids=[stop_tok])
    got = spec.generate([prompt], sp)[0].outputs[0].token_ids
    assert got == ref_out[:4]
    # absolute max_tokens cap
    sp2 = SamplingParams(max_tokens=5, top_k=1)
    got2 = spec.generate([prompt], sp2)[0].outputs[0].token_ids
    assert got2 == ref_out[:5]
    spec.shutdown()


def test_spec_window_streams_and_cancel(tiny_model):
    """Windows under continuous batching: concurrent requests with
    different lengths, one streaming."""
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=2))
    futs = [spec.generate_async([i + 1, i + 2, i + 3],
                                SamplingParams(max_tokens=6 + i, top_k=1))
            for i in range(4)]
    outs = [f.result(timeout=300).outputs[0].token_ids for f in futs]
    for i, o in enumerate(outs):
        assert len(o) == 6 + i
    base = make_llm(tiny_model)
    for i in range(4):
        ref = base.generate([[i + 1, i + 2, i + 3]],
                            SamplingParams(max_tokens=6 + i, top_k=1))
        assert outs[i] == ref[0].outputs[0].token_ids
    base.shutdown()
    spec.shutdown()


def test_seeded_sampled_window_lossless(tiny_model):
    """SEEDED sampled rows ride the window with position-keyed
    sample-and-match acceptance: the emitted stream is bit-identical to
    non-speculative seeded sampling (rejection_sample contract)."""
    sp = SamplingParams(max_tokens=10, temperature=0.8, top_k=0,
                        top_p=0.95, seed=1234)
    base = make_llm(tiny_model)
    ref = [o.outputs[0].token_ids
           for o in base.generate([[5, 9, 23], [7, 8, 9, 10]], sp)]
    base.shutdown()
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=3))
    got = [o.outputs[0].token_ids
           for o in spec.generate([[5, 9, 23], [7, 8, 9, 10]], sp)]
    assert any(k[0] == "spec" and k[3] is False
               for k in spec.engine.sd.fns), spec.engine.sd.fns.keys()
    spec.shutdown()
    assert got == ref


def test_non_greedy_rows_fall_back(tiny_model):
    """Mixed greedy + unseeded-sampled batch through the window path:
    greedy rows still match baseline exactly."""
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=2))
    f1 = spec.generate_async([5, 9, 23], SamplingParams(
        max_tokens=8, top_k=1))
    f2 = spec.generate_async([7, 8, 9], SamplingParams(
        max_tokens=8, temperature=0.9, top_k=0, seed=7))
    g1 = f1.result(timeout=300).outputs[0].token_ids
    f2.result(timeout=300)
    spec.shutdown()
    base = make_llm(tiny_model)
    ref = base.generate([[5, 9, 23]], SamplingParams(max_tokens=8,
                                                     top_k=1))
    base.shutdown()
    assert g1 == ref[0].outputs[0].token_ids


def test_mixed_batch_splits_spec_from_logprobs_rows(tiny_model):
    """A logprobs row shares the engine with spec-eligible rows: the
    eligible rows still ride spec windows (split dispatch), everyone is
    lossless vs baseline."""
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=2))
    sp_fast = SamplingParams(max_tokens=12, top_k=1)
    sp_lp = SamplingParams(max_tokens=12, top_k=1, logprobs=1)
    f1 = spec.generate_async([5, 9, 23], sp_fast)
    f2 = spec.generate_async([7, 8, 9], sp_lp)
    g1 = f1.result(timeout=300).outputs[0].token_ids
    o2 = f2.result(timeout=300).outputs[0]
    assert any(k[0] == "spec" for k in spec.engine.sd.fns)
    spec.shutdown()
    base = make_llm(tiny_model)
    r1 = base.generate([[5, 9, 23]], sp_fast)[0].outputs[0].token_ids
    r2 = base.generate([[7, 8, 9]], sp_lp)[0].outputs[0]
    base.shutdown()
    assert g1 == r1
    assert o2.token_ids == r2.token_ids
    assert o2.logprobs is not None


def test_guided_rides_spec_window(tiny_model):
    """Guided x spec (round-4 composition close, reference:
    guided_decoder.py:373 rollback on rejected drafts): a greedy
    device-guided request runs INSIDE the fused window — the DFA mask
    re-argmaxes the verify rows sequentially — and the output matches
    plain guided greedy decoding exactly."""
    from tensorrt_llm_tpu import GuidedDecodingParams
    prompts = [[5, 9, 23], [3, 3, 7, 3]]
    gp = GuidedDecodingParams(regex="(12)+(7)+")
    sp = SamplingParams(max_tokens=10, top_k=1, guided_decoding=gp,
                        ignore_eos=True)
    base = make_llm(tiny_model, guided_decoding_backend="dfa")
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = make_llm(tiny_model, guided_decoding_backend="dfa",
                    speculative_config=SpeculativeConfig(
                        mode="EAGLE3", max_draft_len=3))
    assert spec.executor.enable_overlap
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    # the guided variant of the window actually compiled and ran
    assert any(len(k) > 4 and k[4] for k in spec.engine.sd.fns), \
        spec.engine.sd.fns.keys()
    spec.shutdown()
    # the contract: bit-identical to plain guided greedy decoding
    # (the DFA constrained both paths identically; rejected drafts
    # never advanced the window's DFA state)
    assert got == ref
    assert all(len(o) > 2 for o in got)


def test_guided_spec_mixed_with_plain_rows(tiny_model):
    """Guided rows and plain greedy rows share fused windows."""
    from tensorrt_llm_tpu import GuidedDecodingParams
    spec = make_llm(tiny_model, guided_decoding_backend="dfa",
                    speculative_config=SpeculativeConfig(
                        mode="EAGLE3", max_draft_len=3))
    gp = GuidedDecodingParams(regex="(5)+")
    f1 = spec.generate_async([5, 9, 23], SamplingParams(
        max_tokens=8, top_k=1, guided_decoding=gp, ignore_eos=True))
    f2 = spec.generate_async([3, 3, 7, 3], SamplingParams(
        max_tokens=8, top_k=1, ignore_eos=True))
    o1 = f1.result(300).outputs[0].token_ids
    o2 = f2.result(300).outputs[0].token_ids
    base = make_llm(tiny_model)
    ref2 = base.generate([3, 3, 7, 3], SamplingParams(
        max_tokens=8, top_k=1, ignore_eos=True)).outputs[0].token_ids
    base.shutdown()
    spec.shutdown()
    assert all(t == 5 for t in o1), o1
    assert o2 == ref2


def test_logprobs_inside_spec_window(tiny_model):
    """Top-k logprobs ride the fused window (round-4 composition
    close): values match the non-speculative logprobs path."""
    prompts = [[5, 9, 23, 44, 17]]
    sp = SamplingParams(max_tokens=8, top_k=1, logprobs=3,
                        ignore_eos=True)
    base = make_llm(tiny_model)
    r0 = base.generate(prompts, sp)[0]
    base.shutdown()
    spec = make_llm(tiny_model, speculative_config=SpeculativeConfig(
        mode="EAGLE3", max_draft_len=3))
    r1 = spec.generate(prompts, sp)[0]
    # the logprobs window variant actually ran
    assert any(len(k) > 5 and k[5] > 0 for k in spec.engine.sd.fns), \
        spec.engine.sd.fns.keys()
    spec.shutdown()
    assert r1.outputs[0].token_ids == r0.outputs[0].token_ids
    lp0 = r0.outputs[0].logprobs
    lp1 = r1.outputs[0].logprobs
    assert len(lp0) == len(lp1) == 8
    for d0, d1 in zip(lp0, lp1):
        assert set(d0) == set(d1)
        for t in d0:
            assert abs(d0[t] - d1[t]) < 1e-3, (d0, d1)
