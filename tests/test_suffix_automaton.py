"""Suffix-automaton drafter (reference: _torch/speculative/
suffix_automaton.py + sa_worker.py): longest-earlier-suffix lookup with
a match threshold, per-request automata, AUTO-heuristic integration."""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.speculative.suffix_automaton import (
    SuffixAutomatonDrafter, _SAM)


def test_sam_longest_match_and_continuation():
    sam = _SAM()
    seq = [1, 2, 3, 9, 1, 2, 3]
    for c in seq:
        sam.feed(c)
    # suffix [1,2,3] matched the occurrence at 0..2; continuation = 9,...
    assert sam.cur_len == 3
    assert sam.match_continuation(4) == [9, 1, 2, 3]


def test_sam_no_earlier_occurrence():
    sam = _SAM()
    for c in [1, 2, 3, 4]:
        sam.feed(c)
    assert sam.cur_len == 0
    assert sam.match_continuation(4) == []


def test_sam_matches_bruteforce():
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 200).tolist()
    sam = _SAM()
    for i, c in enumerate(seq):
        sam.feed(c)
        # brute force: longest suffix of seq[:i+1] occurring earlier
        best = 0
        hist = seq[:i + 1]
        for L in range(len(hist) - 1, 0, -1):
            suf = hist[-L:]
            found = any(hist[k:k + L] == suf
                        for k in range(len(hist) - L))
            if found:
                best = L
                break
        assert sam.cur_len == best, (i, sam.cur_len, best)


def test_drafter_threshold_and_update():
    d = SuffixAutomatonDrafter(max_draft_len=3, threshold=3)

    class R:
        request_id = 1
        all_token_ids = [1, 2, 1, 2]
        draft_tokens = []
    r = R()
    d.prepare_draft_tokens([r])
    assert r.draft_tokens == []          # match len 2 < threshold 3
    r2 = R()
    r2.request_id = 2                    # histories are append-only
    r2.all_token_ids = [1, 2, 3, 5, 1, 2, 3]
    d.prepare_draft_tokens([r2])
    assert r2.draft_tokens == [5, 1, 2]


def _tiny():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      tie_word_embeddings=False)
    return LlamaForCausalLM(cfg).eval()


def test_e2e_sa_lossless():
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig
    tm = _tiny()
    kw = dict(model=tm, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=160,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    prompts = [[3, 3, 7, 3, 3, 7, 3, 3], [5, 9, 23, 44, 17]]
    sp = SamplingParams(max_tokens=16, top_k=1, ignore_eos=True)
    base = LLM(**kw)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    base.shutdown()
    spec = LLM(speculative_config=SpeculativeConfig(
        mode="SA", max_draft_len=4, sa_threshold=2), **kw)
    assert isinstance(spec.executor.drafter, SuffixAutomatonDrafter)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    spec.shutdown()
    assert got == ref


def test_e2e_sa_accepts_on_repetition():
    """A looping greedy stream must give real SA acceptance (the whole
    point: unbounded-length suffix matches on repetitive output)."""
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig
    tm = _tiny()
    spec = LLM(model=tm, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=160,
               max_num_tokens=256,
               speculative_config=SpeculativeConfig(
                   mode="SA", max_draft_len=4, sa_threshold=2),
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=2048))
    drafter = spec.executor.drafter
    accepted = []
    orig = drafter.update
    drafter.update = lambda req, acc: (accepted.append(len(acc)),
                                       orig(req, acc))[-1]
    spec.generate([3, 3, 7, 3, 3, 7, 3, 3], SamplingParams(
        max_tokens=24, top_k=1, ignore_eos=True))
    spec.shutdown()
    assert sum(accepted) > 0, "SA never had a draft accepted"


def test_auto_mode_picks_sa_small_batch():
    from tensorrt_llm_tpu.llmapi.llm_args import SpeculativeConfig
    tm = _tiny()
    llm = LLM(model=tm, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=32, max_seq_len=96,
              max_num_tokens=128,
              speculative_config=SpeculativeConfig(mode="AUTO"),
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    assert isinstance(llm.executor.drafter, SuffixAutomatonDrafter)
    out = llm.generate([5, 9, 23], SamplingParams(max_tokens=6, top_k=1))
    assert len(out.outputs[0].token_ids) <= 6
    llm.shutdown()


def test_speculation_gate_disables_at_concurrency():
    d = SuffixAutomatonDrafter(max_draft_len=4, threshold=1,
                               max_concurrency=2)

    class R:
        def __init__(self, i):
            self.request_id = i
            self.all_token_ids = [1, 2, 1, 2, 1]
            self.draft_tokens = []
    rs = [R(i) for i in range(3)]
    d.prepare_draft_tokens(rs)
    assert all(r.draft_tokens == [] for r in rs)   # gated off
    d.prepare_draft_tokens(rs[:2])
    assert any(r.draft_tokens for r in rs[:2])     # active below gate
