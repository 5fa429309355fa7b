"""Device-resident guided decoding: the grammar walk lives on device
(guided/device_guided.py), so guided requests ride the overlap scheduler
and the K-step decode window (reference contract: guided decoding inside
the overlap loop, py_executor.py:2697 + logitsBitmask.cu — here with
zero per-token host sync)."""
import json

import numpy as np
import pytest

from tensorrt_llm_tpu import (LLM, GuidedDecodingParams, KvCacheConfig,
                              SamplingParams)


def tiny_llm(**kw):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=32, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=256)
    tmodel = LlamaForCausalLM(cfg).eval()
    defaults = dict(model=tmodel, skip_tokenizer_init=True, dtype="float32",
                    max_batch_size=4, max_input_len=16, max_seq_len=128,
                    max_num_tokens=64, guided_decoding_backend="dfa",
                    kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                                  max_tokens=1024))
    defaults.update(kw)
    return LLM(**defaults)


def test_device_guided_rides_overlap():
    """Guided requests must NOT force the sync scheduler any more."""
    llm = tiny_llm()
    assert llm.executor.enable_overlap
    assert llm.executor.guided_decoder.device is not None
    out = llm.generate([1, 2, 3], SamplingParams(
        max_tokens=6, top_k=1,
        guided_decoding=GuidedDecodingParams(regex="(7)+")))
    toks = out.outputs[0].token_ids
    assert toks[0] == 7
    assert all(t in (0, 7) for t in toks)
    llm.shutdown()


def test_device_guided_multi_step_window():
    """Guided decode inside the device-resident K-step window: token ids
    are decimal strings, so regex 5+2+ forces runs of 5s then 2s."""
    llm = tiny_llm(decode_multi_step=4)
    out = llm.generate([1, 2, 3], SamplingParams(
        max_tokens=10, top_k=1, ignore_eos=False,
        guided_decoding=GuidedDecodingParams(regex="(5){3}(2)+")))
    toks = out.outputs[0].token_ids
    assert toks[:3] == [5, 5, 5]
    # byte-level guidance: any token whose decimal string is all '2's
    # (ids 2 and 22 in a 32-token vocab) continues (2)+; EOS ends it
    assert all(t == 0 or set(str(t)) == {"2"} for t in toks[3:])
    llm.shutdown()


def test_device_guided_matches_host_path():
    """Same grammar, device walk vs host-sync bitmask path: identical
    greedy tokens."""
    sp = SamplingParams(
        max_tokens=8, top_k=1,
        guided_decoding=GuidedDecodingParams(
            json={"type": "object",
                  "properties": {"a": {"type": "integer"}}}))
    llm_dev = tiny_llm()
    dev = llm_dev.generate([1, 2, 3], sp).outputs[0].token_ids
    llm_dev.shutdown()
    llm_host = tiny_llm(guided_decoding_backend="dfa-host",
                        disable_overlap_scheduler=True)
    assert llm_host.executor.guided_decoder.device is None
    host = llm_host.generate([1, 2, 3], sp).outputs[0].token_ids
    llm_host.shutdown()
    assert dev == host


def test_device_guided_mixed_batch():
    """Guided and unguided requests in one batch: the unguided row is
    unmasked (state -1), the guided row constrained."""
    llm = tiny_llm()
    sps = [SamplingParams(max_tokens=5, top_k=1,
                          guided_decoding=GuidedDecodingParams(
                              regex="(9)+")),
           SamplingParams(max_tokens=5, top_k=1)]
    futs = [llm.generate_async([1, 2, 3], sps[0]),
            llm.generate_async([4, 5, 6], sps[1])]
    guided = futs[0].result(timeout=300).outputs[0].token_ids
    free = futs[1].result(timeout=300).outputs[0].token_ids
    assert guided[0] == 9 and all(t in (0, 9) for t in guided)
    # the unguided run must match a fully-unguided LLM (no mask leak)
    llm2 = tiny_llm(guided_decoding_backend=None)
    ref = llm2.generate([4, 5, 6],
                        SamplingParams(max_tokens=5, top_k=1))
    assert free == ref.outputs[0].token_ids
    llm2.shutdown()
    llm.shutdown()


def test_segment_sharing_and_release():
    """Concurrent same-grammar requests share one pool segment; release
    drops the refcount and the segment survives for reuse."""
    llm = tiny_llm()
    mgr = llm.executor.guided_decoder.device
    gp = GuidedDecodingParams(regex="(3)+")
    sp = SamplingParams(max_tokens=4, top_k=1, guided_decoding=gp)
    futs = [llm.generate_async([1, 2, 3], sp) for _ in range(3)]
    for f in futs:
        toks = f.result(timeout=300).outputs[0].token_ids
        assert toks[0] == 3
    assert len(mgr._segments) == 1
    seg = next(iter(mgr._segments.values()))
    assert seg.refs == 0  # all released
    # same grammar again: reuses the cached segment (no new alloc)
    base = seg.base
    llm.generate([1], sp)
    assert next(iter(mgr._segments.values())).base == base
    llm.shutdown()


def test_grammar_too_large_errors_cleanly():
    llm = tiny_llm()
    import os
    os.environ.pop("TLLM_TPU_GUIDED_POOL_STATES", None)
    mgr = llm.executor.guided_decoder.device
    mgr.pool_states = 4  # force the "can never fit" path
    with pytest.raises(Exception) as ei:
        llm.generate([1, 2, 3], SamplingParams(
            max_tokens=4, top_k=1,
            guided_decoding=GuidedDecodingParams(regex="(1|2|3){2,9}")))
    assert "pool" in str(ei.value)
    llm.shutdown()


def test_state_after_resume_replay():
    """Pause/evict resume: the device state replays already-generated
    tokens instead of restarting the grammar."""
    llm = tiny_llm()
    mgr = llm.executor.guided_decoder.device
    gp = GuidedDecodingParams(regex="123")  # bytes: '1' '2' '3'
    mgr.acquire(gp)
    s0 = mgr.state_after(gp, [])
    s1 = mgr.state_after(gp, [1])      # token "1" consumed
    s2 = mgr.state_after(gp, [1, 2])
    assert s0 != s1 != s2
    # a token that kills the DFA → -1
    assert mgr.state_after(gp, [9]) == -1
    llm.shutdown()
