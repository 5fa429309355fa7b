"""VSWA: per-window KV pools (reference: resource_manager.py:1878).
Gemma-2's alternating sliding/global layers run on two pools; the
sliding pool is a fraction of the global and its out-of-window blocks
are evicted block-granularly as decode proceeds."""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def gemma2():
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM
    torch.manual_seed(0)
    cfg = Gemma2Config(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=4,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, query_pre_attn_scalar=16,
                       sliding_window=16, max_position_embeddings=256,
                       attn_logit_softcapping=50.0,
                       final_logit_softcapping=30.0)
    return Gemma2ForCausalLM(cfg).eval()


def _llm(gemma2, vswa: bool):
    kv = dict(tokens_per_block=8, max_tokens=2048)
    if vswa:
        kv["max_attention_window"] = [16, 128]
    return LLM(model=gemma2, skip_tokenizer_init=True, dtype="float32",
               max_batch_size=4, max_input_len=64, max_seq_len=128,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(**kv))


def test_vswa_matches_single_pool_and_hf(gemma2):
    import torch
    prompt = list(range(2, 40))          # 38 tokens >> window 16
    sp = SamplingParams(max_tokens=12, top_k=1, end_id=-1)

    with torch.no_grad():
        out = gemma2.generate(torch.tensor([prompt]), max_new_tokens=12,
                              do_sample=False)
    hf = out[0, len(prompt):].tolist()

    base = _llm(gemma2, vswa=False)
    ref = base.generate(prompt, sp).outputs[0].token_ids
    base.shutdown()
    assert ref == hf

    v = _llm(gemma2, vswa=True)
    assert getattr(v.engine, "_vswa", False)
    # dual pools, sliding pool smaller than global
    kv_g, kv_s = v.engine.kv_pages
    assert kv_g.shape[0] == kv_s.shape[0] == 2        # 2 layers each
    assert kv_s.shape[1] < kv_g.shape[1]
    got = v.generate(prompt, sp).outputs[0].token_ids
    assert got == hf
    v.shutdown()


def test_vswa_trims_out_of_window_blocks(gemma2):
    """Sliding-pool blocks fully below the window return to the free
    pool while the sequence is still running."""
    v = _llm(gemma2, vswa=True)
    mgr = v.llm_kv if hasattr(v, "llm_kv") else v.kv_cache_manager
    s_free0 = mgr.s.get_num_free_blocks()
    fut = v.generate_async(list(range(2, 50)),
                           SamplingParams(max_tokens=30, top_k=1,
                                          end_id=-1))
    fut.result(120)
    # 48 prompt + 30 gen = 78 tokens, window 16, page 8: most of the
    # ~10 pages must have been trimmed during the run; after free all
    # return
    assert mgr.s.get_num_free_blocks() == s_free0
    v.shutdown()


def test_vswa_concurrent_batch(gemma2):
    v = _llm(gemma2, vswa=True)
    sp = SamplingParams(max_tokens=10, top_k=1, end_id=-1)
    futs = [v.generate_async(list(range(3 + i, 30 + i)), sp)
            for i in range(4)]
    outs = [f.result(120).outputs[0].token_ids for f in futs]
    assert all(len(o) == 10 for o in outs)
    # determinism: same prompts again give same streams
    futs2 = [v.generate_async(list(range(3 + i, 30 + i)), sp)
             for i in range(4)]
    outs2 = [f.result(120).outputs[0].token_ids for f in futs2]
    assert outs == outs2
    v.shutdown()


def test_vswa_multi_step_window_active(gemma2):
    """Round-4 composition close: the K-step decode window addresses
    BOTH pools (dual-pool page tables), so VSWA no longer forces
    single-step decoding; outputs still match HF greedy."""
    import torch
    llm = _llm(gemma2, vswa=True)
    assert llm.args.decode_multi_step > 1        # no longer forced off
    prompt = list(range(2, 40))
    out = llm.generate(prompt, SamplingParams(max_tokens=13, top_k=1,
                                              end_id=-1))
    # a multi-step window actually compiled
    assert any(k[0] == "multi" for k in llm.engine._step_fns
               if isinstance(k, tuple)), llm.engine._step_fns.keys()
    llm.shutdown()
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(13):
            lg = gemma2(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(lg)))
    assert out.outputs[0].token_ids == ids[len(prompt):]
