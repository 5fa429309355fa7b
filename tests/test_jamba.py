"""Jamba hybrid (mamba + attention + MoE) parity and e2e decode
(reference: hybrid-recurrent cache support, SURVEY §2.2 Mamba/hybrid
row). The decode path exercises the hybrid cache: paged KV for the
attention layers, slot-indexed conv/ssm state for the mamba layers."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import build_pair, hf_logits, make_prefill_metadata


def _cfg(layers=8):
    from transformers import JambaConfig
    return JambaConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=layers,
                       num_attention_heads=4, num_key_value_heads=2,
                       num_experts=4, num_experts_per_tok=2,
                       mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
                       mamba_dt_rank=8, use_mamba_kernels=False,
                       pad_token_id=0, eos_token_id=1, bos_token_id=2,
                       max_position_embeddings=256,
                       tie_word_embeddings=False)


def test_jamba_prefill_parity():
    from transformers import JambaForCausalLM
    model, params, tmodel = build_pair(_cfg(), JambaForCausalLM)
    model._num_slots = 4
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    S = md.kv_lens.shape[0]
    md = dataclasses.replace(
        md, seq_slots=jnp.asarray([0] + [-1] * (S - 1), jnp.int32))
    logits, new_cache = model.forward(params, jnp.asarray(tokens, jnp.int32),
                                      kv, md)
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)
    # hybrid cache shape sanity: one attention layer + 7 mamba per period
    assert new_cache["kv"].shape[0] == 1
    assert new_cache["conv_state"].shape[:2] == (1, 7)


def test_jamba_e2e_greedy_matches_hf():
    import torch
    from transformers import JambaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams

    torch.manual_seed(0)
    tmodel = JambaForCausalLM(_cfg()).eval()
    prompt = [5, 9, 23, 44, 17]
    with torch.no_grad():
        out = tmodel.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    got = llm.generate(prompt, SamplingParams(max_tokens=8, top_k=1,
                                              end_id=-1)
                       ).outputs[0].token_ids
    llm.shutdown()
    assert got[:len(ref)] == ref


def test_jamba_concurrent_slots():
    """Two interleaved sequences keep independent mamba states."""
    import torch
    from transformers import JambaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams

    torch.manual_seed(0)
    tmodel = JambaForCausalLM(_cfg()).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    sp = SamplingParams(max_tokens=6, top_k=1, end_id=-1)
    alone = [llm.generate(p, sp).outputs[0].token_ids
             for p in ([3, 4, 5, 6], [30, 31, 32])]
    futs = [llm.generate_async(p, sp) for p in ([3, 4, 5, 6], [30, 31, 32])]
    both = [f.result(120).outputs[0].token_ids for f in futs]
    llm.shutdown()
    assert both == alone
