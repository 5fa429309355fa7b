"""Model parity for the wider family set: Qwen2/3, Mixtral, Gemma2,
Phi-3 vs HF transformers (torch CPU, shared random weights)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import (build_pair, hf_logits,
                               make_prefill_metadata)


def _roundtrip(cfg, cls, rtol=3e-3):
    model, params, tmodel = build_pair(cfg, cls)
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32), kv, md)
    ours = np.asarray(logits)[0]
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=rtol)


def test_qwen2():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      tie_word_embeddings=False)
    _roundtrip(cfg, Qwen2ForCausalLM)


def test_qwen3():
    from transformers import Qwen3Config, Qwen3ForCausalLM
    cfg = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    _roundtrip(cfg, Qwen3ForCausalLM)


def test_mixtral():
    from transformers import MixtralConfig, MixtralForCausalLM
    cfg = MixtralConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        num_local_experts=4, num_experts_per_tok=2,
                        max_position_embeddings=256,
                        tie_word_embeddings=False)
    _roundtrip(cfg, MixtralForCausalLM, rtol=5e-3)


def test_gemma2():
    from transformers import Gemma2Config, Gemma2ForCausalLM
    cfg = Gemma2Config(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, query_pre_attn_scalar=16,
                       sliding_window=8, max_position_embeddings=256,
                       attn_logit_softcapping=50.0,
                       final_logit_softcapping=30.0)
    _roundtrip(cfg, Gemma2ForCausalLM, rtol=5e-3)


def test_phi3():
    from transformers import Phi3Config, Phi3ForCausalLM
    cfg = Phi3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=256,
                     tie_word_embeddings=False,
                     pad_token_id=0, eos_token_id=1, bos_token_id=2)
    _roundtrip(cfg, Phi3ForCausalLM)
