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


def test_granite():
    from transformers import GraniteConfig, GraniteForCausalLM
    cfg = GraniteConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=256,
                        embedding_multiplier=12.0,
                        attention_multiplier=0.03,
                        residual_multiplier=0.22, logits_scaling=8.0,
                        tie_word_embeddings=False)
    _roundtrip(cfg, GraniteForCausalLM, rtol=5e-3)


def test_olmo2():
    from transformers import Olmo2Config, Olmo2ForCausalLM
    cfg = Olmo2Config(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    _roundtrip(cfg, Olmo2ForCausalLM, rtol=5e-3)


def test_gpt_neox():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, max_position_embeddings=256,
                        rotary_pct=0.5, use_parallel_residual=True)
    _roundtrip(cfg, GPTNeoXForCausalLM, rtol=5e-3)


def test_gpt_neox_sequential():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, max_position_embeddings=256,
                        rotary_pct=1.0, use_parallel_residual=False)
    _roundtrip(cfg, GPTNeoXForCausalLM, rtol=5e-3)


def test_gptj():
    from transformers import GPTJConfig, GPTJForCausalLM
    cfg = GPTJConfig(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                     n_positions=256, rotary_dim=8)
    _roundtrip(cfg, GPTJForCausalLM, rtol=5e-3)


def test_falcon_mqa():
    from transformers import FalconConfig, FalconForCausalLM
    cfg = FalconConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, multi_query=True,
                       parallel_attn=True, bias=False,
                       new_decoder_architecture=False,
                       max_position_embeddings=256)
    _roundtrip(cfg, FalconForCausalLM, rtol=5e-3)


def test_falcon_new_arch():
    from transformers import FalconConfig, FalconForCausalLM
    cfg = FalconConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, num_kv_heads=2,
                       new_decoder_architecture=True,
                       max_position_embeddings=256)
    _roundtrip(cfg, FalconForCausalLM, rtol=5e-3)


def test_starcoder2():
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    cfg = Starcoder2Config(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=256, sliding_window=16,
                           tie_word_embeddings=False)
    _roundtrip(cfg, Starcoder2ForCausalLM, rtol=5e-3)


def test_nemotron():
    from transformers import NemotronConfig, NemotronForCausalLM
    cfg = NemotronConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256,
                         partial_rotary_factor=0.5,
                         tie_word_embeddings=False)
    _roundtrip(cfg, NemotronForCausalLM, rtol=5e-3)


def test_qwen2_moe():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    cfg = Qwen2MoeConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, moe_intermediate_size=48,
                         shared_expert_intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, num_experts=4,
                         num_experts_per_tok=2, norm_topk_prob=False,
                         max_position_embeddings=256,
                         decoder_sparse_step=1, mlp_only_layers=[],
                         tie_word_embeddings=False)
    _roundtrip(cfg, Qwen2MoeForCausalLM, rtol=5e-3)


def test_qwen3_moe():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    cfg = Qwen3MoeConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, moe_intermediate_size=48,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         num_experts=4, num_experts_per_tok=2,
                         norm_topk_prob=True,
                         max_position_embeddings=256,
                         tie_word_embeddings=False)
    _roundtrip(cfg, Qwen3MoeForCausalLM, rtol=5e-3)


def test_cohere():
    from transformers import CohereConfig, CohereForCausalLM
    cfg = CohereConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       max_position_embeddings=256, logit_scale=0.25,
                       use_qk_norm=False)
    _roundtrip(cfg, CohereForCausalLM, rtol=5e-3)
