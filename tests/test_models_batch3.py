"""Model parity batch 3: Gemma3, GLM, GLM-4, EXAONE-4, SmolLM3,
Helium, Arcee vs HF transformers (torch CPU, shared random weights)."""
import pytest

from tests.test_models_extra import _roundtrip


def test_gemma3():
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    cfg = Gemma3TextConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=7,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=16, query_pre_attn_scalar=16,
                           sliding_window=8, max_position_embeddings=256,
                           rope_theta=1_000_000.0,
                           rope_local_base_freq=10_000.0)
    # 7 layers → both a global (idx 5) and sliding layers exercise
    _roundtrip(cfg, Gemma3ForCausalLM, rtol=5e-3)


def test_glm():
    from transformers import GlmConfig, GlmForCausalLM
    cfg = GlmConfig(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=16,
                    partial_rotary_factor=0.5, attention_bias=True,
                    max_position_embeddings=256,
                    tie_word_embeddings=False)
    _roundtrip(cfg, GlmForCausalLM)


def test_glm4():
    from transformers import Glm4Config, Glm4ForCausalLM
    cfg = Glm4Config(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16,
                     partial_rotary_factor=0.5, attention_bias=True,
                     max_position_embeddings=256,
                     tie_word_embeddings=False)
    _roundtrip(cfg, Glm4ForCausalLM)


def test_exaone4():
    from transformers import Exaone4Config, Exaone4ForCausalLM
    cfg = Exaone4Config(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=5,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, sliding_window=8,
                        sliding_window_pattern=4,
                        max_position_embeddings=256,
                        tie_word_embeddings=False)
    _roundtrip(cfg, Exaone4ForCausalLM, rtol=5e-3)


def test_exaone4_no_sliding():
    from transformers import Exaone4Config, Exaone4ForCausalLM
    cfg = Exaone4Config(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, sliding_window=None,
                        layer_types=["full_attention"] * 2,
                        max_position_embeddings=256,
                        tie_word_embeddings=False)
    _roundtrip(cfg, Exaone4ForCausalLM)


def test_smollm3():
    from transformers import SmolLM3Config, SmolLM3ForCausalLM
    cfg = SmolLM3Config(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2,
                        no_rope_layers=[1, 1, 1, 0],
                        max_position_embeddings=256,
                        tie_word_embeddings=False)
    _roundtrip(cfg, SmolLM3ForCausalLM)


def test_helium():
    from transformers import HeliumConfig, HeliumForCausalLM
    cfg = HeliumConfig(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, max_position_embeddings=256,
                       tie_word_embeddings=False)
    _roundtrip(cfg, HeliumForCausalLM)


def test_arcee():
    from transformers import ArceeConfig, ArceeForCausalLM
    cfg = ArceeConfig(vocab_size=128, pad_token_id=0, eos_token_id=1, bos_token_id=2, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    _roundtrip(cfg, ArceeForCausalLM)


def test_olmoe():
    from transformers import OlmoeConfig, OlmoeForCausalLM
    cfg = OlmoeConfig(vocab_size=128, pad_token_id=0, eos_token_id=1,
                      bos_token_id=2, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_experts=4,
                      num_experts_per_tok=2, norm_topk_prob=False,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    _roundtrip(cfg, OlmoeForCausalLM, rtol=5e-3)


def test_olmoe_norm_topk():
    from transformers import OlmoeConfig, OlmoeForCausalLM
    cfg = OlmoeConfig(vocab_size=128, pad_token_id=0, eos_token_id=1,
                      bos_token_id=2, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_experts=4,
                      num_experts_per_tok=2, norm_topk_prob=True,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    _roundtrip(cfg, OlmoeForCausalLM, rtol=5e-3)


def test_granitemoe():
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM
    cfg = GraniteMoeConfig(vocab_size=128, pad_token_id=0, eos_token_id=1,
                           bos_token_id=2, hidden_size=64,
                           intermediate_size=96, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           num_local_experts=4, num_experts_per_tok=2,
                           embedding_multiplier=6.0,
                           attention_multiplier=0.3,
                           residual_multiplier=0.22, logits_scaling=4.0,
                           max_position_embeddings=256,
                           tie_word_embeddings=False)
    _roundtrip(cfg, GraniteMoeForCausalLM, rtol=5e-3)


def test_cohere2():
    from transformers import Cohere2Config, Cohere2ForCausalLM
    cfg = Cohere2Config(vocab_size=128, pad_token_id=0, eos_token_id=1,
                        bos_token_id=2, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=4,
                        head_dim=16, sliding_window=8,
                        sliding_window_pattern=4, logit_scale=0.25,
                        max_position_embeddings=256)
    _roundtrip(cfg, Cohere2ForCausalLM, rtol=5e-3)


def test_stablelm():
    from transformers import StableLmConfig, StableLmForCausalLM
    cfg = StableLmConfig(vocab_size=128, pad_token_id=0, eos_token_id=1,
                         bos_token_id=2, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         partial_rotary_factor=0.25,
                         max_position_embeddings=256,
                         tie_word_embeddings=False)
    _roundtrip(cfg, StableLmForCausalLM)


def test_bloom():
    from transformers import BloomConfig, BloomForCausalLM
    cfg = BloomConfig(vocab_size=128, hidden_size=64, n_head=4,
                      n_layer=2, pad_token_id=0, eos_token_id=1,
                      bos_token_id=2)
    _roundtrip(cfg, BloomForCausalLM, rtol=5e-3)


def test_mpt():
    from transformers import MptConfig, MptForCausalLM
    cfg = MptConfig(vocab_size=128, d_model=64, n_heads=4, n_layers=2,
                    expansion_ratio=2, max_seq_len=256)
    _roundtrip(cfg, MptForCausalLM, rtol=5e-3)


def test_opt():
    from transformers import OPTConfig, OPTForCausalLM
    cfg = OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=256, word_embed_proj_dim=64,
                    pad_token_id=0, eos_token_id=1, bos_token_id=2,
                    do_layer_norm_before=True)
    _roundtrip(cfg, OPTForCausalLM)
