"""Model parity batch 4: SeedOSS, HunYuan v1 dense/MoE vs HF
transformers (reference: modeling_seedoss.py,
modeling_hunyuan_dense.py, modeling_hunyuan_moe.py)."""
import pytest

from tests.test_models_extra import _roundtrip


def test_seed_oss():
    from transformers import SeedOssConfig, SeedOssForCausalLM
    cfg = SeedOssConfig(vocab_size=96, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, max_position_embeddings=256)
    _roundtrip(cfg, SeedOssForCausalLM)


def test_hunyuan_dense():
    from transformers import (HunYuanDenseV1Config,
                              HunYuanDenseV1ForCausalLM)
    cfg = HunYuanDenseV1Config(vocab_size=96, hidden_size=64,
                               intermediate_size=128, num_hidden_layers=2,
                               num_attention_heads=4, num_key_value_heads=2,
                               head_dim=16, max_position_embeddings=256)
    _roundtrip(cfg, HunYuanDenseV1ForCausalLM)


def test_hunyuan_moe():
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM
    cfg = HunYuanMoEV1Config(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, num_experts=4, moe_topk=[2, 2],
                             max_position_embeddings=256)
    _roundtrip(cfg, HunYuanMoEV1ForCausalLM)


def test_glm4_moe():
    """GLM-4.5 family: GQA + partial rotary + optional qk norm +
    deepseek-style sigmoid/bias routing with shared experts."""
    import pytest as _pytest
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM
    for qk in (False, True):
        cfg = Glm4MoeConfig(vocab_size=96, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=3,
                            num_attention_heads=4, num_key_value_heads=2,
                            n_routed_experts=4, num_experts_per_tok=2,
                            moe_intermediate_size=32, n_shared_experts=1,
                            first_k_dense_replace=1, head_dim=16,
                            use_qk_norm=qk, max_position_embeddings=256)
        _roundtrip(cfg, Glm4MoeForCausalLM)


def test_deepseek_v2():
    """DeepSeek-V2: MLA + softmax/greedy (and group-limited) routing,
    no score-correction bias, HF's unapplied norm_topk quirk."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    for tk, ng, tg in (("greedy", 1, 1), ("group_limited_greedy", 2, 1)):
        cfg = DeepseekV2Config(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=48, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=4,
            n_routed_experts=4, num_experts_per_tok=2,
            n_shared_experts=1, q_lora_rank=32, kv_lora_rank=16,
            qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
            first_k_dense_replace=1, topk_method=tk, n_group=ng,
            topk_group=tg, norm_topk_prob=True,
            routed_scaling_factor=1.0, max_position_embeddings=256)
        _roundtrip(cfg, DeepseekV2ForCausalLM, rtol=5e-3)


def test_ernie4_5():
    """Ernie 4.5: llama body with GLM-style interleaved rotary."""
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM
    for bias in (False, True):
        cfg = Ernie4_5Config(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, use_bias=bias,
                             max_position_embeddings=256)
        _roundtrip(cfg, Ernie4_5ForCausalLM)


def test_ernie4_5_moe():
    """Ernie 4.5 MoE: softmax scores, bias-corrected selection,
    clamped renorm, shared experts."""
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM
    cfg = Ernie4_5_MoeConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=3,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, moe_num_experts=4, moe_k=2,
                             moe_intermediate_size=32,
                             moe_num_shared_experts=1,
                             moe_layer_start_index=1,
                             max_position_embeddings=256)
    _roundtrip(cfg, Ernie4_5_MoeForCausalLM)


def test_apertus():
    """Apertus: qk norms + gateless xIELU MLP."""
    from transformers import ApertusConfig, ApertusForCausalLM
    cfg = ApertusConfig(vocab_size=96, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=256)
    _roundtrip(cfg, ApertusForCausalLM, rtol=5e-4)


def test_longcat_flash():
    """LongCat-Flash ScMoE: dual MLA sublayers per layer, shortcut MoE
    with zero-computation (identity) experts, folded lora scales."""
    from transformers import LongcatFlashConfig, LongcatFlashForCausalLM
    cfg = LongcatFlashConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=4,
        n_routed_experts=4, moe_topk=2, expert_ffn_hidden_size=32,
        ffn_hidden_size=128, q_lora_rank=32, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        num_layers=2, zero_expert_num=2, head_dim=8,
        max_position_embeddings=256)
    _roundtrip(cfg, LongcatFlashForCausalLM, rtol=5e-3)
