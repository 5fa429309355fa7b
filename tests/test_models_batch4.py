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
