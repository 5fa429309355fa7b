"""DeepSeek-V3 (MLA + MoE) parity vs HF transformers + e2e greedy."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def tiny_cfg():
    from transformers import DeepseekV3Config
    return DeepseekV3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, first_k_dense_replace=1,
        n_group=1, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=1.0, max_position_embeddings=256)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import DeepseekV3ForCausalLM
    torch.manual_seed(0)
    cfg = tiny_cfg()
    tmodel = DeepseekV3ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    mc = ModelConfig(hf_config=cfg, dtype=jnp.float32)
    model = get_model_class("deepseek_v3")(mc)
    params = model.load_hf_state_dict(sd)
    return model, params, tmodel, cfg


def hf_logits(tmodel, tokens):
    import torch
    with torch.no_grad():
        return tmodel(torch.tensor([tokens])).logits[0].numpy()


def test_mla_prefill_matches_hf(pair):
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32), kv, md)
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=5e-3, atol=5e-3)


def test_mla_decode_matches_prefill(pair):
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 11))
    T0 = 5
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, T0)
    _, kv = model.forward(params, jnp.asarray(tokens[:T0], jnp.int32), kv, md)
    logits = None
    for t in range(T0, len(tokens)):
        md = make_prefill_metadata(model, 1, start_pos=t)
        logits, kv = model.forward(params,
                                   jnp.asarray([tokens[t]], jnp.int32),
                                   kv, md)
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=5e-3, atol=5e-3)


def test_deepseek_e2e(pair):
    import torch
    _, _, tmodel, cfg = pair
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=32, max_seq_len=64,
              max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=512))
    prompt = [5, 9, 23, 44]
    out = llm.generate(prompt, SamplingParams(max_tokens=5, top_k=1))
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(5):
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    assert out.outputs[0].token_ids == ids[len(prompt):]
    llm.shutdown()


def test_mla_absorbed_matches_decompressed(pair):
    """The absorbed-weight decode path (attention in latent space via
    W_UK/W_UV; reference: attention.py:1169) must agree numerically with
    the decompress-through-kv_b path on the same decode step."""
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 10))
    T0 = len(tokens) - 1
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, T0)
    _, kv = model.forward(params, jnp.asarray(tokens[:T0], jnp.int32),
                          kv, md)
    md1 = make_prefill_metadata(model, 1, start_pos=T0)
    # decode-shaped (T == S == 1): absorbed path
    assert "uk" in params["moe_layers"]
    la, _ = model.forward(params, jnp.asarray(tokens[T0:], jnp.int32),
                          kv, md1)
    # strip uk/uv -> non-absorbed path on identical inputs
    import copy
    p2 = {k: (dict(v) if isinstance(v, dict) else v)
          for k, v in params.items()}
    for grp in ("dense_layers", "moe_layers"):
        if p2[grp] is not None:
            p2[grp] = {k: v for k, v in p2[grp].items()
                       if k not in ("uk", "uv")}
    lb, _ = model.forward(p2, jnp.asarray(tokens[T0:], jnp.int32),
                          kv, md1)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-4, atol=2e-4)
