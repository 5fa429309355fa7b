"""GPT-OSS parity vs HF + e2e greedy (reference:
modeling_gpt_oss.py — attention sinks, alternating sliding/full
attention, clamped-SwiGLU MoE with biases, YaRN rope)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def tiny_gpt_oss_cfg(**kw):
    from transformers import GptOssConfig
    base = dict(vocab_size=96, hidden_size=64, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=16, num_local_experts=4,
                num_experts_per_tok=2, sliding_window=8,
                rope_scaling=None, max_position_embeddings=256)
    base.update(kw)
    return GptOssConfig(**base)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import GptOssForCausalLM
    torch.manual_seed(0)
    cfg = tiny_gpt_oss_cfg()
    tmodel = GptOssForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("gpt_oss")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    return model, model.load_hf_state_dict(sd), tmodel


def test_gpt_oss_prefill_and_decode(pair):
    import torch
    model, params, tmodel = pair
    tokens = list(range(2, 20))            # > window: sliding engaged
    kv = model.make_kv_pages(16, 16)
    logits, kv = model.forward(params, jnp.asarray(tokens, jnp.int32), kv,
                               make_prefill_metadata(model, len(tokens)))
    with torch.no_grad():
        ref = tmodel(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)
    t2 = tokens + [20, 21]
    for t in range(len(tokens), len(t2)):
        logits, kv = model.forward(
            params, jnp.asarray([t2[t]], jnp.int32), kv,
            make_prefill_metadata(model, 1, start_pos=t))
    with torch.no_grad():
        ref2 = tmodel(torch.tensor([t2])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref2,
                               rtol=3e-3, atol=3e-3)


def test_gpt_oss_yarn_parity():
    """Default GPT-OSS rope is YaRN (factor 32, truncate False)."""
    import torch
    from transformers import GptOssForCausalLM
    torch.manual_seed(0)
    cfg = tiny_gpt_oss_cfg(rope_scaling={
        "rope_type": "yarn", "factor": 32.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "truncate": False,
        "original_max_position_embeddings": 4096},
        max_position_embeddings=4096 * 32)
    tmodel = GptOssForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("gpt_oss")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    tokens = list(range(2, 20))
    kv = model.make_kv_pages(16, 16)
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32), kv,
                              make_prefill_metadata(model, len(tokens)))
    with torch.no_grad():
        ref = tmodel(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_gpt_oss_e2e_greedy(pair):
    import torch
    _, _, tmodel = pair
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=32, max_seq_len=64,
              max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=512))
    prompt = [5, 9, 23, 44, 17]
    out = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1,
                                              end_id=-1))
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(6):
            logits = tmodel(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    assert out.outputs[0].token_ids == ids[len(prompt):]
    llm.shutdown()
