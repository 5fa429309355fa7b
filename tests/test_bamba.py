"""Bamba (Mamba2+attention hybrid) parity vs HF + e2e greedy
(reference: the nemotron_h-style SSD hybrid family)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def tiny_bamba_config():
    from transformers import BambaConfig
    return BambaConfig(vocab_size=96, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=4,
                       num_attention_heads=4, num_key_value_heads=2,
                       attn_layer_indices=[1, 3], mamba_n_heads=4,
                       mamba_d_state=16, mamba_n_groups=2, mamba_expand=2,
                       mamba_d_conv=4, max_position_embeddings=256)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import BambaForCausalLM
    torch.manual_seed(0)
    cfg = tiny_bamba_config()
    tmodel = BambaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    mc = ModelConfig(hf_config=cfg, dtype=jnp.float32)
    model = get_model_class("bamba")(mc)
    model._num_slots = 4
    params = model.load_hf_state_dict(sd)
    return model, params, tmodel, cfg


def _md(model, Tq, start=0):
    md = make_prefill_metadata(model, Tq, start_pos=start)
    S = md.kv_lens.shape[0]
    return dataclasses.replace(
        md, seq_slots=jnp.asarray([0] + [-1] * (S - 1), jnp.int32))


def test_bamba_prefill_matches_hf(pair):
    import torch
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 14))
    cache = model.make_kv_pages(16, 16)
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32),
                              cache, _md(model, len(tokens)))
    with torch.no_grad():
        ref = tmodel(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_bamba_decode_matches_prefill(pair):
    import torch
    model, params, tmodel, cfg = pair
    tokens = list(range(2, 13))
    T0 = 6
    cache = model.make_kv_pages(16, 16)
    _, cache = model.forward(params, jnp.asarray(tokens[:T0], jnp.int32),
                             cache, _md(model, T0))
    logits = None
    for t in range(T0, len(tokens)):
        logits, cache = model.forward(
            params, jnp.asarray([tokens[t]], jnp.int32), cache,
            _md(model, 1, start=t))
    with torch.no_grad():
        ref = tmodel(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_bamba_e2e_greedy(pair):
    import torch
    _, _, tmodel, cfg = pair
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
