"""MiniMax-Text (lightning linear attention hybrid) parity vs HF + e2e
(reference: modeling_minimaxm2.py; the decayed-linear recurrence rides
ssd_scan)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def tiny_cfg():
    from transformers import MiniMaxConfig
    return MiniMaxConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        layer_types=["linear_attention", "full_attention"] * 2,
        head_dim=16, max_position_embeddings=256, block_size=8)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import MiniMaxForCausalLM
    torch.manual_seed(0)
    cfg = tiny_cfg()
    tmodel = MiniMaxForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("minimax")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    model._num_slots = 4
    return model, model.load_hf_state_dict(sd), tmodel


def _md(model, Tq, start=0):
    md = make_prefill_metadata(model, Tq, start_pos=start)
    S = md.kv_lens.shape[0]
    return dataclasses.replace(
        md, seq_slots=jnp.asarray([0] + [-1] * (S - 1), jnp.int32))


def test_minimax_prefill_and_decode(pair):
    import torch
    model, params, tmodel = pair
    tokens = list(range(2, 14))
    cache = model.make_kv_pages(16, 16)
    logits, cache = model.forward(params, jnp.asarray(tokens, jnp.int32),
                                  cache, _md(model, len(tokens)))
    with torch.no_grad():
        ref = tmodel(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)
    t2 = tokens + [20, 21]
    for t in range(len(tokens), len(t2)):
        logits, cache = model.forward(
            params, jnp.asarray([t2[t]], jnp.int32), cache,
            _md(model, 1, start=t))
    with torch.no_grad():
        ref2 = tmodel(torch.tensor([t2])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref2,
                               rtol=3e-3, atol=3e-3)


def test_minimax_e2e_greedy(pair):
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
