"""Gemma3-VL parity + e2e: SigLIP tower, avg-pool projector, and the
bidirectional image-span attention mask (HF token_type_ids or-mask)
through the persistent per-kv-slot group pool (reference:
modeling_gemma3vl.py / modeling_gemma3.py)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tensorrt_llm_tpu.multimodal.processor import create_input_processor
from tests.test_models import make_prefill_metadata


def tiny_cfg():
    from transformers import (Gemma3Config, Gemma3TextConfig,
                              SiglipVisionConfig)
    vis = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=16, patch_size=4)
    txt = Gemma3TextConfig(vocab_size=260, hidden_size=48,
                           intermediate_size=96, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=16, query_pre_attn_scalar=16,
                           sliding_window=8, max_position_embeddings=256,
                           rope_theta=1_000_000.0,
                           rope_local_base_freq=10_000.0)
    return Gemma3Config(vision_config=vis.to_dict(),
                        text_config=txt.to_dict(), image_token_index=255,
                        boi_token_index=253, eoi_token_index=254,
                        mm_tokens_per_image=4)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import Gemma3ForConditionalGeneration
    torch.manual_seed(0)
    cfg = tiny_cfg()
    tmodel = Gemma3ForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("gemma3")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    img = torch.randn(1, 3, 16, 16)
    return model, params, tmodel, img


def test_gemma3_vl_prefill_parity(pair):
    import torch
    model, params, tmodel, img = pair
    proc = create_input_processor(model)
    prompt = [2, 5, 253, 255, 254, 7, 9]
    ids, embeds, salt, extra = proc(prompt, {"image": [img[0].numpy()]})
    ttype = torch.tensor([[1 if t == 255 else 0 for t in ids]])
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([ids]), pixel_values=img,
                     token_type_ids=ttype).logits[0, -1].numpy()
    cache = model.make_kv_pages(16, 16)
    md = dataclasses.replace(
        make_prefill_metadata(model, len(ids)),
        mm_groups_q=jnp.asarray(extra["mm_group_ids"]))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32), cache,
                              md, input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=5e-3, atol=5e-3)


def test_gemma3_vl_e2e_greedy(pair):
    """Full engine path: mm_group_ids extras → ints_t row → group pool
    scatter; greedy continuation matches HF with token_type mask."""
    import torch
    _, _, tmodel, img = pair
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    prompt = {"prompt_token_ids": [2, 5, 253, 255, 254, 7, 9],
              "multi_modal_data": {"image": [img[0].numpy()]}}
    out = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1,
                                              end_id=-1))
    got = out.outputs[0].token_ids

    exp = llm.input_processor([2, 5, 253, 255, 254, 7, 9],
                              {"image": [img[0].numpy()]})[0]
    cur = torch.tensor([exp])
    ref_ids = []
    with torch.no_grad():
        for _ in range(6):
            ttype = torch.tensor([[1 if t == 255 else 0
                                   for t in cur[0].tolist()]])
            logits = tmodel(input_ids=cur, pixel_values=img,
                            token_type_ids=ttype).logits[0, -1]
            nxt = int(torch.argmax(logits))
            ref_ids.append(nxt)
            cur = torch.cat([cur, torch.tensor([[nxt]])], dim=1)
    llm.shutdown()
    assert got == ref_ids


def test_paligemma_prefix_lm_parity():
    """PaliGemma-2: whole-prompt bidirectional prefix (group 0 on every
    prompt token) + causal decode; exact HF parity both phases."""
    import torch
    from transformers import (Gemma2Config, PaliGemmaConfig,
                              PaliGemmaForConditionalGeneration,
                              SiglipVisionConfig)
    torch.manual_seed(0)
    vis = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=16, patch_size=4,
                             projection_dim=48)
    txt = Gemma2Config(vocab_size=260, hidden_size=48,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, query_pre_attn_scalar=16,
                       sliding_window=8, max_position_embeddings=256)
    cfg = PaliGemmaConfig(vision_config=vis.to_dict(),
                          text_config=txt.to_dict(), image_token_index=255,
                          projection_dim=48)
    tmodel = PaliGemmaForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("paligemma")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    img = torch.randn(1, 3, 16, 16)
    proc = create_input_processor(model)
    ids, embeds, _, extra = proc([2, 5, 255, 7, 9],
                                 {"image": [img[0].numpy()]})
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([ids]),
                     pixel_values=img).logits[0, -1].numpy()
    cache = model.make_kv_pages(16, 16)
    md = dataclasses.replace(
        make_prefill_metadata(model, len(ids)),
        mm_groups_q=jnp.asarray(extra["mm_group_ids"]))
    logits, cache = model.forward(params, jnp.asarray(ids, jnp.int32),
                                  cache, md,
                                  input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=5e-3, atol=5e-3)
    # causal decode continuation against HF cached stepwise decoding
    t2 = ids + [11, 13]
    for t in range(len(ids), len(t2)):
        md1 = dataclasses.replace(
            make_prefill_metadata(model, 1, start_pos=t),
            mm_groups_q=jnp.asarray([-1], jnp.int32))
        logits, cache = model.forward(
            params, jnp.asarray([t2[t]], jnp.int32), cache, md1)
    with torch.no_grad():
        out = tmodel(input_ids=torch.tensor([ids]), pixel_values=img,
                     use_cache=True)
        pkv = out.past_key_values
        for t in range(len(ids), len(t2)):
            out = tmodel(input_ids=torch.tensor([[t2[t]]]),
                         use_cache=True, past_key_values=pkv)
            pkv = out.past_key_values
    np.testing.assert_allclose(np.asarray(logits)[0],
                               out.logits[0, -1].detach().numpy(),
                               rtol=5e-3, atol=5e-3)
