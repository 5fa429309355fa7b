"""Qwen3-VL parity + e2e: interpolated-pos ViT, deepstack feature
injection (wide prompt-embeds columns → per-layer adds in the llama
scan), interleaved M-RoPE (reference: modeling_qwen3vl.py)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tensorrt_llm_tpu.multimodal.processor import create_input_processor
from tests.test_models import make_prefill_metadata

GRID = (1, 4, 4)


def tiny_cfg():
    from transformers import Qwen3VLConfig
    return Qwen3VLConfig(
        text_config=dict(vocab_size=160, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=3,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=512,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [3, 3, 2],
                                       "mrope_interleaved": True},
                         rope_theta=10000.0),
        vision_config=dict(depth=3, hidden_size=32, out_hidden_size=64,
                           num_heads=4, intermediate_size=48,
                           patch_size=4, temporal_patch_size=2,
                           spatial_merge_size=2,
                           deepstack_visual_indexes=[0, 1],
                           num_position_embeddings=16, in_channels=3),
        image_token_id=151, video_token_id=152,
        vision_start_token_id=153)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import Qwen3VLForConditionalGeneration
    torch.manual_seed(0)
    cfg = tiny_cfg()
    tmodel = Qwen3VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("qwen3_vl")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    px = torch.randn(16, 3 * 2 * 4 * 4)
    return model, params, tmodel, px


def test_qwen3_vl_tower_and_prefill(pair):
    import torch
    model, params, tmodel, px = pair
    with torch.no_grad():
        ref_main, ref_ds = tmodel.model.visual(
            px, grid_thw=torch.tensor([GRID]))
    mine_main, mine_ds = model.encode_images(px.numpy(), [GRID])
    np.testing.assert_allclose(mine_main, ref_main.numpy(),
                               rtol=2e-4, atol=2e-4)
    for k in range(2):
        np.testing.assert_allclose(mine_ds[k], ref_ds[k].numpy(),
                                   rtol=2e-4, atol=2e-4)
    proc = create_input_processor(model)
    ids, embeds, _, extra = proc([1, 2, 153, 151, 154, 3, 4],
                                 {"image": [px.numpy()],
                                  "image_grid_thw": [GRID]})
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([ids]), pixel_values=px,
                     image_grid_thw=torch.tensor([GRID])
                     ).logits[0, -1].numpy()
    kv = model.make_kv_pages(16, 16)
    md = dataclasses.replace(
        make_prefill_metadata(model, len(ids)),
        positions_mrope=jnp.asarray(extra["mrope_positions"]))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32), kv,
                              md, input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_qwen3_vl_e2e_greedy(pair):
    """Engine path: wide prompt embeds (prompt_embeds_width) + mrope
    rows + deepstack adds; greedy matches HF."""
    import torch
    _, _, tmodel, px = pair
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    prompt = {"prompt_token_ids": [1, 2, 153, 151, 154, 3, 4],
              "multi_modal_data": {"image": [px.numpy()],
                                   "image_grid_thw": [GRID]}}
    # 3 tokens: the random tiny model develops near-tie logits past
    # that (top-2 gap < 0.02), where fp32 op-order flips argmax
    out = llm.generate(prompt, SamplingParams(max_tokens=3, top_k=1,
                                              end_id=-1))
    got = out.outputs[0].token_ids
    exp = llm.input_processor([1, 2, 153, 151, 154, 3, 4],
                              {"image": [px.numpy()],
                               "image_grid_thw": [GRID]})[0]
    cur = torch.tensor([exp])
    ref_ids = []
    with torch.no_grad():
        for _ in range(3):
            logits = tmodel(input_ids=cur, pixel_values=px,
                            image_grid_thw=torch.tensor([GRID])
                            ).logits[0, -1]
            nxt = int(torch.argmax(logits))
            ref_ids.append(nxt)
            cur = torch.cat([cur, torch.tensor([[nxt]])], dim=1)
    llm.shutdown()
    assert got == ref_ids


def test_qwen3_vl_moe_prefill():
    """Qwen3-VL-MoE: glue mixin over the MoE text model; fused expert
    tensors unfused at load; deepstack through the mixtral scan."""
    import torch
    from transformers import (Qwen3VLMoeConfig,
                              Qwen3VLMoeForConditionalGeneration)
    torch.manual_seed(0)
    cfg = Qwen3VLMoeConfig(
        text_config=dict(vocab_size=160, hidden_size=64,
                         moe_intermediate_size=32, intermediate_size=128,
                         num_hidden_layers=3, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         num_experts=4, num_experts_per_tok=2,
                         decoder_sparse_step=1, norm_topk_prob=True,
                         max_position_embeddings=512,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [3, 3, 2],
                                       "mrope_interleaved": True},
                         rope_theta=10000.0),
        vision_config=dict(depth=3, hidden_size=32, out_hidden_size=64,
                           num_heads=4, intermediate_size=48,
                           patch_size=4, temporal_patch_size=2,
                           spatial_merge_size=2,
                           deepstack_visual_indexes=[0, 1],
                           num_position_embeddings=16, in_channels=3),
        image_token_id=151, video_token_id=152,
        vision_start_token_id=153)
    tmodel = Qwen3VLMoeForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("qwen3_vl_moe")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    px = torch.randn(16, 3 * 2 * 4 * 4)
    proc = create_input_processor(model)
    ids, embeds, _, extra = proc([1, 2, 153, 151, 154, 3, 4],
                                 {"image": [px.numpy()],
                                  "image_grid_thw": [GRID]})
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([ids]), pixel_values=px,
                     image_grid_thw=torch.tensor([GRID])
                     ).logits[0, -1].numpy()
    kv = model.make_kv_pages(16, 16)
    md = dataclasses.replace(
        make_prefill_metadata(model, len(ids)),
        positions_mrope=jnp.asarray(extra["mrope_positions"]))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32), kv,
                              md, input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)
