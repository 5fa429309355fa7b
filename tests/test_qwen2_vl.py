"""Qwen2-VL (M-RoPE vision-language) parity + e2e through the engine's
3-axis position plumbing (reference: modeling_qwen2vl.py;
get_rope_index / apply_multimodal_rotary_pos_emb semantics)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tensorrt_llm_tpu.multimodal.processor import create_input_processor
from tests.test_models import make_prefill_metadata

GRID = (1, 4, 4)


def tiny_qwen2vl_cfg():
    from transformers import Qwen2VLConfig
    return Qwen2VLConfig(
        text_config=dict(vocab_size=160, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=512,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 3, 3]},
                         rope_theta=10000.0),
        vision_config=dict(depth=2, embed_dim=32, num_heads=4,
                           hidden_size=64, patch_size=4,
                           temporal_patch_size=2, spatial_merge_size=2,
                           in_channels=3, mlp_ratio=2),
        image_token_id=151, video_token_id=152,
        vision_start_token_id=153, vision_end_token_id=154)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import Qwen2VLForConditionalGeneration
    torch.manual_seed(0)
    cfg = tiny_qwen2vl_cfg()
    tmodel = Qwen2VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("qwen2_vl")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    L = GRID[0] * GRID[1] * GRID[2]
    px = torch.randn(L, 3 * 2 * 4 * 4)
    return model, params, tmodel, px


def test_vision_tower_parity(pair):
    import torch
    model, _, tmodel, px = pair
    with torch.no_grad():
        ref = tmodel.model.visual(px, grid_thw=torch.tensor([GRID])).numpy()
    mine = np.asarray(model.encode_images(px.numpy(), [GRID]))
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_mrope_prefill_and_decode_parity(pair):
    import torch
    model, params, tmodel, px = pair
    proc = create_input_processor(model)
    ids, embeds, salt, extra = proc([1, 2, 153, 151, 154, 3, 4],
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
    logits, kv = model.forward(params, jnp.asarray(ids, jnp.int32), kv,
                               md, input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)
    t2 = ids + [7, 9]
    for t in range(len(ids), len(t2)):
        p3 = np.full((3, 1), t + extra["mrope_delta"], np.int32)
        md1 = dataclasses.replace(
            make_prefill_metadata(model, 1, start_pos=t),
            positions_mrope=jnp.asarray(p3))
        logits, kv = model.forward(params, jnp.asarray([t2[t]], jnp.int32),
                                   kv, md1)
    with torch.no_grad():
        ref2 = tmodel(input_ids=torch.tensor([t2]), pixel_values=px,
                      image_grid_thw=torch.tensor([GRID])
                      ).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref2,
                               rtol=3e-3, atol=3e-3)


def test_qwen2_vl_e2e_greedy(pair):
    """Full engine path: processor extras → request mrope fields →
    ints_t rows → step-fn metadata; greedy continuation matches HF."""
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
    out = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1,
                                              end_id=-1))
    got = out.outputs[0].token_ids

    # HF greedy reference over the expanded sequence
    with torch.no_grad():
        exp = llm.input_processor([1, 2, 153, 151, 154, 3, 4],
                                  {"image": [px.numpy()],
                                   "image_grid_thw": [GRID]})[0]
        cur = torch.tensor([exp])
        ref_ids = []
        for _ in range(6):
            logits = tmodel(input_ids=cur, pixel_values=px,
                            image_grid_thw=torch.tensor([GRID])
                            ).logits[0, -1]
            nxt = int(torch.argmax(logits))
            ref_ids.append(nxt)
            cur = torch.cat([cur, torch.tensor([[nxt]])], dim=1)
    llm.shutdown()
    assert got == ref_ids


def test_qwen25_vl_window_tower_parity():
    """Qwen2.5-VL: window-major reordering + window/full attention mix +
    RMSNorm/silu-gate tower; exact parity incl. the inverse
    permutation (reference: modeling_qwen2_5_vl.py get_window_index)."""
    import torch
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)
    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        text_config=dict(vocab_size=160, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=512,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 3, 3]},
                         rope_theta=10000.0),
        vision_config=dict(depth=2, hidden_size=32, out_hidden_size=64,
                           num_heads=4, intermediate_size=48, patch_size=4,
                           temporal_patch_size=2, spatial_merge_size=2,
                           window_size=16, fullatt_block_indexes=[1],
                           in_channels=3),
        image_token_id=151, video_token_id=152,
        vision_start_token_id=153, vision_end_token_id=154)
    tmodel = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("qwen2_5_vl")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    grid = (1, 8, 8)
    px = torch.randn(64, 3 * 2 * 4 * 4)
    with torch.no_grad():
        ref = tmodel.model.visual(px, grid_thw=torch.tensor([grid])).numpy()
    mine = np.asarray(model.encode_images(px.numpy(), [grid]))
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)

    proc = create_input_processor(model)
    ids, embeds, _, extra = proc([1, 2, 153, 151, 154, 3, 4],
                                 {"image": [px.numpy()],
                                  "image_grid_thw": [grid]})
    with torch.no_grad():
        ref_l = tmodel(input_ids=torch.tensor([ids]), pixel_values=px,
                       image_grid_thw=torch.tensor([grid])
                       ).logits[0, -1].numpy()
    kv = model.make_kv_pages(16, 16)
    md = dataclasses.replace(
        make_prefill_metadata(model, len(ids)),
        positions_mrope=jnp.asarray(extra["mrope_positions"]))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32), kv, md,
                              input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref_l,
                               rtol=3e-3, atol=3e-3)
