"""GLM-4.5V parity + e2e: bicubic grid-sampled ViT positions, conv
downsample, GELU+swiglu merger, chunked M-RoPE over GLM's partial
interleaved rotary (reference: modeling_glm4v.py)."""
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
    from transformers import Glm4vConfig
    return Glm4vConfig(
        text_config=dict(vocab_size=160, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=512,
                         partial_rotary_factor=0.5,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 1, 1]},
                         rope_theta=10000.0),
        vision_config=dict(depth=2, hidden_size=32, out_hidden_size=64,
                           num_heads=4, intermediate_size=48,
                           patch_size=4, temporal_patch_size=2,
                           spatial_merge_size=2, image_size=16,
                           in_channels=3, attention_bias=True),
        image_token_id=151, video_token_id=152,
        image_start_token_id=153, image_end_token_id=154)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import Glm4vForConditionalGeneration
    torch.manual_seed(0)
    cfg = tiny_cfg()
    tmodel = Glm4vForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("glm4v")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    px = torch.randn(16, 3 * 2 * 4 * 4)
    return model, params, tmodel, px


def test_glm4v_tower(pair):
    import torch
    model, params, tmodel, px = pair
    with torch.no_grad():
        ref = tmodel.model.visual(px, grid_thw=torch.tensor([GRID]))
    mine = model.encode_images(px.numpy(), [GRID])
    np.testing.assert_allclose(mine, ref.numpy(), rtol=2e-4, atol=2e-4)


def test_glm4v_tower_non_native_grid(pair):
    """8x8 patch grid vs the 4x4 native table exercises the bicubic
    grid-sample interpolation off-grid."""
    import torch
    model, params, tmodel, px = pair
    big = torch.randn(64, 3 * 2 * 4 * 4)
    grid = (1, 8, 8)
    with torch.no_grad():
        ref = tmodel.model.visual(big, grid_thw=torch.tensor([grid]))
    mine = model.encode_images(big.numpy(), [grid])
    np.testing.assert_allclose(mine, ref.numpy(), rtol=3e-4, atol=3e-4)


def test_glm4v_prefill(pair):
    import torch
    model, params, tmodel, px = pair
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


def test_glm4v_e2e_greedy(pair):
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
    out = llm.generate(prompt, SamplingParams(max_tokens=4, top_k=1,
                                              end_id=-1))
    got = out.outputs[0].token_ids
    exp = llm.input_processor([1, 2, 153, 151, 154, 3, 4],
                              {"image": [px.numpy()],
                               "image_grid_thw": [GRID]})[0]
    cur = torch.tensor([exp])
    ref_ids = []
    with torch.no_grad():
        for _ in range(4):
            logits = tmodel(input_ids=cur, pixel_values=px,
                            image_grid_thw=torch.tensor([GRID])
                            ).logits[0, -1]
            nxt = int(torch.argmax(logits))
            ref_ids.append(nxt)
            cur = torch.cat([cur, torch.tensor([[nxt]])], dim=1)
    llm.shutdown()
    assert got == ref_ids
