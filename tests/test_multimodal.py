"""Multimodal: CLIP tower parity, LLaVA e2e vs HF greedy, mm-hash reuse
keys (reference: tests/unittest/_torch/multimodal/)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


def _clip_cfg():
    from transformers import CLIPVisionConfig
    return CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=16, patch_size=8)


def test_clip_tower_parity():
    import torch
    from transformers import CLIPVisionModel
    from tensorrt_llm_tpu.multimodal.encoders import VisionTower

    torch.manual_seed(0)
    cfg = _clip_cfg()
    hf = CLIPVisionModel(cfg).eval()
    tower = VisionTower(cfg, flavor="clip")
    sd = {"vision_model." + k: v.numpy()
          for k, v in hf.vision_model.state_dict().items()}
    params = tower.load_hf_state_dict(sd)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(pixels), output_hidden_states=True)
    # final layer hidden states (post-LN is pooled-CLS-only in HF)
    ours = np.asarray(tower(params, pixels, feature_layer=-1))
    ref = out.hidden_states[-1].numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    # penultimate features (llava's vision_feature_layer=-2, no post-LN)
    ours2 = np.asarray(tower(params, pixels, feature_layer=-2))
    ref2 = out.hidden_states[-2].numpy()
    np.testing.assert_allclose(ours2, ref2, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def llava_pair():
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    torch.manual_seed(0)
    tc = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=256,
                     pad_token_id=0, eos_token_id=1, bos_token_id=2)
    cfg = LlavaConfig(vision_config=_clip_cfg(), text_config=tc,
                      image_token_index=120, vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      pad_token_id=0)
    return LlavaForConditionalGeneration(cfg).eval()


def test_llava_e2e_matches_hf(llava_pair):
    import torch
    hf = llava_pair
    rng = np.random.default_rng(1)
    image = rng.standard_normal((3, 16, 16)).astype(np.float32)
    n_img_tokens = (16 // 8) ** 2            # 4 patches
    prompt = [5, 9] + [120] * n_img_tokens + [23, 44, 17]

    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(image)[None],
            max_new_tokens=8, do_sample=False)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=hf, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    got = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"image": [image]}},
        SamplingParams(max_tokens=8, top_k=1, end_id=-1)
    ).outputs[0].token_ids
    llm.shutdown()
    assert got[:len(ref)] == ref


def test_llava_single_placeholder_expansion(llava_pair):
    """A single <image> marker auto-expands to tokens_per_image."""
    llm = LLM(model=llava_pair, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    rng = np.random.default_rng(2)
    image = rng.standard_normal((3, 16, 16)).astype(np.float32)
    out = llm.generate(
        {"prompt_token_ids": [5, 120, 7],
         "multi_modal_data": {"image": [image]}},
        SamplingParams(max_tokens=4, top_k=1, end_id=-1))
    # 3 prompt tokens -> 2 text + 4 image tokens after expansion
    assert len(out.prompt_token_ids) == 6
    assert len(out.outputs[0].token_ids) == 4
    llm.shutdown()


def test_mm_hash_distinguishes_images(llava_pair):
    from tensorrt_llm_tpu.multimodal import mm_hash
    a = np.zeros((3, 16, 16), np.float32)
    b = np.ones((3, 16, 16), np.float32)
    assert mm_hash([a]) != mm_hash([b])
    assert mm_hash([a]) == mm_hash([a.copy()])


def test_llava_next_anyres_parity():
    """Anyres tiling: tile features reassembled, unpadded, newline
    columns added; token expansion matches HF's expected count and
    logits match exactly (reference: modeling_llava_next.py
    pack_image_features)."""
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.multimodal.processor import create_input_processor
    from tests.test_models import make_prefill_metadata

    torch.manual_seed(0)
    vis = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=16, patch_size=8, projection_dim=32)
    txt = LlamaConfig(vocab_size=64, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    cfg = LlavaNextConfig(vision_config=vis.to_dict(),
                          text_config=txt.to_dict(), image_token_index=63,
                          image_grid_pinpoints=[[16, 32], [32, 16],
                                                [32, 32]],
                          vision_feature_layer=-2,
                          vision_feature_select_strategy="default")
    tmodel = LlavaNextForConditionalGeneration(cfg).eval()
    from transformers.models.llava_next.modeling_llava_next import (
        image_size_to_num_patches)
    img_size = (20, 28)
    n_tiles = image_size_to_num_patches(img_size, cfg.image_grid_pinpoints,
                                        vis.image_size)
    px = torch.randn(1, n_tiles, 3, 16, 16)

    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("llava_next")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    proc = create_input_processor(model)
    ids, embeds, salt = proc([1, 2, 63, 3, 4],
                             {"image": [px[0].numpy()],
                              "image_sizes": [img_size]})
    assert salt.startswith("mm-")
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([ids]), pixel_values=px,
                     image_sizes=torch.tensor([img_size])
                     ).logits[0, -1].numpy()
    kv = model.make_kv_pages(32, 16)
    md = make_prefill_metadata(model, len(ids))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32), kv, md,
                              input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_mistral3_pixtral_parity():
    """Pixtral tower (variable-size 2D-rope ViT) + Mistral3 patch-merge
    projector; exact HF logits parity (reference:
    modeling_pixtral.py / modeling_mistral.py Mistral3 path)."""
    import torch
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.multimodal.processor import create_input_processor
    from tests.test_models import make_prefill_metadata

    torch.manual_seed(0)
    cfg = Mistral3Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8, num_channels=3,
                           head_dim=8, rope_theta=10000.0),
        text_config=dict(vocab_size=96, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256),
        image_token_index=95, spatial_merge_size=2,
        vision_feature_layer=-1, multimodal_projector_bias=False)
    tmodel = Mistral3ForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("mistral3")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    params = model.load_hf_state_dict(sd)
    img = torch.randn(3, 32, 16)       # non-square: exercises 2D rope
    proc = create_input_processor(model)
    ids, embeds, salt = proc([1, 2, 95, 3, 4], {"image": [img.numpy()]})
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([ids]), pixel_values=img[None],
                     image_sizes=torch.tensor([[32, 16]])
                     ).logits[0, -1].numpy()
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(ids))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32), kv, md,
                              input_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def test_internvl_parity():
    """InternVL: layerscale ViT + pixel-shuffle projector; exact HF
    logits parity (both qk-norm modes of the tower)."""
    import torch
    from transformers import InternVLConfig, InternVLForConditionalGeneration
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.multimodal.processor import create_input_processor
    from tests.test_models import make_prefill_metadata

    for qk in (False, True):
        torch.manual_seed(0)
        cfg = InternVLConfig(
            text_config=dict(model_type="qwen2", vocab_size=96,
                             hidden_size=48, intermediate_size=96,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2,
                             max_position_embeddings=256),
            vision_config=dict(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=2, num_attention_heads=4,
                               image_size=[16, 16], patch_size=[4, 4],
                               use_qk_norm=qk),
            image_token_id=95, downsample_ratio=0.5,
            vision_feature_layer=-1,
            vision_feature_select_strategy="default")
        tmodel = InternVLForConditionalGeneration(cfg).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in tmodel.state_dict().items()}
        model = get_model_class("internvl")(
            ModelConfig(hf_config=cfg, dtype=jnp.float32))
        params = model.load_hf_state_dict(sd)
        img = torch.randn(1, 3, 16, 16)
        proc = create_input_processor(model)
        ids, embeds, _ = proc([1, 2, 95, 3, 4], {"image": [img[0].numpy()]})
        with torch.no_grad():
            ref = tmodel(input_ids=torch.tensor([ids]),
                         pixel_values=img).logits[0, -1].numpy()
        kv = model.make_kv_pages(16, 16)
        md = make_prefill_metadata(model, len(ids))
        logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32),
                                  kv, md, input_embeds=jnp.asarray(embeds))
        np.testing.assert_allclose(np.asarray(logits)[0], ref,
                                   rtol=3e-3, atol=3e-3)
