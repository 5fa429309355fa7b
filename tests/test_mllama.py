"""Mllama (Llama 3.2 Vision) parity + e2e: tiled gated vision tower,
per-layer cross-attention K/V computed at admission, slot-indexed cross
cache, text-only skip (reference: modeling_mllama.py; verified with an
explicit all-ones cross_attention_mask — HF's mask-None path hits an
sdpa causal quirk that real processor inputs never exercise)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def tiny_cfg():
    from transformers import MllamaConfig
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)
    vis = MllamaVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_global_layers=1,
                             attention_heads=4, image_size=32,
                             patch_size=8, max_num_tiles=2,
                             supported_aspect_ratios=[[1, 1], [1, 2],
                                                      [2, 1]],
                             vision_output_dim=64,
                             intermediate_layers_indices=[1])
    txt = MllamaTextConfig(vocab_size=256, hidden_size=48,
                           intermediate_size=96, num_hidden_layers=4,
                           num_attention_heads=4, num_key_value_heads=2,
                           cross_attention_layers=[1, 3],
                           max_position_embeddings=256, pad_token_id=0,
                           rope_scaling={"rope_type": "default"})
    return MllamaConfig(vision_config=vis.to_dict(),
                        text_config=txt.to_dict(), image_token_index=250)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import MllamaForConditionalGeneration
    torch.manual_seed(0)
    cfg = tiny_cfg()
    tmodel = MllamaForConditionalGeneration(cfg).eval()
    with torch.no_grad():
        for li in (1, 3):     # zero-init gates would make the test vacuous
            lyr = tmodel.model.language_model.layers[li]
            lyr.cross_attn_attn_gate.fill_(0.7)
            lyr.cross_attn_mlp_gate.fill_(0.5)
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("mllama")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    model._num_slots = 4
    params = model.load_hf_state_dict(sd)
    import torch as _t
    px = _t.randn(1, 1, 2, 3, 32, 32)
    aids = _t.tensor([[2]])
    amask = _t.tensor([[[1, 1]]])
    return model, params, tmodel, (px, aids, amask)


def test_mllama_vision_and_prefill_parity(pair):
    import torch
    model, params, tmodel, (px, aids, amask) = pair
    with torch.no_grad():
        ref_v = tmodel.model.vision_model(
            pixel_values=px, aspect_ratio_ids=aids,
            aspect_ratio_mask=amask).last_hidden_state
        ref_states = tmodel.model.multi_modal_projector(ref_v) \
            .reshape(-1, 48)
    mine_states = model.encode_images(px[0].numpy(), aids[0].numpy(),
                                      amask[0].numpy())
    np.testing.assert_allclose(mine_states, ref_states.numpy(),
                               rtol=3e-4, atol=3e-4)

    prompt = [2, 5, 250, 7, 9, 11]
    cam = torch.ones(1, len(prompt), 1, 2, dtype=torch.long)
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor([prompt]), pixel_values=px,
                     aspect_ratio_ids=aids, aspect_ratio_mask=amask,
                     cross_attention_mask=cam).logits[0, -1].numpy()
    ks, vs = model.compute_cross_kv(params, mine_states)
    cache = model.make_kv_pages(16, 16)
    n = ks.shape[1]
    cache["cross_k"] = cache["cross_k"].at[:, 0, :n].set(ks)
    cache["cross_v"] = cache["cross_v"].at[:, 0, :n].set(vs)
    cache["cross_len"] = cache["cross_len"].at[0].set(n)
    md = make_prefill_metadata(model, len(prompt))
    S = md.kv_lens.shape[0]
    md = dataclasses.replace(
        md, seq_slots=jnp.asarray([0] + [-1] * (S - 1), jnp.int32))
    logits, _ = model.forward(params, jnp.asarray(prompt, jnp.int32),
                              cache, md)
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=5e-3, atol=5e-3)


def test_mllama_e2e_and_text_only(pair):
    """Full engine path: processor cross_states extras → admission
    upload → cross attention each step; plus a text-only request on the
    same engine (cross layers must no-op)."""
    import torch
    _, _, tmodel, (px, aids, amask) = pair
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=32, max_seq_len=64,
              max_num_tokens=128,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=512))
    prompt = [2, 5, 250, 7, 9, 11]
    out = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": px[0].numpy(),
                              "aspect_ratio_ids": aids[0].numpy(),
                              "aspect_ratio_mask": amask[0].numpy()}},
        SamplingParams(max_tokens=5, top_k=1, end_id=-1))
    got = out.outputs[0].token_ids
    # HF greedy reference: full re-forward each step with an all-ones
    # cross mask sized to the current length
    cur = list(prompt)
    ref_ids = []
    with torch.no_grad():
        for _ in range(5):
            cam = torch.ones(1, len(cur), 1, 2, dtype=torch.long)
            lg = tmodel(input_ids=torch.tensor([cur]), pixel_values=px,
                        aspect_ratio_ids=aids, aspect_ratio_mask=amask,
                        cross_attention_mask=cam).logits[0, -1]
            nxt = int(torch.argmax(lg))
            ref_ids.append(nxt)
            cur.append(nxt)
    assert got == ref_ids

    # text-only on the same engine: cross layers skip; matches the
    # HF text model without images
    tprompt = [3, 7, 12, 19]
    out2 = llm.generate(tprompt, SamplingParams(max_tokens=4, top_k=1,
                                                end_id=-1))
    cur = list(tprompt)
    ref2 = []
    with torch.no_grad():
        for _ in range(4):
            lg = tmodel(input_ids=torch.tensor([cur])).logits[0, -1]
            nxt = int(torch.argmax(lg))
            ref2.append(nxt)
            cur.append(nxt)
    llm.shutdown()
    assert out2.outputs[0].token_ids == ref2
