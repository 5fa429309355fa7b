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


def test_mxfp4_roundtrip_and_lut():
    """MXFP4 dequant (quantization/mxfp4.py): exact e2m1 LUT decode +
    encoder/decoder roundtrip within half-ULP of the e2m1 grid."""
    import numpy as np
    from tensorrt_llm_tpu.quantization.mxfp4 import (dequant_mxfp4,
                                                     quantize_mxfp4)
    # hand-built block: codes 0..15 at scale 2^1
    lo = np.arange(16, dtype=np.uint8) & 0xF
    hi = (np.arange(16, dtype=np.uint8)[::-1]) & 0xF
    blocks = (lo | (hi << 4)).reshape(1, 16)
    scales = np.array([128], np.uint8)           # 2^(128-127) = 2
    out = dequant_mxfp4(blocks, scales)
    lut = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])
    lut = np.concatenate([lut, -lut])
    assert out.shape == (32,)
    np.testing.assert_allclose(out[0::2], lut[lo] * 2)
    np.testing.assert_allclose(out[1::2], lut[hi] * 2)
    # roundtrip: random weights survive encode->decode within the grid
    r = np.random.default_rng(0)
    w = r.standard_normal((8, 64)).astype(np.float32) * 0.1
    b, s = quantize_mxfp4(w)
    wq = dequant_mxfp4(b, s).reshape(8, 64)
    # e2m1 relative step is <= 25%; block scale adds at most 2x headroom
    assert np.abs(wq - w).max() <= 0.25 * np.abs(w).max() + 1e-6


def test_mxfp4_checkpoint_ingestion():
    """A synthesized MXFP4 GPT-OSS checkpoint (blocks+scales expert
    tensors, bf16 elsewhere) loads through the normal path and matches
    the bf16-expert model's logits closely."""
    import numpy as np
    import torch
    import jax, jax.numpy as jnp
    from transformers import GptOssForCausalLM
    from tensorrt_llm_tpu.quantization.mxfp4 import quantize_mxfp4
    import __graft_entry__ as ge

    # MXFP4 blocks need both matmul dims % 32 == 0
    torch.manual_seed(0)
    cfg = tiny_gpt_oss_cfg(hidden_size=64, intermediate_size=64)
    tmodel = GptOssForCausalLM(cfg).eval()
    model = get_model_class("gpt_oss")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    ref_params = model.load_hf_state_dict(sd)

    sdq = dict(sd)
    L = model.num_layers
    for i in range(L):
        e = f"model.layers.{i}.mlp.experts."
        for nm in ("gate_up_proj", "down_proj"):
            w = sdq.pop(e + nm)                  # [E, in, out]
            w_oi = np.transpose(w, (0, 2, 1))    # blocks layout [E,out,in]
            blocks, scales = quantize_mxfp4(np.ascontiguousarray(w_oi))
            sdq[e + nm + "_blocks"] = blocks
            sdq[e + nm + "_scales"] = scales
    params = model.load_hf_state_dict(sdq)

    T = 8
    tokens = jnp.asarray(np.arange(T) % 100, jnp.int32)
    md = ge._example_metadata(T, max_seqs=1, pages_per_seq=8)
    ref_logits, _ = model.forward(ref_params, tokens,
                                  model.make_kv_pages(16, 16), md)
    q_logits, _ = model.forward(params, tokens,
                                model.make_kv_pages(16, 16), md)
    ref = np.asarray(ref_logits)
    got = np.asarray(q_logits)
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.98, cos
