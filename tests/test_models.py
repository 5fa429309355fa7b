"""Model numerics vs HF transformers (torch CPU) with shared random
weights — the reference's modeling unit-test strategy
(tests/unittest/_torch/modeling) without needing checkpoint downloads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi.llm_args import QuantConfig
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tensorrt_llm_tpu.ops.attention import AttentionMetadata
from tensorrt_llm_tpu.quantization.mode import QuantAlgo


def tiny_llama_config():
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False)


def tiny_gpt2_config():
    from transformers import GPT2Config
    return GPT2Config(vocab_size=96, n_positions=128, n_embd=32, n_layer=2,
                      n_head=2)


def build_pair(hf_config, torch_cls, quant_algo=QuantAlgo.NO_QUANT):
    """Returns (our_model, our_params, torch_model)."""
    import torch
    torch.manual_seed(0)
    tmodel = torch_cls(hf_config).eval()
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in tmodel.state_dict().items()}
    mc = ModelConfig(hf_config=hf_config, dtype=jnp.float32,
                     quant_config=QuantConfig(quant_algo=quant_algo,
                                              group_size=32))
    model = get_model_class(hf_config.model_type)(mc)
    params = model.load_hf_state_dict(sd)
    return model, params, tmodel


def make_prefill_metadata(model, T, page_size=16, num_pages=16,
                          max_seqs=2, pages_per_seq=8, start_pos=0):
    slots = [(t // page_size) * page_size + t % page_size
             for t in range(start_pos, start_pos + T)]
    page_indices = np.zeros((max_seqs, pages_per_seq), np.int32)
    page_indices[0, :pages_per_seq] = np.arange(pages_per_seq)
    cu = np.zeros(max_seqs + 1, np.int32)
    cu[1:] = T
    logits_idx = np.zeros(max_seqs, np.int32)
    logits_idx[0] = T - 1
    return AttentionMetadata(
        kv_lens=jnp.asarray([start_pos + T] + [0] * (max_seqs - 1), jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([1], jnp.int32),
        slot_mapping=jnp.asarray(slots, jnp.int32),
        positions=jnp.arange(start_pos, start_pos + T, dtype=jnp.int32),
        logits_indices=jnp.asarray(logits_idx))


def hf_logits(tmodel, tokens):
    import torch
    with torch.no_grad():
        out = tmodel(torch.tensor([tokens]))
    return out.logits[0].numpy()


@pytest.mark.parametrize("which", ["gpt2", "llama"])
def test_prefill_logits_match_hf(which):
    if which == "gpt2":
        from transformers import GPT2LMHeadModel
        cfg, cls = tiny_gpt2_config(), GPT2LMHeadModel
    else:
        from transformers import LlamaForCausalLM
        cfg, cls = tiny_llama_config(), LlamaForCausalLM
    model, params, tmodel = build_pair(cfg, cls)
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32), kv, md)
    ours = np.asarray(logits)[0]
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("which", ["gpt2", "llama"])
def test_decode_matches_prefill(which):
    """KV-cache correctness: prefill T then decode k one-by-one must equal
    a single prefill of T+k."""
    if which == "gpt2":
        from transformers import GPT2LMHeadModel
        cfg, cls = tiny_gpt2_config(), GPT2LMHeadModel
    else:
        from transformers import LlamaForCausalLM
        cfg, cls = tiny_llama_config(), LlamaForCausalLM
    model, params, tmodel = build_pair(cfg, cls)
    tokens = list(range(2, 11))
    T0 = 5
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, T0)
    _, kv = model.forward(params, jnp.asarray(tokens[:T0], jnp.int32), kv, md)
    logits = None
    for t in range(T0, len(tokens)):
        md = make_prefill_metadata(model, 1, start_pos=t)
        logits, kv = model.forward(params,
                                   jnp.asarray([tokens[t]], jnp.int32), kv, md)
    ours = np.asarray(logits)[0]
    ref = hf_logits(tmodel, tokens)[-1]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_llama_int8_quant_close():
    from transformers import LlamaForCausalLM
    cfg = tiny_llama_config()
    model, params, tmodel = build_pair(cfg, LlamaForCausalLM,
                                       quant_algo=QuantAlgo.W8A16)
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32), kv, md)
    ref = hf_logits(tmodel, tokens)[-1]
    ours = np.asarray(logits)[0]
    # int8 weight-only: small perturbation; top-1 must agree
    assert np.argmax(ours) == np.argmax(ref)
    cos = np.dot(ours, ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
    assert cos > 0.999


def test_llama_int4_awq_top1():
    from transformers import LlamaForCausalLM
    cfg = tiny_llama_config()
    model, params, tmodel = build_pair(cfg, LlamaForCausalLM,
                                       quant_algo=QuantAlgo.W4A16_AWQ)
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32), kv, md)
    ref = hf_logits(tmodel, tokens)[-1]
    ours = np.asarray(logits)[0]
    cos = np.dot(ours, ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
    assert cos > 0.98
