"""GraniteMoeHybrid (Granite 4.0) and FalconMamba parity vs HF + e2e
(reference: granite/falcon rows of the model support matrix; SSD-hybrid
structure per modeling_nemotron_h.py)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.models import ModelConfig, get_model_class
from tests.test_models import make_prefill_metadata


def _md(model, Tq, start=0, slot=0):
    md = make_prefill_metadata(model, Tq, start_pos=start)
    S = md.kv_lens.shape[0]
    return dataclasses.replace(
        md, seq_slots=jnp.asarray([slot] + [-1] * (S - 1), jnp.int32))


def granite_hybrid_cfg():
    from transformers import GraniteMoeHybridConfig
    return GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=64, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        layer_types=["mamba", "attention", "mamba", "attention"],
        mamba_n_heads=4, mamba_d_state=16, mamba_n_groups=2,
        mamba_expand=2, mamba_d_conv=4, shared_intermediate_size=64,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.2, logits_scaling=3.0,
        max_position_embeddings=256)


@pytest.fixture(scope="module")
def granite_pair():
    import torch
    from transformers import GraniteMoeHybridForCausalLM
    torch.manual_seed(0)
    cfg = granite_hybrid_cfg()
    tmodel = GraniteMoeHybridForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("granitemoehybrid")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    model._num_slots = 4
    return model, model.load_hf_state_dict(sd), tmodel


def test_granite_hybrid_prefill_and_decode(granite_pair):
    import torch
    model, params, tmodel = granite_pair
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


def test_granite_hybrid_e2e_greedy(granite_pair):
    import torch
    _, _, tmodel = granite_pair
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


def test_falcon_mamba_prefill_matches_hf():
    import torch
    from transformers import FalconMambaConfig, FalconMambaForCausalLM
    torch.manual_seed(0)
    cfg = FalconMambaConfig(vocab_size=96, hidden_size=64, state_size=8,
                            num_hidden_layers=2, conv_kernel=4, expand=2,
                            time_step_rank=4, use_cache=True)
    tmodel = FalconMambaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("falcon_mamba")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    model._num_slots = 4
    params = model.load_hf_state_dict(sd)
    tokens = list(range(2, 14))
    cache = model.make_kv_pages(0, 0)
    logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32),
                              cache, _md(model, len(tokens)))
    with torch.no_grad():
        ref = tmodel(torch.tensor([tokens])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits)[0], ref,
                               rtol=3e-3, atol=3e-3)


def zamba2_cfg():
    from transformers import Zamba2Config
    return Zamba2Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=4,
        mamba_d_state=16, mamba_ngroups=1, mamba_expand=2, mamba_d_conv=4,
        n_mamba_heads=4,
        layers_block_type=["mamba", "hybrid", "mamba", "mamba", "hybrid",
                           "mamba"],
        num_mem_blocks=2, use_mem_rope=True,
        use_shared_attention_adapter=True, adapter_rank=8,
        max_position_embeddings=256)


@pytest.fixture(scope="module")
def zamba2_pair():
    import torch
    from transformers import Zamba2ForCausalLM
    torch.manual_seed(0)
    cfg = zamba2_cfg()
    tmodel = Zamba2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("zamba2")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    model._num_slots = 4
    return model, model.load_hf_state_dict(sd), tmodel


def test_zamba2_prefill_and_decode(zamba2_pair):
    """Shared memory blocks + per-use LoRA adapters + concat([h, embeds])
    input; exact HF parity across prefill and stateful decode."""
    import torch
    model, params, tmodel = zamba2_pair
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


def test_zamba2_e2e_greedy(zamba2_pair):
    import torch
    _, _, tmodel = zamba2_pair
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


def test_lfm2_short_conv_hybrid():
    """LFM2: gated short-conv layers (slot-cached causal conv) +
    qk-layernormed attention; prefill + stateful decode parity."""
    import torch
    from transformers import Lfm2Config, Lfm2ForCausalLM
    torch.manual_seed(0)
    cfg = Lfm2Config(vocab_size=96, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=4, num_attention_heads=4,
                     num_key_value_heads=2,
                     layer_types=["conv", "full_attention", "conv",
                                  "full_attention"],
                     conv_L_cache=3, max_position_embeddings=16384,
                     block_ff_dim=256)
    tmodel = Lfm2ForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = get_model_class("lfm2")(
        ModelConfig(hf_config=cfg, dtype=jnp.float32))
    model._num_slots = 4
    params = model.load_hf_state_dict(sd)
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
