"""Evaluate harness: teacher-forced logprobs must match HF loss."""
import math

import jax.numpy as jnp
import numpy as np


def test_perplexity_matches_hf():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu.evaluate.perplexity import (perplexity,
                                                      score_token_logprobs)
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256)
    tmodel = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    mc = ModelConfig(hf_config=cfg, dtype=jnp.float32)
    model = get_model_class("llama")(mc)
    params = model.load_hf_state_dict(sd)

    tokens = list(range(2, 34))
    lp = score_token_logprobs(model, params, tokens, page_size=16)
    with torch.no_grad():
        ids = torch.tensor([tokens])
        out = tmodel(ids, labels=ids)
    hf_nll = float(out.loss)  # mean over T-1 shifted positions
    np.testing.assert_allclose(-lp.mean(), hf_nll, rtol=1e-3, atol=1e-3)
    ppl = perplexity(model, params, tokens, page_size=16)
    assert abs(ppl - math.exp(hf_nll)) / math.exp(hf_nll) < 2e-3


def test_quant_delta_ppl_small():
    """Int8 weight-only must barely move perplexity (the Δppl gate's
    mechanism; BASELINE.md ≤0.1 Δppl target applies to real checkpoints)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu.evaluate.perplexity import perplexity
    from tensorrt_llm_tpu.llmapi.llm_args import QuantConfig
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.quantization.mode import QuantAlgo
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256)
    tmodel = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    tokens = list(range(2, 34))
    ppls = {}
    for name, qc in (("bf16", QuantConfig()),
                     ("int8", QuantConfig(quant_algo=QuantAlgo.W8A16))):
        mc = ModelConfig(hf_config=cfg, dtype=jnp.float32, quant_config=qc)
        model = get_model_class("llama")(mc)
        params = model.load_hf_state_dict(sd)
        ppls[name] = perplexity(model, params, tokens, page_size=16)
    delta = abs(ppls["int8"] - ppls["bf16"]) / ppls["bf16"]
    assert delta < 0.05, ppls
