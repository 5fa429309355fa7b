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


class _WordTok:
    """Minimal whitespace tokenizer for harness tests."""
    def __init__(self):
        self.vocab = {}

    def encode(self, text, add_special_tokens=True):
        out = []
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = 2 + (len(self.vocab) % 90)
            out.append(self.vocab[w])
        return out

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids)

    def convert_ids_to_tokens(self, ids):
        return [f"t{i}" for i in ids]


def _tiny_llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    return LLM(model=tmodel, tokenizer=_WordTok(), dtype="float32",
               max_batch_size=4, max_input_len=128, max_seq_len=256,
               max_num_tokens=256,
               kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                             max_tokens=4096))


def test_gsm8k_task_runs_and_scores():
    from tensorrt_llm_tpu.evaluate.tasks import GSM8K
    llm = _tiny_llm()
    try:
        res = GSM8K(max_tokens=8, num_shots=1).evaluate(llm)
    finally:
        llm.shutdown()
    assert res["task"] == "gsm8k"
    assert res["num_samples"] == 2
    assert 0.0 <= res["accuracy"] <= 100.0


def test_gsm8k_extraction():
    from tensorrt_llm_tpu.evaluate.tasks import GSM8K
    assert GSM8K.extract_number("so the answer is 42.") == "42"
    assert GSM8K.extract_number("1,234 apples") == "1234"
    assert GSM8K.extract_number("#### 6") == "6"
    assert GSM8K.extract_number("no numbers") is None


def test_mmlu_task_loglikelihood_protocol():
    from tensorrt_llm_tpu.evaluate.tasks import MMLU
    llm = _tiny_llm()
    try:
        res = MMLU().evaluate(llm)
    finally:
        llm.shutdown()
    assert res["task"] == "mmlu"
    assert res["num_samples"] == 2
    assert 0.0 <= res["accuracy"] <= 100.0


def test_cnn_dailymail_rouge():
    from tensorrt_llm_tpu.evaluate.tasks import CnnDailymail
    f1 = CnnDailymail.rouge_l_f1("the cat sat on the mat",
                                 "the cat sat on the mat")
    assert abs(f1 - 1.0) < 1e-9
    assert CnnDailymail.rouge_l_f1("completely different words here",
                                   "the cat sat") == 0.0
    mid = CnnDailymail.rouge_l_f1("the cat sat", "the cat sat on the mat")
    assert 0.0 < mid < 1.0


def test_task_gate_uses_reference_table():
    from tensorrt_llm_tpu.evaluate.tasks import GSM8K
    t = GSM8K()
    # within noise of the reference: pass
    assert t.gate(73.0, 1319, "meta-llama/Llama-3.1-8B-Instruct") is True
    # catastrophically below: fail
    assert t.gate(20.0, 1319, "meta-llama/Llama-3.1-8B-Instruct") is False
    # unknown model: no gate
    assert t.gate(50.0, 100, "nonexistent/model") is None
