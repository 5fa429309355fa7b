"""Multi-adapter LoRA serving: adapter math vs weight-folded baseline,
per-request adapter isolation."""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.lora.lora_manager import (LoraAdapter,
                                                LoraLayerWeights,
                                                LoraRequest)


def make_adapter(task_id, cfg, rank=4, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    H = cfg.hidden_size
    nq = cfg.num_attention_heads * (H // cfg.num_attention_heads)
    weights = {"q": {}}
    for layer in range(cfg.num_hidden_layers):
        a = rng.normal(size=(H, rank)).astype(np.float32) * 0.3
        b = rng.normal(size=(rank, nq)).astype(np.float32) * 0.3
        weights["q"][layer] = LoraLayerWeights(a=a, b=b, scale=scale)
    return LoraAdapter(task_id, rank, weights)


@pytest.fixture(scope="module")
def lora_llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256, enable_lora=True,
              lora_config={"max_lora_rank": 8, "max_loras": 4},
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    yield llm, tmodel, cfg
    llm.shutdown()


def fold_and_run(tmodel, cfg, adapter, prompt, n):
    """HF greedy with the adapter folded into q_proj weights."""
    import copy
    import torch
    m = copy.deepcopy(tmodel)
    with torch.no_grad():
        for layer, w in adapter.weights["q"].items():
            delta = (w.a @ w.b).T * w.scale   # torch layout [out, in]
            m.model.layers[layer].self_attn.q_proj.weight += \
                torch.tensor(delta)
        ids = list(prompt)
        for _ in range(n):
            logits = m(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_lora_matches_folded_weights(lora_llm):
    llm, tmodel, cfg = lora_llm
    adapter = make_adapter(7, cfg, scale=1.0, seed=1)
    llm.lora_manager.add_adapter(adapter)
    llm.lora_manager.activate(7)
    llm.engine.refresh_lora()
    prompt = [5, 9, 23, 44]
    out = llm.generate_async(
        prompt, SamplingParams(max_tokens=6, top_k=1),
        lora_request=LoraRequest("a", 7, "")).result(60)
    expect = fold_and_run(tmodel, cfg, adapter, prompt, 6)
    assert out.outputs[0].token_ids == expect


def test_lora_isolation(lora_llm):
    """Base requests are unaffected by active adapters; two adapters give
    different outputs."""
    llm, tmodel, cfg = lora_llm
    prompt = [3, 7, 11, 13]
    base = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1))

    a1 = make_adapter(21, cfg, scale=2.0, seed=2)
    a2 = make_adapter(22, cfg, scale=2.0, seed=3)
    for a in (a1, a2):
        llm.lora_manager.add_adapter(a)
        llm.lora_manager.activate(a.task_id)
    llm.engine.refresh_lora()

    out1 = llm.generate_async(prompt, SamplingParams(max_tokens=6, top_k=1),
                              lora_request=LoraRequest("x", 21, "")).result(60)
    out2 = llm.generate_async(prompt, SamplingParams(max_tokens=6, top_k=1),
                              lora_request=LoraRequest("y", 22, "")).result(60)
    base2 = llm.generate(prompt, SamplingParams(max_tokens=6, top_k=1))
    assert base2.outputs[0].token_ids == base.outputs[0].token_ids
    assert out1.outputs[0].token_ids != out2.outputs[0].token_ids
