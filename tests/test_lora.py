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


def make_dora_adapter(task_id, cfg, base_sd, rank=4, scale=1.0, seed=5):
    """DoRA adapter: raw magnitudes near the base column norms, then
    normalized against the base weights (the runtime applies the
    pre-normalized column scale, reference: dora.py converter)."""
    from tensorrt_llm_tpu.lora.lora_manager import (LoraAdapter,
                                                    LoraLayerWeights)
    rng = np.random.default_rng(seed)
    H = cfg.hidden_size
    weights = {"q": {}}
    for layer in range(cfg.num_hidden_layers):
        a = rng.normal(size=(H, rank)).astype(np.float32) * 0.3
        b = rng.normal(size=(rank, H)).astype(np.float32) * 0.3
        mag = rng.uniform(0.5, 1.5, size=H).astype(np.float32)
        weights["q"][layer] = LoraLayerWeights(a=a, b=b, scale=scale,
                                               mag=mag, mag_is_raw=True)
    ad = LoraAdapter(task_id, rank, weights)
    ad.normalize_dora(base_sd)
    return ad


def dora_fold_and_run(tmodel, cfg, adapter, raw_mags, prompt, n):
    """HF greedy with the DoRA-merged weight:
    W' = (m / ||W + dW||_row) * (W + dW)."""
    import copy
    import torch
    m = copy.deepcopy(tmodel)
    with torch.no_grad():
        for layer, w in adapter.weights["q"].items():
            q = m.model.layers[layer].self_attn.q_proj.weight
            delta = torch.tensor((w.a @ w.b).T * w.scale)
            merged = q + delta
            norm = torch.linalg.norm(merged, dim=1)
            q.copy_(torch.tensor(raw_mags[layer])[:, None]
                    / norm[:, None] * merged)
        ids = list(prompt)
        for _ in range(n):
            logits = m(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_dora_matches_merged_weights(lora_llm):
    llm, tmodel, cfg = lora_llm
    base_sd = {k: v.detach().float().numpy()
               for k, v in tmodel.state_dict().items()}
    adapter = make_dora_adapter(31, cfg, base_sd, seed=6)
    raw = np.random.default_rng(6)
    # regenerate the same raw magnitudes the adapter was built from
    raw_mags = {}
    H = cfg.hidden_size
    for layer in range(cfg.num_hidden_layers):
        raw.normal(size=(H, 4)); raw.normal(size=(4, H))
        raw_mags[layer] = raw.uniform(0.5, 1.5, size=H).astype(np.float32)
    llm.lora_manager.add_adapter(adapter)
    llm.lora_manager.activate(31)
    llm.engine.refresh_lora()
    prompt = [5, 9, 23, 44]
    out = llm.generate_async(
        prompt, SamplingParams(max_tokens=6, top_k=1),
        lora_request=LoraRequest("d", 31, "")).result(60)
    expect = dora_fold_and_run(tmodel, cfg, adapter, raw_mags, prompt, 6)
    assert out.outputs[0].token_ids == expect


def test_dora_raw_magnitude_rejected(lora_llm):
    from tensorrt_llm_tpu.lora.lora_manager import (LoraAdapter,
                                                    LoraLayerWeights)
    llm, tmodel, cfg = lora_llm
    w = {"q": {0: LoraLayerWeights(
        a=np.zeros((cfg.hidden_size, 2), np.float32),
        b=np.zeros((2, cfg.hidden_size), np.float32), scale=1.0,
        mag=np.ones(cfg.hidden_size, np.float32), mag_is_raw=True)}}
    llm.lora_manager.add_adapter(LoraAdapter(41, 2, w))
    with pytest.raises(ValueError, match="unnormalized"):
        llm.lora_manager.activate(41)


def test_prompt_tuning_table(lora_llm):
    """Virtual token ids >= vocab resolve to prompt-table rows via the
    prompt-embeds path (reference: executor PromptTuningConfig)."""
    import torch
    llm, tmodel, cfg = lora_llm
    rng = np.random.default_rng(11)
    table = rng.normal(size=(4, cfg.hidden_size)).astype(np.float32) * 0.5
    vocab = cfg.vocab_size
    ids = [vocab + 0, vocab + 1, 5, 9, vocab + 3, 23]
    out = llm.generate(
        {"prompt_token_ids": list(ids),
         "prompt_tuning_config": {"embedding_table": table}},
        SamplingParams(max_tokens=5, top_k=1, end_id=-1))
    # HF ground truth through inputs_embeds
    with torch.no_grad():
        emb = tmodel.model.embed_tokens
        rows = [torch.tensor(table[t - vocab]) if t >= vocab
                else emb(torch.tensor(t)) for t in ids]
        cur = torch.stack(rows)[None]
        ref = []
        for _ in range(5):
            logits = tmodel(inputs_embeds=cur).logits[0, -1]
            nxt = int(torch.argmax(logits))
            ref.append(nxt)
            cur = torch.cat([cur, emb(torch.tensor([[nxt]]))], dim=1)
    assert out.outputs[0].token_ids == ref


def test_prompt_tuning_out_of_range(lora_llm):
    llm, _, cfg = lora_llm
    table = np.zeros((2, cfg.hidden_size), np.float32)
    with pytest.raises(ValueError, match="outside the prompt table"):
        llm.generate({"prompt_token_ids": [cfg.vocab_size + 3],
                      "prompt_tuning_config": {"embedding_table": table}},
                     SamplingParams(max_tokens=2, top_k=1, end_id=-1))
